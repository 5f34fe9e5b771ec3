"""Pippenger multi-scalar multiplication on device (JAX).

The north-star kernel (SURVEY.md §7.1 item 4). TPU-native formulation —
no data-dependent control flow, everything static-shaped and vectorized:

1. scalars are sliced host-side into c-bit window digits;
2. per window, points are sorted by digit (XLA sort), bucket sums are
   produced with a **segmented inclusive scan** (head-flag operator over a
   Jacobian-point pytree via ``lax.associative_scan`` — log-depth, ~2N point
   adds of work, all lane-parallel);
3. bucket-weighted aggregation uses the classic suffix-sum identity
   sum_b b*S_b = sum_j (sum_{b>=j} S_b), two more scans;
4. windows combine with c doublings per step (Horner).

The multi-chip variant (points partitioned per chip, bucket sums psum-
reduced over the mesh) lives in parallel/msm.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..curves.host import Curve
from ..curves.limb import (
    JacobianPoint,
    affine_to_jacobian_host,
    infinity,
    jacobian_to_affine_host,
    point_add,
    point_add_mixed,
    point_add_mixed_incomplete,
    point_double,
    select_point,
)
from ..fields import limb as L
from ..fields.limb import FieldSpec, int_to_limbs

WINDOW_BITS = 8
SCALAR_BITS = 256


def scalars_to_digits(scalars, c: int = WINDOW_BITS) -> np.ndarray:
    """(num_windows, N) int32 little-endian c-bit digits."""
    n_windows = (SCALAR_BITS + c - 1) // c
    if c == 8:
        # fast path: 8-bit windows ARE the little-endian bytes
        buf = b"".join(int(s).to_bytes(32, "little") for s in scalars)
        return np.frombuffer(buf, dtype=np.uint8).reshape(len(scalars), 32).T.astype(np.int32)
    out = np.zeros((n_windows, len(scalars)), dtype=np.int32)
    for i, s in enumerate(scalars):
        s = int(s)
        for w in range(n_windows):
            out[w, i] = (s >> (c * w)) & ((1 << c) - 1)
    return out


def signed_window_count(c: int, scalar_bits: int = 255) -> int:
    """Static window count for signed c-bit digits of scalars < 2^scalar_bits
    (Pasta moduli < 2^255): one extra window iff the top window's maximum
    value plus a carry can reach 2^(c-1)."""
    w = (scalar_bits + c - 1) // c
    max_top = 1 << (scalar_bits - c * (w - 1))  # top window max + carry
    if max_top >= (1 << (c - 1)):
        w += 1
    return w


def scalars_to_signed_digits(scalars, c: int) -> np.ndarray:
    """(W, N) int32 signed digits in [-2^(c-1), 2^(c-1)]: value = Σ d_w 2^(cw).

    Signed digits halve the bucket count per window (bucket id = |d|, the
    sign selects P vs -P), which makes larger windows affordable — the
    Pippenger row count W·N drops accordingly. Vectorized bit-slicing, no
    per-scalar Python loop."""
    n = len(scalars)
    w_count = signed_window_count(c)
    if n == 0:
        return np.zeros((w_count, 0), dtype=np.int32)
    buf = b"".join(int(s).to_bytes(32, "little") for s in scalars)
    bits = np.unpackbits(
        np.frombuffer(buf, dtype=np.uint8).reshape(n, 32), axis=1, bitorder="little"
    )  # (N, 256)
    pad = w_count * c - 256
    if pad > 0:
        bits = np.concatenate([bits, np.zeros((n, pad), np.uint8)], axis=1)
    weights = (1 << np.arange(c, dtype=np.int64)).astype(np.int64)
    vals = bits[:, : w_count * c].reshape(n, w_count, c).astype(np.int64) @ weights  # (N, W)
    half = 1 << (c - 1)
    digits = np.zeros((w_count, n), dtype=np.int32)
    carry = np.zeros(n, dtype=np.int64)
    for w in range(w_count):
        t = vals[:, w] + carry
        hi = t >= half
        digits[w] = np.where(hi, t - (1 << c), t).astype(np.int32)
        carry = hi.astype(np.int64)
    assert not carry.any(), "scalar overflow: signed_window_count too small"
    return digits


import os

from ..config import config
from .dispatch import device_call


def _use_fused_T() -> bool:
    # fused transposed-layout scan step (pallas_kernels.msm_step_T): DEFAULT
    # ON for the TPU backend. Honest bench (fresh digit values, 4 MSMs
    # chained per dispatch, BENCH_NOTES.md): 2^18 = 310.8K pts/s fused vs
    # 187.3K jnp — 1.66x. BZ_NO_PALLAS_MSM_T=1 opts out.
    if not config().pallas_msm_t:
        return False
    from .pallas_kernels import use_pallas

    return use_pallas()


# ---------------------------------------------------------------------------
# Counting partition — the sort killer.
#
# Pippenger's bucket accumulation only needs rows GROUPED by (window, bucket);
# order inside a group is irrelevant (point addition commutes). A comparison
# sort (jax.lax.sort) was the dominant MSM phase on TPU (~70 ms of a 94 ms
# 2^14 MSM; ~165 ns/element — bitonic depth log^2 n). A counting partition is
# O(n) with fully vectorizable phases:
#
#   1. block histograms  h[blk, d] = #rows in block with bucket d
#   2. bucket bases      base[d]   = exclusive-cumsum_d of per-window totals
#      block offsets     offs[blk, d] = exclusive-cumsum_blk(h)
#   3. in-block ranks    rank[i]   = #{j < i in block : d_j == d_i}
#      (equality matrix & strict lower-triangle, summed — no bucket axis)
#   4. pos[i] = base[d_i] + offs[blk_i, d_i] + rank[i]   (gathers)
#   5. key_s = scatter(key[i] -> pos[i])                 (unique-index)
#
# OPT-IN via BZ_MSM_PARTITION=1: measured on the TPU (2^18, c=13) the
# partition runs ~260 ms vs ~15 ms for the packed single-u32 lax.sort —
# the sort was only ever a bottleneck under a degraded relay (r2 readings).
# Kept as the validated fallback for shapes/backends where a comparison
# sort misbehaves; BZ_MSM_HIST picks the histogram flavor ("scatter" /
# "onehot").


def _partition_block(n: int) -> int:
    """In-block rank tile size: power of two dividing n (n is a power of
    two >= 64 on every device path). 512 keeps the (BLOCK, BLOCK) equality
    tile VMEM-resident while amortizing the per-block offset machinery."""
    return min(512, n)


def _counting_partition(key: list, mag, nbuck: int) -> list:
    """key: list of (W, N) arrays to permute; mag: (W, N) int32 bucket ids in
    [0, nbuck). Returns each array's rows grouped by ascending bucket id —
    the drop-in replacement for ``jax.lax.sort`` given downstream only
    consumes the grouping (segment heads/tails), not intra-group order."""
    w, n = mag.shape
    block = _partition_block(n)
    nblk = n // block
    d_blk = mag.reshape(w, nblk, block)
    flat_idx = (jnp.arange(nblk, dtype=jnp.int32)[None, :, None] * nbuck + d_blk).reshape(w, n)
    if config().msm_hist == "onehot":
        onehot = (d_blk[..., None] == jnp.arange(nbuck, dtype=jnp.int32)).astype(jnp.int32)
        h = onehot.sum(axis=2)  # (W, nblk, nbuck); compare fuses into reduce
    else:
        h0 = jnp.zeros((w, nblk * nbuck), jnp.int32)
        h = jax.vmap(lambda hw, ix: hw.at[ix].add(1))(h0, flat_idx).reshape(w, nblk, nbuck)
    total = h.sum(axis=1)  # (W, nbuck)
    base = jnp.cumsum(total, axis=1) - total  # exclusive over buckets
    offs = jnp.cumsum(h, axis=1) - h  # exclusive over blocks
    # in-block ranks: strict-tril equality row sums (tile-local, fuses)
    eq = d_blk[..., :, None] == d_blk[..., None, :]  # (W, nblk, B, B)
    tril = jnp.tril(jnp.ones((block, block), jnp.bool_), k=-1)
    rank = (eq & tril).sum(axis=-1, dtype=jnp.int32).reshape(w, n)
    pos = (
        jnp.take_along_axis(base, mag, axis=1)
        + jnp.take_along_axis(offs.reshape(w, nblk * nbuck), flat_idx, axis=1)
        + rank
    )
    scat = jax.vmap(lambda o, p, k: o.at[p].set(k, unique_indices=True, mode="drop"))
    return [scat(jnp.zeros_like(k), pos, k) for k in key]


def _group_rows(arrs: list, mag, nbuck: int) -> list:
    """Group each (W, N) array in ``arrs`` by the bucket ids in ``mag``:
    counting partition when enabled, else lax.sort keyed on arrs[0] (whose
    high bits must then contain the bucket id, as the packed keys do)."""
    n = mag.shape[1]
    if config().msm_partition and n % _partition_block(n) == 0:
        return _counting_partition(arrs, mag, nbuck)
    if len(arrs) == 1:
        return [jax.lax.sort(arrs[0], dimension=1)]
    return list(jax.lax.sort(arrs, dimension=1, num_keys=1))


def _combine_points(spec: FieldSpec, a: JacobianPoint, b: JacobianPoint) -> JacobianPoint:
    """The scan combine: one full Jacobian addition.

    On the TPU backend this routes through the fused transposed Pallas
    kernel (point_add_T: i32 schoolbook muls, VMEM-resident temps) — the
    row-layout operands are transposed around the call, which costs ~1% of
    the fused win. BZ_PALLAS_MSM=1 selects the legacy row-layout kernel;
    BZ_NO_PALLAS_MSM_T=1 falls back to the plain jnp formulation."""
    if config().pallas_msm and a.x.ndim == 2:
        from .pallas_kernels import use_pallas

        if use_pallas():
            from .pallas_kernels import point_add_rows

            return point_add_rows(spec, a, b)
    if a.x.ndim == 2 and a.x.shape[0] % 128 == 0 and _use_fused_T():
        from .pallas_kernels import point_add_T
        from ..curves.limb_t import JacobianPointT

        r = point_add_T(
            spec,
            JacobianPointT(a.x.T, a.y.T, a.z.T),
            JacobianPointT(b.x.T, b.y.T, b.z.T),
        )
        return JacobianPoint(r.x.T, r.y.T, r.z.T)
    return point_add(spec, a, b)


def _shift_points(pts: JacobianPoint, flags, d, fill_flag):
    """Lane j <- lane j-d; out-of-range lanes become (identity, fill_flag).
    d may be a traced value (gather with computed indices)."""
    n = flags.shape[0]
    idx = jnp.arange(n) - d
    oob = idx < 0
    safe = jnp.clip(idx, 0, n - 1)
    x = jnp.where(oob[:, None], 0, pts.x[safe])
    y = jnp.where(oob[:, None], 0, pts.y[safe])
    z = jnp.where(oob[:, None], 0, pts.z[safe])  # z=0 -> identity
    f = jnp.where(oob, fill_flag, flags[safe])
    return JacobianPoint(x, y, z), f


def _hillis_steele_scan(spec: FieldSpec, pts: JacobianPoint, head, levels: int):
    """Inclusive *segmented* scan (head-flag operator) with a single
    point-add instance in the graph: fori_loop over log2(n) levels, dynamic
    shift distance."""

    def level(i, carry):
        p, f = carry
        d = jnp.left_shift(1, i)
        # fill = the segmented-monoid identity (identity point, flag False)
        sp, sf = _shift_points(p, f, d, jnp.zeros((), bool))
        merged = _combine_points(spec, sp, p)
        out = select_point(f, p, merged)
        return (out, f | sf)

    out, _ = jax.lax.fori_loop(0, levels, level, (pts, head))
    return out


def _dense_buckets(ys, fused_layout: bool, k_s, is_last, w_count: int, nbuck: int, s_steps: int, buckets0_f):
    """Extract bucket values from densely-emitted scan outputs.

    ys holds every sorted row's post-add accumulator ((S, 48, lanes) in the
    fused transposed layout, (S, lanes, 48) otherwise); the value of bucket
    (w, d) is ys at the sorted position of that bucket's LAST row. Those
    positions are found with one packed sort (is_last rows keyed by bucket
    id k_s, everything else pushed past the end) — sorts are dense bitonic
    networks and cost ~nothing next to per-row scatters — followed by a
    W·nbuck-row scatter of positions and ONE W·nbuck-row gather of values.
    Empty buckets keep the identity row from buckets0_f."""
    total_rows = k_s.shape[0]
    trash = w_count * (nbuck + 1)
    big = jnp.int32(w_count * nbuck)
    keys = jnp.where(is_last, k_s.astype(jnp.int32), big)
    pos = jnp.arange(total_rows, dtype=jnp.int32)
    sortk, sortpos = jax.lax.sort((keys, pos), num_keys=1)
    m = w_count * nbuck
    sel_k, sel_p = sortk[:m], sortpos[:m]
    valid = sel_k < big
    tgt = jnp.where(valid, (sel_k // nbuck) * (nbuck + 1) + sel_k % nbuck, trash)
    pos_arr = jnp.full((trash + 1,), total_rows, jnp.int32)
    pos_arr = pos_arr.at[tgt].set(jnp.where(valid, sel_p, total_rows))
    safe = pos_arr < total_rows
    lane_i = jnp.where(safe, pos_arr // s_steps, 0)
    s_i = jnp.where(safe, pos_arr % s_steps, 0)
    rows = ys[s_i, :, lane_i] if fused_layout else ys[s_i, lane_i, :]
    return jnp.where(safe[:, None], rows, buckets0_f[:1])


def _lane_block(n_rows: int, n_points: int) -> int:
    """Number of vector lanes for the serial bucket accumulation. Power of
    two, divides n_rows (n_points is a power of two and windows * n_points =
    n_rows, so any power of two <= n_points divides n_rows).

    Wide is better: the per-step field math is latency-bound well past 8K
    lanes (measured: a 32K-lane mixed add costs ~the same wall time as an
    8K-lane one), so lanes default high and the step count shrinks
    proportionally. The cap bounds the (lanes, 1024) bf16 mul intermediate
    (64 MB at 32K lanes) and the per-step gather size."""
    cap = config().msm_lanes
    lanes = min(cap, n_points, max(64, n_rows // 8))
    return max(1, 1 << (lanes.bit_length() - 1))


def _msm_device_wsums(
    spec: FieldSpec,
    qx,
    qy,
    qinf,
    digits,
    c: int,
    complete: bool = False,
    signed: bool = False,
    dense_batch: int = 1,
):
    """digits: (W, N) -> (wsums, collision) where wsums holds per-window
    sums S_w as a (W, 16)-leaf JacobianPoint (callers fold with
    sum_w 2^(c*w) S_w) and collision is a () bool: True iff the fast
    incomplete bucket add hit its excluded P == Q case in a live bucket
    (callers then redo with complete=True; see point_add_mixed_incomplete).

    With ``signed=True``, digits are signed c-bit windows
    (scalars_to_signed_digits) and qx/qy/qinf must carry 2N rows: the
    original points followed by their negations ([P | -P]); the bucket count
    per window drops from 2^c to 2^(c-1)+1.

    Work-efficient Pippenger bucket accumulation:

    1. per-window argsort of digits (one batched XLA sort);
    2. the sorted (window-major) row sequence is blocked so each of LANES
       vector lanes owns a CONTIGUOUS run of rows; a ``lax.scan`` over
       S = rows/LANES steps does one LANES-wide Jacobian add per step —
       ~1.0x total point-add work (vs log2(rows)x for a flat segmented
       scan) at full lane occupancy. Completed segments are scattered into
       their bucket slot inside the scan, so no rows-sized point array is
       ever materialized (points are gathered per step);
    3. segments that span a lane boundary are repaired afterwards: a
       log2(LANES)-depth head-flag scan over the per-lane tail runs yields
       each lane's carry-in, and at most ONE bucket per lane (the one closed
       before the lane's first head) needs a carry add;
    4. per-window bucket aggregation: two-level serial decomposition
       (_aggregate_windows) — ~2(sqrt buckets) point-add depth instead of
       log-depth full-width suffix scans; the Horner window fold happens on
       the host (host_window_fold).
    """
    w_count, n = digits.shape
    nbuck = ((1 << (c - 1)) + 1) if signed else (1 << c)  # bucket ids 0..nbuck-1
    total_rows = w_count * n
    one = jnp.asarray(spec.one_mont)

    idx_bits = max(1, (n - 1).bit_length())
    if signed:
        # bucket by |digit|; the sign rides in the payload and selects the
        # negated-point half of the doubled point arrays (qx/qy/qinf carry
        # 2N rows: [P | -P]) — sign handling costs zero per-row field math
        mag = jnp.abs(digits.astype(jnp.int32))
        sgn = (digits < 0).astype(jnp.int32)
        if c + 1 + idx_bits <= 32:
            # pack (mag | sign | idx) into ONE uint32 key: the sort is the
            # dominant MSM phase on TPU, and a single-array sort moves half
            # the bytes of the [key, payload] two-array form
            key = (
                (mag.astype(jnp.uint32) << (idx_bits + 1))
                | (sgn.astype(jnp.uint32) << idx_bits)
                | jnp.arange(n, dtype=jnp.uint32)
            )
            (key_s,) = _group_rows([key], mag, nbuck)
            k_sw = (key_s >> (idx_bits + 1)).astype(jnp.int32)
            order_w = (
                (key_s & ((1 << idx_bits) - 1)) + ((key_s >> idx_bits) & 1) * n
            ).astype(jnp.int32)
        else:
            payload = (sgn << idx_bits) | jnp.arange(n, dtype=jnp.int32)
            k_sw, pay_s = _group_rows([mag, payload], mag, nbuck)
            order_w = (pay_s & ((1 << idx_bits) - 1)) + (pay_s >> idx_bits) * n
    else:
        # digit and point index packed into ONE int32 key (digit in the
        # high bits) so the sort moves half the payload of a key-value sort
        assert c + idx_bits <= 31, "packed sort key needs idx bits + c <= 31"
        packed = (digits.astype(jnp.int32) << idx_bits) | jnp.arange(n, dtype=jnp.int32)
        (packed,) = _group_rows([packed], digits.astype(jnp.int32), nbuck)
        k_sw = packed >> idx_bits
        order_w = packed & ((1 << idx_bits) - 1)
    k_s = (jnp.arange(w_count, dtype=jnp.int32)[:, None] * nbuck + k_sw).reshape(total_rows)
    src = order_w.reshape(total_rows)  # point-array row per sorted row

    head = jnp.concatenate([jnp.ones(1, bool), k_s[1:] != k_s[:-1]])
    is_last = jnp.concatenate([k_s[1:] != k_s[:-1], jnp.ones(1, bool)])
    w_of = k_s // nbuck
    d_of = k_s % nbuck
    trash = w_count * (nbuck + 1)
    target = jnp.where(is_last, w_of * (nbuck + 1) + d_of, trash)

    lanes = _lane_block(total_rows, n)
    s_steps = total_rows // lanes
    # row r = lane*S + s  ->  (S, LANES) step-major layout
    to_sl = lambda a: a.reshape(lanes, s_steps).T
    src_sl = to_sl(src)
    head_sl = to_sl(head)
    target_sl = to_sl(target)
    is_last_sl = to_sl(is_last)
    live_sl = to_sl(d_of != 0)  # digit-0 rows land in discarded buckets

    buckets0 = infinity(spec, (trash + 1,))
    # fused memory layout (measured on TPU, BENCH_NOTES.md r3): gather and
    # scatter cost is ROW-COUNT-bound (~40 ns/row regardless of row width),
    # so the per-step point fetch uses ONE (rows, 32) x||y table gather
    # instead of two 16-wide gathers, and bucket writes use ONE (·, 48)
    # x|y|z scatter instead of three — halves the scan's memory phase
    # (210 -> 110 ms at 2^18). Identity rows are zeroed in the fused table:
    # (0, 0) is never a valid affine point (y^2 = x^3 + 5), so the all-zero
    # check replaces a separate 1-bool-per-row qinf gather.
    qxy = jnp.where(qinf[:, None], 0, jnp.concatenate([qx, qy], axis=1))
    buckets0_f = jnp.concatenate([buckets0.x, buckets0.y, buckets0.z], axis=1)

    use_fused = False
    if config().pallas_msm:
        from .pallas_kernels import use_pallas

        use_fused = use_pallas()
    # fused transposed step: incomplete law only (the complete redo path is
    # astronomically rare and stays on the jnp formulation)
    fused_T = (not complete) and (not use_fused) and _use_fused_T()

    # dense-emit mode (default): gather/scatter cost is per-ROW, so the
    # per-step bucket SCATTER (total_rows scatter-rows over the scan) is
    # ~1/3 of the scan's wall. Instead every step emits its acc densely as
    # a stacked scan output (vectorized stores, bandwidth-bound), and the
    # bucket values are pulled out afterwards: one extra packed sort finds
    # each bucket's last-row position, then ONE (buckets)-row gather reads
    # the values — W·nbuck ≈ rows/64 rows instead of `rows` scatter-rows.
    # ys buffer cap bounds the LIVE footprint: vmapped callers run
    # dense_batch instances concurrently, so each instance's share of the
    # 3 GiB budget shrinks accordingly (ADVICE r3 medium — the per-instance
    # gate alone under-counted 4x for msm_many's batched dispatches)
    dense = (
        config().msm_emit != "scatter"
        and w_count * nbuck <= total_rows
        and total_rows * 48 * 4 * max(1, dense_batch) <= (3 << 30)
    )

    if fused_T:
        from .pallas_kernels import msm_step_T
        from ..curves.limb_t import JacobianPointT

        def step(carry, xs):
            (tx, ty, tz), flag = carry if dense else carry[:2]
            b = None if dense else carry[2]
            if dense:
                src_s, head_s, live_s = xs
            else:
                src_s, head_s, tgt_s, live_s = xs
            pxy = qxy[src_s]  # (lanes, 32)
            pinf = jnp.all(pxy == 0, axis=1)
            accT, needs_double = msm_step_T(
                spec, JacobianPointT(tx, ty, tz), pxy[:, :16].T, pxy[:, 16:].T, pinf, head_s
            )
            flag = flag | jnp.any(needs_double & ~head_s & live_s)
            if dense:
                emit = jnp.concatenate([accT.x, accT.y, accT.z], axis=0)  # (48, lanes)
                return ((accT.x, accT.y, accT.z), flag), emit
            b = b.at[tgt_s].set(jnp.concatenate([accT.x.T, accT.y.T, accT.z.T], axis=1))
            return ((accT.x, accT.y, accT.z), flag, b), None

        inf0 = infinity(spec, (lanes,))
        if dense:
            init = ((inf0.x.T, inf0.y.T, inf0.z.T), jnp.zeros((), bool))
            ((tx, ty, tz), collision), ys = jax.lax.scan(
                step, init, (src_sl, head_sl, live_sl)
            )
            b = _dense_buckets(ys, True, k_s, is_last, w_count, nbuck, s_steps, buckets0_f)
        else:
            init = ((inf0.x.T, inf0.y.T, inf0.z.T), jnp.zeros((), bool), buckets0_f)
            ((tx, ty, tz), collision, b), _ = jax.lax.scan(
                step, init, (src_sl, head_sl, target_sl, live_sl)
            )
        tail = JacobianPoint(tx.T, ty.T, tz.T)
    else:

        def step(carry, xs):
            if dense:
                acc, flag = carry
                src_s, head_s, live_s = xs
            else:
                acc, flag, b = carry
                src_s, head_s, tgt_s, live_s = xs
            pxy = qxy[src_s]
            px, py = pxy[:, :16], pxy[:, 16:]
            pinf = jnp.all(pxy == 0, axis=1)
            if use_fused:
                from .pallas_kernels import msm_step_rows

                acc = msm_step_rows(spec, acc, px, py, pinf, head_s)
            elif complete:
                merged = point_add_mixed(spec, acc, px, py, pinf)
                pz = jnp.where(pinf[:, None], jnp.zeros((1, 16), jnp.uint32), one[None, :])
                acc = select_point(head_s, JacobianPoint(px, py, pz), merged)
            else:
                merged, needs_double = point_add_mixed_incomplete(spec, acc, px, py, pinf)
                pz = jnp.where(pinf[:, None], jnp.zeros((1, 16), jnp.uint32), one[None, :])
                acc = select_point(head_s, JacobianPoint(px, py, pz), merged)
                flag = flag | jnp.any(needs_double & ~head_s & live_s)
            if dense:
                emit = jnp.concatenate([acc.x, acc.y, acc.z], axis=1)  # (lanes, 48)
                return (acc, flag), emit
            b = b.at[tgt_s].set(jnp.concatenate([acc.x, acc.y, acc.z], axis=1))
            return (acc, flag, b), None

        if dense:
            init = (infinity(spec, (lanes,)), jnp.zeros((), bool))
            (tail, collision), ys = jax.lax.scan(step, init, (src_sl, head_sl, live_sl))
            b = _dense_buckets(ys, False, k_s, is_last, w_count, nbuck, s_steps, buckets0_f)
        else:
            init = (infinity(spec, (lanes,)), jnp.zeros((), bool), buckets0_f)
            (tail, collision, b), _ = jax.lax.scan(
                step, init, (src_sl, head_sl, target_sl, live_sl)
            )
    buckets = JacobianPoint(b[:, :16], b[:, 16:32], b[:, 32:])

    # ---- lane-boundary repair -------------------------------------------
    lane_flag = jnp.any(head_sl, axis=0)  # lane contains a segment head
    # scan depth: a headless lane run never crosses a window boundary (every
    # window's first row starts a new k_s segment), and one window's n rows
    # span at most lanes//w_count + 1 lanes
    max_run = max(1, lanes // w_count + 1)
    fix_levels = max(1, min((lanes - 1).bit_length(), max_run.bit_length()))
    g = _hillis_steele_scan(spec, tail, lane_flag, fix_levels)
    carry_in, _ = _shift_points(g, lane_flag, 1, jnp.ones((), bool))

    first_head = jnp.where(lane_flag, jnp.argmax(head_sl, axis=0), s_steps)
    any_last = jnp.any(is_last_sl, axis=0)
    first_last = jnp.argmax(is_last_sl, axis=0)
    has_fix = any_last & (first_last < first_head)
    tgt_fix = jnp.where(
        has_fix,
        jnp.take_along_axis(target_sl, first_last[None, :], axis=0)[0],
        trash,
    )
    broken_f = b[tgt_fix]  # one fused (lanes, 48) gather
    broken = JacobianPoint(broken_f[:, :16], broken_f[:, 16:32], broken_f[:, 32:])
    fixed = select_point(has_fix, _combine_points(spec, carry_in, broken), broken)
    b = b.at[tgt_fix].set(jnp.concatenate([fixed.x, fixed.y, fixed.z], axis=1))
    buckets = JacobianPoint(b[:, :16], b[:, 16:32], b[:, 32:])

    wsums = _aggregate_windows(spec, buckets, w_count, nbuck)
    return wsums, collision


def _aggregate_windows(spec: FieldSpec, buckets: JacobianPoint, w_count: int, nbuck: int):
    """Per-window weighted bucket sum T_w = sum_{b=1..m} b * S_{w,b} as a
    two-level serial decomposition (m = nbuck - 1 live buckets):

        b = k*g + i  (i in [1, g], k in [0, G), g*G >= m)
        T = sum_k [ k*g * U_k + A_k ],  U_k = sum_i S_{kg+i},
                                        A_k = sum_i i * S_{kg+i}

    Level 1 computes all (A_k, U_k) with one g-step serial scan at width
    W*G (running suffix r += S; acc += r). Level 2 folds sum_k k*U_k and
    sum_k A_k with one G-step serial scan at width W, then T = g*(sum k U_k)
    + sum A_k via log2(g) doublings. Total ~2(g+G) point-add DEPTH — far
    cheaper than the previous log-depth Hillis-Steele suffix scans whose
    every level was a full-width (W*m) point add."""
    m = nbuck - 1
    gbits = max(1, ((m - 1).bit_length() + 1) // 2)
    g = 1 << gbits
    G = (m + g - 1) // g
    stride = nbuck + 1
    # xs rows for level 1, step t processes local id (g - t): bucket id
    # b = k*g + (g - t); ids > m point at the per-window spare slot (never
    # written -> identity)
    idx = np.zeros((g, w_count * G), dtype=np.int32)
    for t in range(g):
        local = g - t
        for k in range(G):
            b = k * g + local
            col = np.arange(w_count) * G + k
            idx[t, col] = np.arange(w_count) * stride + (b if b <= m else nbuck)
    idx = jnp.asarray(idx)

    def gather(i):
        return JacobianPoint(buckets.x[i], buckets.y[i], buckets.z[i])

    def level1(carry, idx_t):
        r, acc = carry
        row = gather(idx_t)
        r = _combine_points(spec, r, row)
        acc = _combine_points(spec, acc, r)
        return (r, acc), None

    init = (infinity(spec, (w_count * G,)), infinity(spec, (w_count * G,)))
    (u_flat, a_flat), _ = jax.lax.scan(level1, init, idx)
    # (W, G, 16) leaves
    resh = lambda p: JacobianPoint(
        p.x.reshape(w_count, G, 16), p.y.reshape(w_count, G, 16), p.z.reshape(w_count, G, 16)
    )
    U = resh(u_flat)
    A = resh(a_flat)

    acc3 = JacobianPoint(A.x[:, 0], A.y[:, 0], A.z[:, 0])  # A_0
    if G > 1:
        # level 2: k descending G-1..1; r2 += U_k ; acc2 += r2 ; acc3 += A_k
        ks = np.arange(G - 1, 0, -1)
        xs = (
            (U.x[:, ks].transpose(1, 0, 2), U.y[:, ks].transpose(1, 0, 2), U.z[:, ks].transpose(1, 0, 2)),
            (A.x[:, ks].transpose(1, 0, 2), A.y[:, ks].transpose(1, 0, 2), A.z[:, ks].transpose(1, 0, 2)),
        )

        def level2(carry, x):
            r2, acc2, acc3 = carry
            (ux, uy, uz), (ax_, ay_, az_) = x
            r2 = point_add(spec, r2, JacobianPoint(ux, uy, uz))
            acc2 = point_add(spec, acc2, r2)
            acc3 = point_add(spec, acc3, JacobianPoint(ax_, ay_, az_))
            return (r2, acc2, acc3), None

        init2 = (
            infinity(spec, (w_count,)),
            infinity(spec, (w_count,)),
            acc3,
        )
        (_, acc2, acc3), _ = jax.lax.scan(level2, init2, xs)
        # T = g * acc2 + acc3
        for _ in range(gbits):
            acc2 = point_double(spec, acc2)
        return point_add(spec, acc2, acc3)
    return acc3


def _horner_device(spec: FieldSpec, wsums: JacobianPoint, c: int) -> JacobianPoint:
    """Fold (W, 16)-leaf window sums into the MSM result on device.

    ~c*W sequential tiny group ops — latency-bound on an accelerator, so the
    host-facing entry points fold on the HOST instead (host_window_fold);
    this device version serves in-graph consumers (bench chaining, the
    sharded MSM's mesh-local partials)."""

    def horner(acc, wsum):
        acc = jax.lax.fori_loop(0, c, lambda _, a: point_double(spec, a), acc)
        acc = point_add(spec, acc, JacobianPoint(wsum[0], wsum[1], wsum[2]))
        return acc, None

    rev_w = (wsums.x[::-1], wsums.y[::-1], wsums.z[::-1])
    acc, _ = jax.lax.scan(horner, infinity(spec), rev_w)
    return acc


def _msm_device(spec: FieldSpec, qx, qy, qinf, digits, c: int) -> JacobianPoint:
    """Full device MSM (window sums + device Horner fold), complete
    addition law — kept for in-graph consumers (bench chaining, graft
    entries, sharded partials); host-facing paths use _msm_device_wsums +
    the host fold."""
    wsums, _ = _msm_device_wsums(spec, qx, qy, qinf, digits, c, complete=True)
    return _horner_device(spec, wsums, c)


def host_window_fold(curve: Curve, wsum_points: list, c: int):
    """sum_w 2^(c*w) * S_w on the host: ~c*W point doublings of Python-int
    affine math — microseconds per op, vs ~100 ms for the same serial chain
    on the accelerator (each op there is a dispatch-latency-bound (1, 16)
    tensor program)."""
    acc = None
    for wsum in reversed(wsum_points):
        for _ in range(c):
            acc = curve.add(acc, acc)
        acc = curve.add(acc, wsum)
    return acc


def fold_window_sums(curve: Curve, aff_flat: list, b: int, w_count: int, c: int) -> list:
    """Horner window fold for b result vectors at once — the native C++
    batch kernel when available (OpenMP over results; the Python-int fold
    cost ~c·W point ops PER RESULT, ~10 s across a 72-proof batched
    session), exact Python otherwise."""
    from .. import native

    if b > 1 and native.available():
        which = native.which_for(curve.base.modulus)
        return native.window_fold_batch(which, aff_flat[: b * w_count], b, w_count, c)
    return [
        host_window_fold(curve, aff_flat[i * w_count : (i + 1) * w_count], c)
        for i in range(b)
    ]


def _msm_device_batch(spec: FieldSpec, qx, qy, qinf, digits_batch, c: int, complete: bool = False):
    """digits_batch: (B, W, N) — B independent scalar sets over shared
    points in one program, vmapped. The serial-run accumulation's per-step
    live set is (B, LANES, 16) leaves (+ one (B, LANES, 1024) bf16 chunk
    intermediate per in-flight mul), so batching multiplies a modest
    footprint — unlike the old flat-scan formulation, which materialized
    rows-sized point arrays and had to run sequentially under lax.map.
    Batching also amortizes the latency-bound tails (bucket aggregation)
    across the B MSMs; the Horner window fold happens host-side. Returns
    ((B, W, 16)-leaf wsums, (B,) collision flags)."""
    b = digits_batch.shape[0]
    return jax.vmap(
        lambda d: _msm_device_wsums(spec, qx, qy, qinf, d, c, complete, dense_batch=b)
    )(digits_batch)


def auto_window(n: int) -> tuple[int, bool]:
    """(c, signed) minimizing scan rows (W*n) + aggregation depth for the
    padded problem size n. Signed digits halve buckets, making larger
    windows (fewer Pippenger rows) affordable; tiny problems keep the
    unsigned byte fast path."""
    if n <= (1 << 13):
        return 8, False
    if n <= (1 << 15):
        return 10, True
    if n <= (1 << 17):
        return 12, True
    return 13, True


def signed_digits_device(limbs_canonical, c: int):
    """In-graph signed c-bit digit extraction from CANONICAL (N, 16)-limb
    scalars — the device twin of scalars_to_signed_digits. Keeping digit
    extraction on device lets provers/benches derive fresh scalar variants
    in-graph instead of uploading a (W, N) int32 digit array through the
    relay (~21 MB / ~0.4 s per MSM at 2^18).

    Returns (W, N) int32 digits in [-2^(c-1), 2^(c-1)]."""
    n = limbs_canonical.shape[0]
    w_count = signed_window_count(c)
    half = 1 << (c - 1)
    # u32 limbs padded so chunk j | j+1 << 16 always exists
    lp = jnp.concatenate(
        [limbs_canonical.astype(jnp.uint32), jnp.zeros((n, 2), jnp.uint32)], axis=1
    )
    digits = []
    carry = jnp.zeros((n,), jnp.int32)
    for w in range(w_count):
        bit = w * c
        j, off = bit // 16, bit % 16
        chunk = lp[:, j] | (lp[:, j + 1] << 16)
        d = ((chunk >> off) & ((1 << c) - 1)).astype(jnp.int32)
        t = d + carry
        hi = t >= half
        digits.append(jnp.where(hi, t - (1 << c), t))
        carry = hi.astype(jnp.int32)
    return jnp.stack(digits)


def unsigned_digits_device(limbs_canonical, c: int):
    """In-graph unsigned c-bit digit extraction from CANONICAL (N, 16)-limb
    scalars (device twin of scalars_to_digits; no borrow chain)."""
    n = limbs_canonical.shape[0]
    w_count = (SCALAR_BITS + c - 1) // c
    lp = jnp.concatenate(
        [limbs_canonical.astype(jnp.uint32), jnp.zeros((n, 2), jnp.uint32)], axis=1
    )
    digits = []
    for w in range(w_count):
        bit = w * c
        j, off = bit // 16, bit % 16
        chunk = lp[:, j] | (lp[:, j + 1] << 16)
        digits.append(((chunk >> off) & ((1 << c) - 1)).astype(jnp.int32))
    return jnp.stack(digits)


@functools.lru_cache(maxsize=None)
def _compiled_commit_batch(
    base_modulus: int,
    scalar_modulus: int,
    n: int,
    c: int,
    batch: int,
    omega: int,
    from_lagrange: bool = True,
):
    """Fused commit graph: [to_mont -> iNTT -> from_mont when
    ``from_lagrange``] -> in-graph digit extraction -> Pippenger window
    sums, ONE dispatch for a batch of polynomials over a shared point set.
    Returns (coeffs, wsums, collision flags); the host folds windows and
    adds the blinding [b]W. ``from_lagrange=False`` commits
    COEFFICIENT-form polynomials (h pieces, random polys) with the same
    in-graph digit extraction — the old msm_many route paid seconds of
    host-Python digit extraction per batched-session phase.

    IO rides uint16: canonical 16-bit limbs are exactly representable, so
    casting halves the relay transfer both ways (the 256-column batched
    dispatches moved ~270 MB round-trip as u32 — r5 session anatomy).

    Fusing kills two round-trips per prover phase (the coeff download +
    digit upload between the former separate NTT and MSM dispatches) and
    the digit extraction's host Python cost."""
    from . import ntt as D

    pspec = FieldSpec.make(base_modulus)
    sspec = FieldSpec.make(scalar_modulus)
    plan_inv = D.plan_for(scalar_modulus, n, pow(omega, -1, scalar_modulus))
    n_inv_mont = int_to_limbs(pow(n, -1, scalar_modulus) * sspec.r_mod_p % scalar_modulus)

    @jax.jit
    def f(qx, qy, qinf, vals):
        vals = vals.astype(jnp.uint32)
        if from_lagrange:
            vm = L.to_mont(sspec, vals)
            cm = D.intt(plan_inv, vm, jnp.asarray(n_inv_mont))
            coeffs = L.from_mont(sspec, cm)  # (B, n, 16) canonical
        else:
            coeffs = vals

        def body(_, cf):
            digits = unsigned_digits_device(cf, c)
            r, coll = _msm_device_wsums(pspec, qx, qy, qinf, digits, c, complete=False)
            return None, (r, coll)

        _, (ws, colls) = jax.lax.scan(body, None, coeffs)
        return coeffs.astype(jnp.uint16), ws, colls

    return f


def _signed_doubled(spec, qx, qy, qinf):
    """[P | -P] row doubling (negated y in the second half) so a signed
    digit's point select is just an index offset in the gather."""
    qx2 = jnp.concatenate([qx, qx])
    qy2 = jnp.concatenate([qy, L.neg(spec, qy)])
    qinf2 = jnp.concatenate([qinf, qinf])
    return qx2, qy2, qinf2


@functools.lru_cache(maxsize=None)
def _compiled_msm(
    modulus: int, n: int, c: int, n_windows: int, complete: bool = False, signed: bool = False
):
    spec = FieldSpec.make(modulus)

    @jax.jit
    def f(qx, qy, qinf, digits):
        if signed:
            qx2, qy2, qinf2 = _signed_doubled(spec, qx, qy, qinf)
            return _msm_device_wsums(spec, qx2, qy2, qinf2, digits, c, complete, signed=True)
        return _msm_device_wsums(spec, qx, qy, qinf, digits, c, complete)

    return f


@functools.lru_cache(maxsize=None)
def _compiled_msm_batch(
    modulus: int,
    n: int,
    c: int,
    n_windows: int,
    batch: int,
    complete: bool = False,
    signed: bool = False,
):
    spec = FieldSpec.make(modulus)

    @jax.jit
    def f(qx, qy, qinf, digits_batch):
        if signed:
            qx2, qy2, qinf2 = _signed_doubled(spec, qx, qy, qinf)
            return jax.vmap(
                lambda d: _msm_device_wsums(
                    spec, qx2, qy2, qinf2, d, c, complete, signed=True, dense_batch=batch
                )
            )(digits_batch)
        return _msm_device_batch(spec, qx, qy, qinf, digits_batch, c, complete)

    return f


def msm_many(
    curve: Curve,
    points,
    scalars_list,
    c: int | None = None,
    force_device: bool = False,
    prefer_host: bool = False,
    chunk: int | None = None,
):
    """Batched MSM: many scalar vectors over one shared point set, one
    device dispatch. Returns a list of affine results. ``chunk`` overrides
    the per-dispatch MSM count (default 4, the worker-watchdog bound for
    2^18-scale bodies — the batch prover raises it for k<=12 commits where
    each MSM body is sub-millisecond)."""
    if not scalars_list:
        return []
    if prefer_host or (not force_device and not device_backend_is_tpu()):
        return [host_msm(curve, points, s) for s in scalars_list]
    n0 = len(points)
    target = max(64, 1 << (n0 - 1).bit_length())
    if c is None:
        c, signed = auto_window(target)
    else:
        signed = False
    to_digits = scalars_to_signed_digits if signed else scalars_to_digits
    pts = list(points) + [curve.generator] * (target - n0)
    b0 = len(scalars_list)
    spec = FieldSpec.make(curve.base.modulus)
    jac = affine_to_jacobian_host(spec, pts)
    qinf = jnp.asarray(np.array([p is None for p in pts], dtype=bool))
    # chunk the batch: one giant sequential executable (tens of MSM bodies)
    # can exceed the TPU worker's execution watchdog and crash it
    if chunk is None:
        chunk = 4
    results = []
    for start in range(0, b0, chunk):
        group = scalars_list[start : start + chunk]
        b_target = max(1, 1 << (len(group) - 1).bit_length())
        digit_stack = np.stack(
            [
                to_digits([s % curve.scalar.modulus for s in sc] + [0] * (target - n0), c)
                for sc in group
            ]
            + [to_digits([0] * target, c)] * (b_target - len(group))
        )
        w = digit_stack.shape[1]
        dstack = jnp.asarray(digit_stack)
        f = _compiled_msm_batch(curve.base.modulus, target, c, w, b_target, signed=signed)
        out, collisions = device_call(f, jac.x, jac.y, qinf, dstack, what="batched MSM")
        if bool(np.any(np.asarray(collisions))):
            # incomplete-add P == Q hit (duplicate points in a bucket or a
            # DL-relation collision): redo this chunk with the complete law
            f = _compiled_msm_batch(
                curve.base.modulus, target, c, w, b_target, complete=True, signed=signed
            )
            out, _ = device_call(f, jac.x, jac.y, qinf, dstack, what="batched MSM (complete)")
        flat = JacobianPoint(
            out.x.reshape(-1, 16), out.y.reshape(-1, 16), out.z.reshape(-1, 16)
        )
        wsum_pts = jacobian_to_affine_host(spec, flat)
        for bi in range(len(group)):
            results.append(host_window_fold(curve, wsum_pts[bi * w : (bi + 1) * w], c))
    return results


def device_backend_is_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def host_msm(curve: Curve, points, scalars):
    """Host MSM: the native C++ Pippenger (csrc/pasta.cpp — mixed affine
    bucket adds, adaptive windows, OpenMP over windows) when available, the
    exact Python Pippenger otherwise. The LATENCY path: each call is ~ms,
    with no relay round trip — used for the IPA's Fiat-Shamir-sequential
    L/R rounds and the verifier's final MSM."""
    from .. import native

    if native.available() and points:
        which = native.which_for(curve.base.modulus)
        return native.msm(which, list(points), [s % curve.scalar.modulus for s in scalars])
    return curve.pippenger(points, scalars)


def msm(
    curve: Curve,
    points,
    scalars,
    c: int | None = None,
    force_device: bool = False,
    prefer_host: bool = False,
):
    """Host-facing MSM: affine points (None = identity) x int scalars ->
    affine result.

    Dispatches to the device Pippenger kernel on real accelerators (or when
    forced); small problems on the CPU test backend — and latency-critical
    call sites passing ``prefer_host`` — use the native/exact host Pippenger
    (host_msm): the device kernel's sequential scan depth is constant in n,
    so tiny MSMs gain nothing from a ~100 ms relay round trip. Window size
    and signed-digit use are auto-picked from the problem size (auto_window)
    unless c is given."""
    assert len(points) == len(scalars)
    if not points:
        return None
    if prefer_host or (not force_device and (not device_backend_is_tpu())):
        return host_msm(curve, points, scalars)
    # pad to a power of two (min 64) so arbitrary problem sizes share a small
    # set of compiled kernels (zero scalars land in the discarded 0-bucket)
    target = max(64, 1 << (len(points) - 1).bit_length())
    if c is None:
        c, signed = auto_window(target)
    else:
        signed = False
    if len(points) < target:
        pad = target - len(points)
        points = list(points) + [curve.generator] * pad
        scalars = list(scalars) + [0] * pad
    spec = FieldSpec.make(curve.base.modulus)
    jac = affine_to_jacobian_host(spec, points)
    qinf = jnp.asarray(np.array([p is None for p in points], dtype=bool))
    to_digits = scalars_to_signed_digits if signed else scalars_to_digits
    digits = jnp.asarray(to_digits([s % curve.scalar.modulus for s in scalars], c))
    f = _compiled_msm(curve.base.modulus, len(points), c, digits.shape[0], signed=signed)
    wsums, collision = device_call(f, jac.x, jac.y, qinf, digits, what="MSM")  # (W, 16) leaves
    if bool(np.asarray(collision)):
        f = _compiled_msm(
            curve.base.modulus, len(points), c, digits.shape[0], complete=True, signed=signed
        )
        wsums, _ = device_call(f, jac.x, jac.y, qinf, digits, what="MSM (complete)")
    return host_window_fold(curve, jacobian_to_affine_host(spec, wsums), c)
