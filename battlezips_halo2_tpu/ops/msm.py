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
    point_double,
    select_point,
)
from ..fields import limb as L
from ..fields.limb import FieldSpec

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
    point_add instance in the graph: fori_loop over log2(n) levels, dynamic
    shift distance."""

    def level(i, carry):
        p, f = carry
        d = jnp.left_shift(1, i)
        # fill = the segmented-monoid identity (identity point, flag False)
        sp, sf = _shift_points(p, f, d, jnp.zeros((), bool))
        merged = point_add(spec, sp, p)
        out = select_point(f, p, merged)
        return (out, f | sf)

    out, _ = jax.lax.fori_loop(0, levels, level, (pts, head))
    return out


def _segmented_bucket_sums(spec: FieldSpec, pts: JacobianPoint, digits, c: int):
    """Sorted segmented scan -> (2^c + 1)-slot bucket array (slot 2^c is a
    trash slot for non-segment-end rows)."""
    n = digits.shape[0]
    levels = max(1, (n - 1).bit_length())
    order = jnp.argsort(digits)
    d_s = digits[order]
    pts = JacobianPoint(pts.x[order], pts.y[order], pts.z[order])

    head = jnp.concatenate([jnp.ones(1, bool), d_s[1:] != d_s[:-1]])
    scanned = _hillis_steele_scan(spec, pts, head, levels)

    is_last = jnp.concatenate([d_s[1:] != d_s[:-1], jnp.ones(1, bool)])
    target = jnp.where(is_last, d_s, 1 << c)

    buckets = infinity(spec, ((1 << c) + 1,))
    buckets = JacobianPoint(
        buckets.x.at[target].set(scanned.x),
        buckets.y.at[target].set(scanned.y),
        buckets.z.at[target].set(scanned.z),
    )
    return buckets


def _bucket_aggregate(spec: FieldSpec, buckets: JacobianPoint, c: int) -> JacobianPoint:
    """sum_b b * S_b for b in [1, 2^c) via double suffix scan
    (sum_b b*S_b == sum_j sum_{b>=j} S_b)."""
    sl = slice((1 << c) - 1, 0, -1)
    rev = JacobianPoint(buckets.x[sl], buckets.y[sl], buckets.z[sl])
    m = (1 << c) - 1
    no_head = jnp.zeros(m, bool)
    suffix = _hillis_steele_scan(spec, rev, no_head, max(1, (m - 1).bit_length()))
    total = _hillis_steele_scan(spec, suffix, no_head, max(1, (m - 1).bit_length()))
    return JacobianPoint(total.x[-1], total.y[-1], total.z[-1])


def _msm_device(spec: FieldSpec, qx, qy, qinf, digits, c: int) -> JacobianPoint:
    """digits: (W, N). All windows' bucket pipelines run as ONE vmapped
    (lane-parallel) computation; only the cheap Horner window fold is
    sequential (W * (c+1) point ops of depth)."""
    one = jnp.broadcast_to(jnp.asarray(spec.one_mont), qx.shape)
    zero = jnp.zeros_like(qx)
    pts = JacobianPoint(qx, qy, jnp.where(qinf[:, None], zero, one))

    def window_fn(window_digits):
        buckets = _segmented_bucket_sums(spec, pts, window_digits, c)
        return _bucket_aggregate(spec, buckets, c)

    wsums = jax.vmap(window_fn)(digits)  # leaves (W, 16)

    def horner(acc, wsum):
        acc = jax.lax.fori_loop(0, c, lambda _, a: point_double(spec, a), acc)
        acc = point_add(spec, acc, JacobianPoint(wsum[0], wsum[1], wsum[2]))
        return acc, None

    rev = (wsums.x[::-1], wsums.y[::-1], wsums.z[::-1])
    acc, _ = jax.lax.scan(horner, infinity(spec), rev)
    return acc


def _msm_device_batch(spec: FieldSpec, qx, qy, qinf, digits_batch, c: int) -> JacobianPoint:
    """digits_batch: (B, W, N) — B independent scalar sets over shared
    points, vmapped into one program (the prover commits whole column
    batches in a single device call)."""
    return jax.vmap(lambda d: _msm_device(spec, qx, qy, qinf, d, c))(digits_batch)


@functools.lru_cache(maxsize=None)
def _compiled_msm(modulus: int, n: int, c: int, n_windows: int):
    spec = FieldSpec.make(modulus)

    @jax.jit
    def f(qx, qy, qinf, digits):
        return _msm_device(spec, qx, qy, qinf, digits, c)

    return f


@functools.lru_cache(maxsize=None)
def _compiled_msm_batch(modulus: int, n: int, c: int, n_windows: int, batch: int):
    spec = FieldSpec.make(modulus)

    @jax.jit
    def f(qx, qy, qinf, digits_batch):
        return _msm_device_batch(spec, qx, qy, qinf, digits_batch, c)

    return f


def msm_many(curve: Curve, points, scalars_list, c: int = WINDOW_BITS, force_device: bool = False):
    """Batched MSM: many scalar vectors over one shared point set, one
    device dispatch. Returns a list of affine results."""
    if not scalars_list:
        return []
    if not force_device and not device_backend_is_tpu():
        return [curve.pippenger(points, s) for s in scalars_list]
    n0 = len(points)
    target = max(64, 1 << (n0 - 1).bit_length())
    pts = list(points) + [curve.generator] * (target - n0)
    b0 = len(scalars_list)
    b_target = max(1, 1 << (b0 - 1).bit_length())
    spec = FieldSpec.make(curve.base.modulus)
    jac = affine_to_jacobian_host(spec, pts)
    qinf = jnp.asarray(np.array([p is None for p in pts], dtype=bool))
    digit_stack = np.stack(
        [
            scalars_to_digits([s % curve.scalar.modulus for s in sc] + [0] * (target - n0), c)
            for sc in scalars_list
        ]
        + [scalars_to_digits([0] * target, c)] * (b_target - b0)
    )
    f = _compiled_msm_batch(curve.base.modulus, target, c, digit_stack.shape[1], b_target)
    out = f(jac.x, jac.y, qinf, jnp.asarray(digit_stack))
    res = jacobian_to_affine_host(spec, out)
    return res[:b0]


def device_backend_is_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


def msm(curve: Curve, points, scalars, c: int = WINDOW_BITS, force_device: bool = False):
    """Host-facing MSM: affine points (None = identity) x int scalars ->
    affine result.

    Dispatches to the device Pippenger kernel on real accelerators (or when
    forced); small problems on the CPU test backend use the exact host
    Pippenger — the device kernel's sequential scan depth is constant in n,
    so tiny MSMs gain nothing from it."""
    assert len(points) == len(scalars)
    if not points:
        return None
    if not force_device and (not device_backend_is_tpu()) :
        return curve.pippenger(points, scalars)
    # pad to a power of two (min 64) so arbitrary problem sizes share a small
    # set of compiled kernels (zero scalars land in the discarded 0-bucket)
    target = max(64, 1 << (len(points) - 1).bit_length())
    if len(points) < target:
        pad = target - len(points)
        points = list(points) + [curve.generator] * pad
        scalars = list(scalars) + [0] * pad
    spec = FieldSpec.make(curve.base.modulus)
    jac = affine_to_jacobian_host(spec, points)
    qinf = jnp.asarray(np.array([p is None for p in points], dtype=bool))
    digits = jnp.asarray(scalars_to_digits([s % curve.scalar.modulus for s in scalars], c))
    f = _compiled_msm(curve.base.modulus, len(points), c, digits.shape[0])
    out = f(jac.x, jac.y, qinf, digits)
    res = jacobian_to_affine_host(spec, JacobianPoint(out.x[None], out.y[None], out.z[None]))
    return res[0]
