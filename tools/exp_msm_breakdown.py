#!/usr/bin/env python
"""In-graph MSM phase breakdown on the real TPU — NO host uploads in the
timed path (the relay costs ~0.4 s per 21 MB upload, which swamps phase
timings; see BENCH_NOTES.md). Digits derive on device from a 4-byte seed;
each phase is its own jitted program chained REPS times with a mixing fold.

Phases (cumulative, matching ops/msm.py _msm_device_wsums):
  sort     : packed-key grouping (lax.sort or counting partition) + unpack
  layout   : + head/is_last/target/step-major reshapes
  gather   : + the per-step point gathers only (scan with add disabled)
  scan     : + the real bucket-accumulation scan (fused or jnp)
  repair   : + lane-boundary Hillis-Steele repair
  full     : entire _msm_device_wsums

Usage: PROF_N=262144 PROF_C=13 [BZ_MSM_PARTITION=1] [BZ_NO_PALLAS_MSM_T=1]
       python tools/exp_msm_breakdown.py [phases...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from battlezips_halo2_tpu.curves import VESTA
from battlezips_halo2_tpu.curves.limb import (
    JacobianPoint,
    affine_to_jacobian_host,
    infinity,
)
from battlezips_halo2_tpu.fields.limb import FieldSpec
from battlezips_halo2_tpu.ops import msm as M

N = int(os.environ.get("PROF_N", str(1 << 18)))
C = int(os.environ.get("PROF_C", "13"))
REPS = int(os.environ.get("PROF_REPS", "3"))
SPEC = FieldSpec.make(VESTA.base.modulus)
W = M.signed_window_count(C)
NBUCK = (1 << (C - 1)) + 1
TOTAL = W * N
IDX_BITS = max(1, (N - 1).bit_length())
print(
    f"backend={jax.default_backend()} n={N} c={C} windows={W} rows={TOTAL} "
    f"partition={'on' if os.environ.get('BZ_MSM_PARTITION','') not in ('','0') else 'off'}",
    flush=True,
)

from battlezips_halo2_tpu.pcs.ipa import cached_params

pts = cached_params((N - 1).bit_length()).g[:N]
jac = affine_to_jacobian_host(SPEC, pts)
qx0, qy0 = jnp.asarray(jac.x), jnp.asarray(jac.y)
qinf0 = jnp.zeros(N, bool)
qx, qy, qinf = M._signed_doubled(SPEC, qx0, qy0, qinf0)


def device_digits(seed):
    w_ids = jnp.arange(W, dtype=jnp.uint32)[:, None]
    i_ids = jnp.arange(N, dtype=jnp.uint32)[None, :]
    h = (i_ids * jnp.uint32(2654435761) + w_ids * jnp.uint32(40503) + seed) ^ (i_ids >> 13)
    h = h * jnp.uint32(2246822519)
    half = jnp.uint32(1 << (C - 1))
    return (h % (2 * half)).astype(jnp.int32) - (1 << (C - 1))


def sort_part(digits):
    mag = jnp.abs(digits.astype(jnp.int32))
    sgn = (digits < 0).astype(jnp.uint32)
    key = (
        (mag.astype(jnp.uint32) << (IDX_BITS + 1))
        | (sgn << IDX_BITS)
        | jnp.arange(N, dtype=jnp.uint32)
    )
    (key_s,) = M._group_rows([key], mag, NBUCK)
    k_sw = (key_s >> (IDX_BITS + 1)).astype(jnp.int32)
    order_w = ((key_s & ((1 << IDX_BITS) - 1)) + ((key_s >> IDX_BITS) & 1) * N).astype(jnp.int32)
    return k_sw, order_w


def layout_part(digits):
    k_sw, order_w = sort_part(digits)
    k_s = (jnp.arange(W, dtype=jnp.int32)[:, None] * NBUCK + k_sw).reshape(TOTAL)
    src = order_w.reshape(TOTAL)
    head = jnp.concatenate([jnp.ones(1, bool), k_s[1:] != k_s[:-1]])
    is_last = jnp.concatenate([k_s[1:] != k_s[:-1], jnp.ones(1, bool)])
    w_of = k_s // NBUCK
    d_of = k_s % NBUCK
    trash = W * (NBUCK + 1)
    target = jnp.where(is_last, w_of * (NBUCK + 1) + d_of, trash)
    lanes = M._lane_block(TOTAL, N)
    s_steps = TOTAL // lanes
    to_sl = lambda a: a.reshape(lanes, s_steps).T
    return to_sl(src), to_sl(head), to_sl(target), to_sl(d_of != 0), lanes, trash


def gather_part(digits):
    """Gathers + scatters with the field math replaced by a cheap xor —
    isolates the scan's memory traffic from its point arithmetic."""
    src_sl, head_sl, target_sl, live_sl, lanes, trash = layout_part(digits)
    buckets0 = infinity(SPEC, (trash + 1,))

    def step(carry, xs):
        acc, bx = carry
        src_s, head_s, tgt_s, live_s = xs
        px, py = qx[src_s], qy[src_s]
        acc = jnp.where(head_s[:, None], px, acc ^ px ^ py)
        bx = bx.at[tgt_s].set(acc)
        return (acc, bx), None

    init = (jnp.zeros((lanes, 16), jnp.uint32), buckets0.x)
    (acc, bx), _ = jax.lax.scan(step, init, (src_sl, head_sl, target_sl, live_sl))
    return acc, bx[:64]


def pregather_part(digits):
    """ONE-SHOT gather of points into sorted step-major order, then a scan
    consuming contiguous slices with trivial math — isolates whether hoisting
    the gathers out of the scan beats 160 in-scan random gathers."""
    src_sl, head_sl, target_sl, live_sl, lanes, trash = layout_part(digits)
    px_all = qx[src_sl]  # (S, lanes, 16) in one gather
    py_all = qy[src_sl]
    buckets0 = infinity(SPEC, (trash + 1,))

    def step(carry, xs):
        acc, bx = carry
        px, py, head_s, tgt_s = xs
        acc = jnp.where(head_s[:, None], px, acc ^ px ^ py)
        bx = bx.at[tgt_s].set(acc)
        return (acc, bx), None

    init = (jnp.zeros((lanes, 16), jnp.uint32), buckets0.x)
    (acc, bx), _ = jax.lax.scan(step, init, (px_all, py_all, head_sl, target_sl))
    return acc, bx[:64]


QXY = jnp.concatenate([qx, qy], axis=1)  # (2N, 32) fused x||y table


def gatherxy_part(digits):
    """Fused-table variant: ONE (2N, 32) x||y gather per step instead of two
    16-wide gathers, and ONE fused 48-wide bucket scatter instead of three —
    tests whether gather/scatter cost scales with ROW COUNT (not bytes)."""
    src_sl, head_sl, target_sl, live_sl, lanes, trash = layout_part(digits)
    buckets0 = jnp.zeros((trash + 1, 48), jnp.uint32)

    def step(carry, xs):
        acc, b = carry
        src_s, head_s, tgt_s = xs
        pxy = QXY[src_s]  # (lanes, 32)
        acc = jnp.where(head_s[:, None], pxy, acc ^ pxy)
        b = b.at[tgt_s].set(jnp.concatenate([acc, acc[:, :16]], axis=1))
        return (acc, b), None

    init = (jnp.zeros((lanes, 32), jnp.uint32), buckets0)
    (acc, b), _ = jax.lax.scan(step, init, (src_sl, head_sl, target_sl))
    return acc, b[:64]


def full_part(digits):
    return M._msm_device_wsums(SPEC, qx, qy, qinf, digits, C, signed=True)


from battlezips_halo2_tpu.fields import limb as FL
from battlezips_halo2_tpu.fields.limb import FP_SPEC


def derive_part(digits):
    """The bench body's per-variant scalar derivation (bench.py bench_msm):
    mont_mul by a rho power + from_mont + signed_digits_device — measures the
    non-MSM overhead inside the chained bench graph."""
    seed = jnp.sum(digits[0, :8].astype(jnp.uint32))
    base = jnp.broadcast_to((seed % 7 + 1).astype(jnp.uint32), (N, 16))
    sc_mont = FL.mont_mul(FP_SPEC, base, base)
    sc = FL.from_mont(FP_SPEC, sc_mont)
    d = M.signed_digits_device(sc, C)
    return jnp.sum(d.astype(jnp.uint32))


def benchbody_part(digits):
    """EXACT bench.py bench_msm per-variant body: in-graph scalar derivation
    (mont_mul by a rho power + from_mont + signed digit extraction) feeding
    _msm_device_wsums, plus the per-variant (W, 16)-leaf accumulator point
    add — isolates whatever the official bench pays beyond `full`."""
    from battlezips_halo2_tpu.curves.limb import point_add as _padd

    seed = jnp.sum(digits[0, :8].astype(jnp.uint32))
    base = jnp.broadcast_to((seed % 7 + 1).astype(jnp.uint32), (N, 16))
    sc_mont = FL.mont_mul(FP_SPEC, base, base)
    sc = FL.from_mont(FP_SPEC, sc_mont)
    d = M.signed_digits_device(sc, C)
    r, coll = M._msm_device_wsums(SPEC, qx, qy, qinf, d, C, signed=True)
    acc = infinity(SPEC, (M.signed_window_count(C),))
    acc = _padd(SPEC, acc, r)
    return acc.x, coll


def timed(name, fn):
    def chained(seed):
        def body(carry, i):
            out = fn(device_digits(seed + i))
            leaves = [jnp.asarray(l) for l in jax.tree_util.tree_leaves(out)]
            mix = sum(jnp.sum(l.astype(jnp.uint32)) for l in leaves)
            return carry + mix, None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.uint32), jnp.arange(REPS, dtype=jnp.uint32))
        return acc

    g = jax.jit(chained)
    t0 = time.time()
    np.asarray(g(jnp.uint32(1)))
    compile_s = time.time() - t0
    best = None
    for s in (101, 202):
        t0 = time.time()
        np.asarray(g(jnp.uint32(s)))
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{name:10s}: {best / REPS * 1000:9.1f} ms/rep  (compile+first {compile_s:.1f}s)", flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["sort", "layout", "gather", "pregather", "full"]
    fns = {
        "sort": sort_part,
        "layout": layout_part,
        "gather": gather_part,
        "pregather": pregather_part,
        "gatherxy": gatherxy_part,
        "derive": derive_part,
        "full": full_part,
        "benchbody": benchbody_part,
    }
    for w in which:
        timed(w, fns[w])
