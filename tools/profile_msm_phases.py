#!/usr/bin/env python
"""Phase-level timing of the device MSM (ops/msm.py) on the real TPU.

Each phase is compiled as its own jitted chain (K reps inside one
executable, varied inputs, forced host transfer) so relay memoization and
the missing block_until_ready barrier can't distort it:

  sort    : digit sort + packed-key unpack only
  gather  : sorted-order point gather only
  scan    : the serial lane-run bucket accumulation scan
  repair  : lane-boundary Hillis-Steele + carry apply
  agg     : two-level bucket aggregation
  full    : the whole _msm_device_wsums

Usage: PROF_N=16384 PROF_C=10 python tools/profile_msm_phases.py
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

import random

import jax.numpy as jnp
import numpy as np

from battlezips_halo2_tpu.curves import VESTA
from battlezips_halo2_tpu.curves.limb import (
    JacobianPoint,
    affine_to_jacobian_host,
    infinity,
    point_add,
    point_add_mixed_incomplete,
    select_point,
)
from battlezips_halo2_tpu.fields.limb import FieldSpec
from battlezips_halo2_tpu.ops import msm as M

N = int(os.environ.get("PROF_N", str(1 << 14)))
C = int(os.environ.get("PROF_C", "10"))
REPS = int(os.environ.get("PROF_REPS", "4"))
SPEC = FieldSpec.make(VESTA.base.modulus)
print(f"backend={jax.default_backend()} n={N} c={C} reps={REPS}", flush=True)

rng = random.Random(0)
# real SRS points: DISTINCT rows, so the per-step point gather pays its
# true HBM cost (a repeated-256-point table is cache-resident and lies)
from battlezips_halo2_tpu.pcs.ipa import cached_params

pts = cached_params(max(1, (N - 1).bit_length())).g[:N]
if len(pts) < N:
    pts = (pts * ((N + len(pts) - 1) // len(pts)))[:N]
jac = affine_to_jacobian_host(SPEC, pts)
qx0, qy0 = jnp.asarray(jac.x), jnp.asarray(jac.y)
qinf0 = jnp.zeros(N, bool)

digit_sets = []
for r in range(REPS):
    sc = [rng.randrange(VESTA.scalar.modulus) for _ in range(N)]
    digit_sets.append(M.scalars_to_signed_digits(sc, C))
digits_all = jnp.asarray(np.stack(digit_sets))  # (R, W, N)
W = digit_sets[0].shape[0]
NBUCK = (1 << (C - 1)) + 1
TOTAL = W * N
print(f"windows={W} nbuck={NBUCK} rows={TOTAL}", flush=True)

qx, qy, qinf = M._signed_doubled(SPEC, qx0, qy0, qinf0)

IDX_BITS = max(1, (2 * N - 1).bit_length())


def sort_phase(digits):
    mag = jnp.abs(digits.astype(jnp.int32))
    sgn = (digits < 0).astype(jnp.int32)
    payload = (sgn << (IDX_BITS - 1)) | jnp.arange(N, dtype=jnp.int32)
    k_sw, pay_s = jax.lax.sort([mag, payload], dimension=1, num_keys=1)
    order_w = (pay_s & ((1 << (IDX_BITS - 1)) - 1)) + (pay_s >> (IDX_BITS - 1)) * N
    k_s = (jnp.arange(W, dtype=jnp.int32)[:, None] * NBUCK + k_sw).reshape(TOTAL)
    return k_s, order_w.reshape(TOTAL)


def layout(k_s, src):
    head = jnp.concatenate([jnp.ones(1, bool), k_s[1:] != k_s[:-1]])
    is_last = jnp.concatenate([k_s[1:] != k_s[:-1], jnp.ones(1, bool)])
    w_of = k_s // NBUCK
    d_of = k_s % NBUCK
    trash = W * (NBUCK + 1)
    target = jnp.where(is_last, w_of * (NBUCK + 1) + d_of, trash)
    lanes = M._lane_block(TOTAL, N)
    s_steps = TOTAL // lanes
    to_sl = lambda a: a.reshape(lanes, s_steps).T
    return (
        to_sl(src),
        to_sl(head),
        to_sl(target),
        to_sl(d_of != 0),
        lanes,
        s_steps,
        trash,
    )


def scan_phase(src_sl, head_sl, target_sl, live_sl, lanes, trash):
    one = jnp.asarray(SPEC.one_mont)
    buckets0 = infinity(SPEC, (trash + 1,))

    def step(carry, xs):
        acc, flag, bx, by, bz = carry
        src_s, head_s, tgt_s, live_s = xs
        px, py, pinf = qx[src_s], qy[src_s], qinf[src_s]
        merged, needs_double = point_add_mixed_incomplete(SPEC, acc, px, py, pinf)
        pz = jnp.where(pinf[:, None], jnp.zeros((1, 16), jnp.uint32), one[None, :])
        acc = select_point(head_s, JacobianPoint(px, py, pz), merged)
        flag = flag | jnp.any(needs_double & ~head_s & live_s)
        bx = bx.at[tgt_s].set(acc.x)
        by = by.at[tgt_s].set(acc.y)
        bz = bz.at[tgt_s].set(acc.z)
        return (acc, flag, bx, by, bz), None

    init = (infinity(SPEC, (lanes,)), jnp.zeros((), bool), buckets0.x, buckets0.y, buckets0.z)
    (tail, flag, bx, by, bz), _ = jax.lax.scan(step, init, (src_sl, head_sl, target_sl, live_sl))
    return tail, flag, JacobianPoint(bx, by, bz), head_sl


def scan_nogather(head_sl, target_sl, live_sl, lanes, trash, s_steps):
    """Scan with pre-gathered rows (gather hoisted out of the scan body)."""
    one = jnp.asarray(SPEC.one_mont)
    buckets0 = infinity(SPEC, (trash + 1,))
    # pre-gathered (S, lanes, 16) stacks
    px_all = qx[jnp.zeros((s_steps, lanes), jnp.int32)]
    py_all = qy[jnp.zeros((s_steps, lanes), jnp.int32)]
    pinf_all = qinf[jnp.zeros((s_steps, lanes), jnp.int32)]

    def step(carry, xs):
        acc, flag, bx, by, bz = carry
        px, py, pinf, head_s, tgt_s, live_s = xs
        merged, needs_double = point_add_mixed_incomplete(SPEC, acc, px, py, pinf)
        pz = jnp.where(pinf[:, None], jnp.zeros((1, 16), jnp.uint32), one[None, :])
        acc = select_point(head_s, JacobianPoint(px, py, pz), merged)
        flag = flag | jnp.any(needs_double & ~head_s & live_s)
        bx = bx.at[tgt_s].set(acc.x)
        by = by.at[tgt_s].set(acc.y)
        bz = bz.at[tgt_s].set(acc.z)
        return (acc, flag, bx, by, bz), None

    init = (infinity(SPEC, (lanes,)), jnp.zeros((), bool), buckets0.x, buckets0.y, buckets0.z)
    (tail, flag, *_), _ = jax.lax.scan(
        step, init, (px_all, py_all, pinf_all, head_sl, target_sl, live_sl)
    )
    return tail, flag


def _fresh_digits(seed: int):
    """Genuinely fresh digit VALUES: the relay memoizes on (executable,
    input values), so `digits + 0` does NOT defeat it — only new values do."""
    r = random.Random(seed)
    sets = [
        M.scalars_to_signed_digits([r.randrange(VESTA.scalar.modulus) for _ in range(N)], C)
        for _ in range(REPS)
    ]
    return jnp.asarray(np.stack(sets))


def timed(name, make_fn):
    """make_fn() -> jitted callable over digits (R-chained inside)."""
    f = jax.jit(make_fn())
    t0 = time.time()
    out = f(digits_all)
    jax.tree_util.tree_map(np.asarray, out)
    compile_s = time.time() - t0
    best = None
    for trial in range(2):
        fresh = _fresh_digits(1000 + trial)
        t0 = time.time()
        out = f(fresh)
        jax.tree_util.tree_map(np.asarray, out)
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(
        f"{name:12s}: {best / REPS * 1000:9.1f} ms/rep   (compile+first {compile_s:.1f}s)",
        flush=True,
    )
    return best / REPS


def chain(fn):
    """R-rep chain with a tiny mixing fold so XLA can't CSE the reps."""

    def run(digits_all):
        def body(carry, d):
            out = fn(d)
            leaves = jax.tree_util.tree_leaves(out)
            mix = sum(jnp.sum(l.astype(jnp.uint32)) if l.dtype != bool else jnp.sum(l) for l in leaves)
            return carry + mix.astype(jnp.uint64), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.uint64), digits_all)
        return acc

    return run


which = sys.argv[1:] or ["sort", "gather", "scan", "scan_ng", "repair_agg", "full"]

if "sort" in which:
    timed("sort", lambda: chain(lambda d: sort_phase(d)))

if "gather" in which:
    def g(d):
        k_s, src = sort_phase(d)
        return qx[src], qy[src]

    timed("sort+gather", lambda: chain(g))

if "scan" in which:
    def s(d):
        k_s, src = sort_phase(d)
        src_sl, head_sl, target_sl, live_sl, lanes, s_steps, trash = layout(k_s, src)
        tail, flag, buckets, _ = scan_phase(src_sl, head_sl, target_sl, live_sl, lanes, trash)
        return tail.x, flag, buckets.x[:8]

    timed("sort+scan", lambda: chain(s))

if "agg" in which:
    # buckets built with ONE flat gather+scatter (no scan), then the real
    # two-level aggregation; "aggprep" times the build alone so the
    # difference isolates _aggregate_windows
    from battlezips_halo2_tpu.curves.limb import JacobianPoint as _JP

    def _prep(d):
        k_s, src = sort_phase(d)
        trash = W * (NBUCK + 1)
        w_of = k_s // NBUCK
        d_of = k_s % NBUCK
        tgt = jnp.where(d_of != 0, w_of * (NBUCK + 1) + d_of, trash)
        bx = jnp.zeros((trash + 1, 16), jnp.uint32).at[tgt].set(qx[src])
        by = jnp.zeros((trash + 1, 16), jnp.uint32).at[tgt].set(qy[src])
        bz = jnp.zeros((trash + 1, 16), jnp.uint32).at[tgt].set(qy[src] ^ 1)
        return _JP(bx, by, bz)

    def aprep(d):
        b = _prep(d)
        return b.x[:4], b.z[:4]

    def a(d):
        wsums = M._aggregate_windows(SPEC, _prep(d), W, NBUCK)
        return wsums.x

    timed("aggprep", lambda: chain(aprep))
    timed("prep+agg", lambda: chain(a))

if "full" in which:
    def full(d):
        wsums, coll = M._msm_device_wsums(SPEC, qx, qy, qinf, d, C, signed=True)
        return wsums.x, coll

    timed("full", lambda: chain(full))
