"""Phase breakdown of the device MSM pipeline on the real TPU.

Times each stage of ops/msm.py separately (sort, serial bucket scan,
lane repair, aggregation, Horner fold) using the relay-safe methodology
from BENCH_NOTES.md: fresh inputs per call, K repetitions chained inside
one executable, forced host transfer of a tiny result.
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from battlezips_halo2_tpu.curves import VESTA
from battlezips_halo2_tpu.curves.limb import JacobianPoint, affine_to_jacobian_host, infinity, point_add, point_add_mixed, point_double, select_point
from battlezips_halo2_tpu.fields.limb import FieldSpec
from battlezips_halo2_tpu.ops import msm as M


def timed(name, fn, *args):
    """fn is jitted and returns something small-ish; measure via 2 calls with
    the second on (slightly) different input where possible."""
    t0 = time.time()
    r = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    first = time.time() - t0
    t0 = time.time()
    r = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(r)[0])
    second = time.time() - t0
    print(f"{name:28s} first={first:8.3f}s  repeat={second:8.3f}s")
    return r


def main(log_size: int = 14, c: int = 8):
    n = 1 << log_size
    rng = random.Random(7)
    base_pts = [VESTA.mul(VESTA.generator, rng.randrange(1, 1 << 40)) for _ in range(256)]
    points = [base_pts[i % 256] for i in range(n)]
    scalars = [rng.randrange(VESTA.scalar.modulus) for _ in range(n)]
    spec = FieldSpec.make(VESTA.base.modulus)
    jac = affine_to_jacobian_host(spec, points)
    qinf = jnp.asarray(np.zeros(n, dtype=bool))
    digits = jnp.asarray(M.scalars_to_digits(scalars, c))
    w_count = digits.shape[0]
    nbuck = 1 << c
    total_rows = w_count * n
    lanes = M._lane_block(total_rows, n)
    s_steps = total_rows // lanes
    print(f"n=2^{log_size} c={c} W={w_count} rows={total_rows} LANES={lanes} S={s_steps}")

    # ---- stage 1: sort + index prep
    @jax.jit
    def prep(digits):
        idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (w_count, n))
        k_sw, order_w = jax.lax.sort_key_val(digits, idx, dimension=1)
        k_s = (jnp.arange(w_count, dtype=jnp.int32)[:, None] * nbuck + k_sw).reshape(total_rows)
        src = order_w.reshape(total_rows)
        head = jnp.concatenate([jnp.ones(1, bool), k_s[1:] != k_s[:-1]])
        is_last = jnp.concatenate([k_s[1:] != k_s[:-1], jnp.ones(1, bool)])
        w_of = k_s // nbuck
        d_of = k_s % nbuck
        trash = w_count * (nbuck + 1)
        target = jnp.where(is_last, w_of * (nbuck + 1) + d_of, trash)
        to_sl = lambda a: a.reshape(lanes, s_steps).T
        return to_sl(src), to_sl(head), to_sl(target), to_sl(is_last)

    src_sl, head_sl, target_sl, is_last_sl = timed("sort+prep", prep, digits)

    one = jnp.asarray(spec.one_mont)
    trash = w_count * (nbuck + 1)

    # ---- stage 2: serial bucket scan
    @jax.jit
    def bucket_scan(qx, qy, qinf, src_sl, head_sl, target_sl):
        buckets0 = infinity(spec, (trash + 1,))

        def step(carry, xs):
            acc, bx, by, bz = carry
            src_s, head_s, tgt_s = xs
            px, py, pinf = qx[src_s], qy[src_s], qinf[src_s]
            merged = point_add_mixed(spec, acc, px, py, pinf)
            pz = jnp.where(pinf[:, None], jnp.zeros((1, 16), jnp.uint32), one[None, :])
            acc = select_point(head_s, JacobianPoint(px, py, pz), merged)
            bx = bx.at[tgt_s].set(acc.x)
            by = by.at[tgt_s].set(acc.y)
            bz = bz.at[tgt_s].set(acc.z)
            return (acc, bx, by, bz), None

        init = (infinity(spec, (lanes,)), buckets0.x, buckets0.y, buckets0.z)
        (tail, bx, by, bz), _ = jax.lax.scan(step, init, (src_sl, head_sl, target_sl))
        return tail, JacobianPoint(bx, by, bz)

    tail, buckets = timed("bucket scan", bucket_scan, jac.x, jac.y, qinf, src_sl, head_sl, target_sl)

    # ---- stage 3: lane repair
    @jax.jit
    def repair(tail, buckets, head_sl, is_last_sl, target_sl):
        lane_flag = jnp.any(head_sl, axis=0)
        fix_levels = max(1, (lanes - 1).bit_length())
        g = M._hillis_steele_scan(spec, tail, lane_flag, fix_levels)
        carry_in, _ = M._shift_points(g, lane_flag, 1, jnp.ones((), bool))
        first_head = jnp.where(lane_flag, jnp.argmax(head_sl, axis=0), s_steps)
        any_last = jnp.any(is_last_sl, axis=0)
        first_last = jnp.argmax(is_last_sl, axis=0)
        has_fix = any_last & (first_last < first_head)
        tgt_fix = jnp.where(has_fix, jnp.take_along_axis(target_sl, first_last[None, :], axis=0)[0], trash)
        broken = JacobianPoint(buckets.x[tgt_fix], buckets.y[tgt_fix], buckets.z[tgt_fix])
        fixed = select_point(has_fix, point_add(spec, carry_in, broken), broken)
        return JacobianPoint(
            buckets.x.at[tgt_fix].set(fixed.x),
            buckets.y.at[tgt_fix].set(fixed.y),
            buckets.z.at[tgt_fix].set(fixed.z),
        )

    buckets = timed("lane repair", repair, tail, buckets, head_sl, is_last_sl, target_sl)

    # ---- stage 4: aggregation (two suffix scans)
    m = nbuck - 1

    @jax.jit
    def aggregate(bx, by, bz):
        buckets = JacobianPoint(bx, by, bz)
        rev_idx = np.concatenate([w * (nbuck + 1) + np.arange(m, 0, -1) for w in range(w_count)]).astype(np.int32)
        rev = JacobianPoint(buckets.x[jnp.asarray(rev_idx)], buckets.y[jnp.asarray(rev_idx)], buckets.z[jnp.asarray(rev_idx)])
        whead = np.zeros(w_count * m, dtype=bool)
        whead[::m] = True
        whead = jnp.asarray(whead)
        agg_levels = max(1, (w_count * m - 1).bit_length())
        suffix = M._hillis_steele_scan(spec, rev, whead, agg_levels)
        totals = M._hillis_steele_scan(spec, suffix, whead, agg_levels)
        ends = jnp.asarray(np.arange(1, w_count + 1) * m - 1)
        return JacobianPoint(totals.x[ends], totals.y[ends], totals.z[ends])

    wsums = timed("aggregation", aggregate, buckets.x, buckets.y, buckets.z)

    # ---- stage 5: Horner fold
    @jax.jit
    def horner(wx, wy, wz):
        def body(acc, wsum):
            acc = jax.lax.fori_loop(0, c, lambda _, a: point_double(spec, a), acc)
            acc = point_add(spec, acc, JacobianPoint(wsum[0], wsum[1], wsum[2]))
            return acc, None

        rev_w = (wx[::-1], wy[::-1], wz[::-1])
        acc, _ = jax.lax.scan(body, infinity(spec), rev_w)
        return acc

    timed("horner fold", horner, wsums.x, wsums.y, wsums.z)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--log-size", type=int, default=14)
    ap.add_argument("-c", type=int, default=8)
    args = ap.parse_args()
    main(args.log_size, args.c)
