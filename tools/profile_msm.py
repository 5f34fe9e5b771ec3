#!/usr/bin/env python
"""MSM component profiler — where do the seconds go at 2^14 on the TPU?

Ablation harness over a copy of ops/msm._msm_device_wsums's scan phase:
  full        : gather + mixed add + bucket scatter (the real step)
  noscatter   : gather + mixed add (bucket writes dropped)
  nogather    : contiguous point slices + mixed add + scatter
  addonly     : contiguous slices + mixed add (pure field math)
  uniq        : gather + add + scatter with UNIQUE indices (trash fanned out
                per-lane) + unique_indices=True
plus microbenches: row gather, duplicate-vs-unique scatter, mont_mul in the
current (N, 16) layout vs a transposed (16, N) prototype.

Methodology per BENCH_NOTES.md: K variants chained inside one jit, result
forced to host; time/K.
"""

import os
import random
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
    point_add_mixed_incomplete,
    select_point,
)
from battlezips_halo2_tpu.fields import limb as L
from battlezips_halo2_tpu.fields.limb import FieldSpec
from battlezips_halo2_tpu.ops import msm as M

LOG_N = int(os.environ.get("PROF_LOG_N", "14"))
N = 1 << LOG_N
C = 8
SPEC = FieldSpec.make(VESTA.base.modulus)
print(f"backend={jax.default_backend()} n=2^{LOG_N}", flush=True)


def timed(name, fn, *args, reps=2):
    """fn must be a jitted callable; time reps calls with the SAME args
    after one warmup (relay memoization is defeated by arg variation where
    it matters — here we vary via the variant axis instead)."""
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)  # warm + force
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
        jax.tree_util.tree_map(lambda x: np.asarray(x), out)
    dt = (time.time() - t0) / reps
    print(f"{name:42s} {dt*1e3:9.1f} ms", flush=True)
    return dt


def scan_phase(spec, qx, qy, qinf, digits, mode: str):
    """The bucket-accumulation scan from _msm_device_wsums, ablated."""
    w_count, n = digits.shape
    nbuck = 1 << C
    total_rows = w_count * n
    one = jnp.asarray(spec.one_mont)

    packed = (digits.astype(jnp.int32) << 23) | jnp.arange(n, dtype=jnp.int32)
    packed = jax.lax.sort(packed, dimension=1)
    k_sw = packed >> 23
    order_w = packed & ((1 << 23) - 1)
    k_s = (jnp.arange(w_count, dtype=jnp.int32)[:, None] * nbuck + k_sw).reshape(total_rows)
    src = order_w.reshape(total_rows)

    head = jnp.concatenate([jnp.ones(1, bool), k_s[1:] != k_s[:-1]])
    is_last = jnp.concatenate([k_s[1:] != k_s[:-1], jnp.ones(1, bool)])
    w_of = k_s // nbuck
    d_of = k_s % nbuck
    trash = w_count * (nbuck + 1)
    target = jnp.where(is_last, w_of * (nbuck + 1) + d_of, trash)

    lanes = M._lane_block(total_rows, n)
    s_steps = total_rows // lanes
    to_sl = lambda a: a.reshape(lanes, s_steps).T
    src_sl = to_sl(src)
    head_sl = to_sl(head)
    target_sl = to_sl(target)
    live_sl = to_sl(d_of != 0)

    n_extra = lanes if mode == "uniq" else 0
    buckets0 = infinity(spec, (trash + 1 + n_extra,))
    lane_iota = jnp.arange(lanes, dtype=jnp.int32)

    def step(carry, xs):
        acc, flag, bx, by, bz = carry
        src_s, head_s, tgt_s, live_s = xs
        if mode in ("nogather", "addonly"):
            px, py, pinf = qx[:lanes], qy[:lanes], qinf[:lanes]
        else:
            px, py, pinf = qx[src_s], qy[src_s], qinf[src_s]
        merged, needs_double = point_add_mixed_incomplete(spec, acc, px, py, pinf)
        pz = jnp.where(pinf[:, None], jnp.zeros((1, 16), jnp.uint32), one[None, :])
        acc = select_point(head_s, JacobianPoint(px, py, pz), merged)
        flag = flag | jnp.any(needs_double & ~head_s & live_s)
        if mode in ("full", "nogather"):
            bx = bx.at[tgt_s].set(acc.x)
            by = by.at[tgt_s].set(acc.y)
            bz = bz.at[tgt_s].set(acc.z)
        elif mode == "uniq":
            tgt_u = jnp.where(tgt_s == trash, trash + 1 + lane_iota, tgt_s)
            bx = bx.at[tgt_u].set(acc.x, unique_indices=True)
            by = by.at[tgt_u].set(acc.y, unique_indices=True)
            bz = bz.at[tgt_u].set(acc.z, unique_indices=True)
        return (acc, flag, bx, by, bz), None

    init = (infinity(spec, (lanes,)), jnp.zeros((), bool), buckets0.x, buckets0.y, buckets0.z)
    (tail, collision, bx, by, bz), _ = jax.lax.scan(
        step, init, (src_sl, head_sl, target_sl, live_sl)
    )
    return tail.x, bx, collision


def main():
    rng = random.Random(7)
    pts = [VESTA.mul(VESTA.generator, rng.randrange(VESTA.scalar.modulus)) for _ in range(512)]
    # tile the 512 random points to N (profiling only; values don't matter)
    pts = (pts * ((N + 511) // 512))[:N]
    jac = affine_to_jacobian_host(SPEC, pts)
    qinf = jnp.zeros(N, dtype=bool)
    digits = jnp.asarray(
        M.scalars_to_digits([rng.randrange(VESTA.scalar.modulus) for _ in range(N)], C)
    )

    which = sys.argv[1:] or ["full", "noscatter", "uniq", "nogather", "addonly", "micro"]
    for mode in which:
        if mode == "micro":
            continue
        f = jax.jit(lambda qx, qy, qi, d, mode=mode: scan_phase(SPEC, qx, qy, qi, d, mode))
        timed(f"scan[{mode}]", f, jac.x, jac.y, qinf, digits)

    if "micro" in which:
        # --- row gather --------------------------------------------------
        idx = jnp.asarray(np.random.RandomState(0).randint(0, N, size=8192).astype(np.int32))
        g = jax.jit(lambda a, i: a[i])
        timed("gather 8192 rows of (N,16)", g, jac.x, idx)

        # --- mont_mul layouts ---------------------------------------------
        a = jac.x[:8192]
        b = jac.y[:8192]
        mm = jax.jit(lambda a, b: L.mont_mul(SPEC, a, b))
        timed("mont_mul (8192,16) x1", mm, a, b)

        def chain10(a, b):
            def body(x, _):
                return L.mont_mul(SPEC, x, b), None
            out, _ = jax.lax.scan(body, a, None, length=10)
            return out
        timed("mont_mul (8192,16) x10 chained", jax.jit(chain10), a, b)

        at = a.T.copy()  # (16, 8192)
        bt = b.T.copy()

        def mont_mul_t(at, bt):
            """Transposed-layout Montgomery mul prototype: (16, N) limbs."""
            # products a_i*b_j -> (256, N) u32, split to 8-bit chunks (1024, N)
            prod = at[:, None, :] * bt[None, :, :]  # (16,16,N) u32, i-major
            prod = prod.reshape(256, -1)
            c0 = prod & 0xFF
            c1 = (prod >> 8) & 0xFF
            c2 = (prod >> 16) & 0xFF
            c3 = prod >> 24
            chunks = jnp.concatenate([c0, c1, c2, c3], axis=0)
            ch = chunks.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
            conv_full, _ = L._conv_mats()
            mat = jnp.asarray(conv_full).T  # (34, 1024)
            t = jnp.matmul(mat, ch, preferred_element_type=jnp.float32)
            t = t.astype(jnp.int32).astype(jnp.uint32)  # (34, N) lanes
            # REDC via Toeplitz (constant LHS)
            # T mod 2^256 canonical:
            outs = []
            carry = jnp.zeros_like(t[0])
            for j in range(16):
                v = t[j] + carry
                outs.append(v & 0xFFFF)
                carry = v >> 16
            t_low = jnp.stack(outs, axis=0)  # (16, N)
            lo = t_low & 0xFF
            hi = t_low >> 8
            a8 = jnp.stack([lo, hi], axis=1).reshape(32, -1)
            a8 = a8.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
            m = jnp.matmul(jnp.asarray(SPEC.toep_n8).T.astype(jnp.bfloat16), a8,
                           preferred_element_type=jnp.float32).astype(jnp.int32).astype(jnp.uint32)
            for _ in range(3):
                m = (m & 0xFF) + jnp.concatenate([jnp.zeros_like(m[:1]), (m >> 8)[:-1]], axis=0)
            m8 = m.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
            mp8 = jnp.matmul(jnp.asarray(SPEC.toep_p8).T.astype(jnp.bfloat16), m8,
                             preferred_element_type=jnp.float32).astype(jnp.int32).astype(jnp.uint32)
            mp16 = mp8[0::2] + (mp8[1::2] << 8)  # (33, N)
            width = 34
            tt = jnp.concatenate([t, jnp.zeros((width - t.shape[0], t.shape[1]), jnp.uint32)], axis=0)
            mm_ = jnp.concatenate([mp16, jnp.zeros((width - mp16.shape[0], mp16.shape[1]), jnp.uint32)], axis=0)
            s = tt + mm_
            outs = []
            carry = jnp.zeros_like(s[0])
            for j in range(width):
                v = s[j] + carry
                outs.append(v & 0xFFFF)
                carry = v >> 16
            s = jnp.stack(outs, axis=0)
            r17 = s[16:33]  # (17, N)
            # cond-sub p twice
            p17 = jnp.asarray(SPEC.p17.astype(np.int32))
            def cond_sub(r17):
                d = r17.astype(jnp.int32)
                outs = []
                borrow = jnp.zeros_like(d[0])
                for j in range(17):
                    e = d[j] - p17[j] - borrow
                    borrow = (e < 0).astype(jnp.int32)
                    outs.append(e + (borrow << 16))
                diff = jnp.stack(outs, axis=0)
                ge = (borrow == 0)[None, :]
                return jnp.where(ge, diff, d).astype(jnp.uint32)
            r = cond_sub(r17)[:16]
            r = cond_sub(jnp.concatenate([r, jnp.zeros_like(r[:1])], axis=0))[:16]
            return r

        mmt = jax.jit(mont_mul_t)
        out_t = mmt(at, bt)
        # correctness: same result as row layout
        ref = np.asarray(mm(a, b))
        got = np.asarray(out_t).T
        assert (got == ref).all(), "transposed mont_mul mismatch"
        print("transposed mont_mul bit-exact", flush=True)
        timed("mont_mul (16,8192) transposed x1", mmt, at, bt)

        def chain10_t(at, bt):
            def body(x, _):
                return mont_mul_t(x, bt), None
            out, _ = jax.lax.scan(body, at, None, length=10)
            return out
        timed("mont_mul (16,8192) transposed x10", jax.jit(chain10_t), at, bt)


if __name__ == "__main__":
    main()
