#!/usr/bin/env python
"""Field-mul and point-add throughput micro — long in-jit chains so device
compute dominates the ~80 ms relay round trip.

Chains are data-dependent (each output feeds the next op) so XLA cannot
dead-code or reorder them; inputs vary per run via a counter fold-in.
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
    point_add,
    point_add_mixed_incomplete,
)
from battlezips_halo2_tpu.fields import limb as L
from battlezips_halo2_tpu.fields.limb import FieldSpec

SPEC = FieldSpec.make(VESTA.base.modulus)
N = int(os.environ.get("PROF_N", str(1 << 15)))
REPS = int(os.environ.get("PROF_REPS", "100"))
print(f"backend={jax.default_backend()} N={N} chain={REPS}", flush=True)


def timed(name, fn, *args, work_items):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)
    t0 = time.time()
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)
    dt = time.time() - t0
    per = dt / work_items
    print(f"{name:44s} {dt*1e3:9.1f} ms  {per*1e9:8.1f} ns/item  {1/per/1e6:8.1f} M/s", flush=True)
    return dt


def main():
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randint(0, 1 << 16, size=(N, 16)).astype(np.uint32))
    b = jnp.asarray(rng.randint(0, 1 << 16, size=(N, 16)).astype(np.uint32))

    which = sys.argv[1:] or ["mul", "mult", "add", "padd"]

    if "mul" in which:

        def chain(a, b):
            def body(x, _):
                return L.mont_mul(SPEC, x, b), None

            out, _ = jax.lax.scan(body, a, None, length=REPS)
            return out

        timed(f"mont_mul ({N},16) x{REPS}", jax.jit(chain), a, b, work_items=N * REPS)

    if "mult" in which:
        at = a.T
        bt = b.T

        def mont_mul_t(spec, at, bt):
            """Transposed (16, N) mont mul; same math as profile_msm's proto."""
            prod_parts = [at * bt[j : j + 1, :] for j in range(16)]
            prod = jnp.concatenate(prod_parts, axis=0)  # (256, N) j-major
            c0 = prod & 0xFF
            c1 = (prod >> 8) & 0xFF
            c2 = (prod >> 16) & 0xFF
            c3 = prod >> 24
            chunks = jnp.concatenate([c0, c1, c2, c3], axis=0)
            ch = chunks.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
            conv_full_j, _ = L._conv_mats_jmajor()
            mat = jnp.asarray(conv_full_j).T  # (34, 1024)
            t = jnp.matmul(mat, ch, preferred_element_type=jnp.float32)
            t = t.astype(jnp.int32).astype(jnp.uint32)  # (34, N)
            outs = []
            carry = jnp.zeros_like(t[0])
            for j in range(16):
                v = t[j] + carry
                outs.append(v & 0xFFFF)
                carry = v >> 16
            t_low = jnp.stack(outs, axis=0)
            lo = t_low & 0xFF
            hi = t_low >> 8
            a8 = jnp.stack([lo, hi], axis=1).reshape(32, -1)
            a8 = a8.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
            m = (
                jnp.matmul(
                    jnp.asarray(spec.toep_n8).T.astype(jnp.bfloat16),
                    a8,
                    preferred_element_type=jnp.float32,
                )
                .astype(jnp.int32)
                .astype(jnp.uint32)
            )
            for _ in range(3):
                m = (m & 0xFF) + jnp.concatenate([jnp.zeros_like(m[:1]), (m >> 8)[:-1]], axis=0)
            m8 = m.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
            mp8 = (
                jnp.matmul(
                    jnp.asarray(spec.toep_p8).T.astype(jnp.bfloat16),
                    m8,
                    preferred_element_type=jnp.float32,
                )
                .astype(jnp.int32)
                .astype(jnp.uint32)
            )
            mp16 = mp8[0::2] + (mp8[1::2] << 8)  # (33, N)
            width = 34
            tt = jnp.concatenate([t, jnp.zeros((width - t.shape[0], t.shape[1]), jnp.uint32)], 0)
            mm_ = jnp.concatenate(
                [mp16, jnp.zeros((width - mp16.shape[0], mp16.shape[1]), jnp.uint32)], 0
            )
            s = tt + mm_
            outs = []
            carry = jnp.zeros_like(s[0])
            for j in range(width):
                v = s[j] + carry
                outs.append(v & 0xFFFF)
                carry = v >> 16
            s = jnp.stack(outs, axis=0)
            r17 = s[16:33]
            p17 = jnp.asarray(spec.p17.astype(np.int32))

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
            r = cond_sub(jnp.concatenate([r, jnp.zeros_like(r[:1])], 0))[:16]
            return r

        # correctness first
        ref = np.asarray(jax.jit(lambda a, b: L.mont_mul(SPEC, a, b))(a, b))
        got = np.asarray(jax.jit(lambda at, bt: mont_mul_t(SPEC, at, bt))(at, bt)).T
        assert (got == ref).all(), "transposed mont_mul mismatch"

        def chain_t(at, bt):
            def body(x, _):
                return mont_mul_t(SPEC, x, bt), None

            out, _ = jax.lax.scan(body, at, None, length=REPS)
            return out

        timed(f"mont_mul_T (16,{N}) x{REPS}", jax.jit(chain_t), at, bt, work_items=N * REPS)

    if "add" in which:

        def chain_add(a, b):
            def body(x, _):
                return L.add(SPEC, x, b), None

            out, _ = jax.lax.scan(body, a, None, length=REPS)
            return out

        timed(f"field_add ({N},16) x{REPS}", jax.jit(chain_add), a, b, work_items=N * REPS)

    if "padd" in which:
        one = jnp.asarray(SPEC.one_mont)
        acc = JacobianPoint(a, b, jnp.broadcast_to(one, (N, 16)))
        qinf = jnp.zeros(N, dtype=bool)

        def chain_padd(px, py, qinf):
            def body(p, _):
                out, _flag = point_add_mixed_incomplete(SPEC, p, px, py, qinf)
                return out, None

            out, _ = jax.lax.scan(body, acc, None, length=REPS)
            return out

        timed(
            f"mixed_add_inc ({N}) x{REPS}",
            jax.jit(chain_padd),
            a,
            b,
            qinf,
            work_items=N * REPS,
        )

        def chain_full(px, py, qinf):
            q = JacobianPoint(px, py, jnp.broadcast_to(one, (N, 16)))

            def body(p, _):
                return point_add(SPEC, p, q), None

            out, _ = jax.lax.scan(body, acc, None, length=REPS)
            return out

        timed(
            f"full_add ({N}) x{REPS}",
            jax.jit(chain_full),
            a,
            b,
            qinf,
            work_items=N * REPS,
        )


if __name__ == "__main__":
    main()
