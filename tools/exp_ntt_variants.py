#!/usr/bin/env python
"""Honest on-chip NTT variant timing (VERDICT r2 #9).

Methodology (BENCH_NOTES.md): the axon relay memoizes on input VALUES and
ignores block_until_ready, so each variant derives fresh inputs IN-GRAPH
from a 4-byte seed, REPS reps are chained in one jitted program with a
mixing fold, and the result is forced with np.asarray. Times are
wall/REPS, best of 2 timed calls.

Variants:
  jnp   — ops/ntt.py butterfly path (gather + XLA-chunk Montgomery mul)
  mm    — ops/ntt_mm.py 4-step constant-matrix MXU matmul
  mmb   — mm with a batch of 8 polys of n/8 (the prover's batched shape)

Usage: python tools/exp_ntt_variants.py [logn ...] (default 16 20)
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

from battlezips_halo2_tpu.fields import limb as L
from battlezips_halo2_tpu.fields.host import FP
from battlezips_halo2_tpu.fields.limb import FP_SPEC
from battlezips_halo2_tpu.ops import ntt as D
from battlezips_halo2_tpu.ops import ntt_mm as MM
from battlezips_halo2_tpu.poly.domain import EvaluationDomain, ntt_host

REPS = int(os.environ.get("PROF_REPS", "3"))
P = FP.modulus


def fresh_input(seed, base_mont, rho_mont):
    """In-graph fresh Montgomery values: base * rho (defeats memoization)."""
    return L.mont_mul(FP_SPEC, base_mont, jnp.broadcast_to(rho_mont, base_mont.shape))


def timed(name, make_fn, n, batch_shape):
    import random

    rng = random.Random(7)
    flat = 1
    for d in batch_shape:
        flat *= d
    vals = [rng.randrange(P) for _ in range(flat * n)]
    base = np.asarray(L.to_mont(FP_SPEC, L.ints_to_limbs(vals))).reshape(*batch_shape, n, 16)
    rho_ints = [rng.randrange(1, P) for _ in range(8)]
    rhos = np.stack([L.int_to_limbs(v * FP_SPEC.r_mod_p % P) for v in rho_ints])

    fn = make_fn()

    def chained(base_mont, rho_stack):
        def body(carry, rho):
            x = fresh_input(None, base_mont, rho)
            out = fn(x)
            return carry + jnp.sum(out.astype(jnp.uint32)), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.uint32), rho_stack[:REPS])
        return acc

    g = jax.jit(chained)
    t0 = time.time()
    np.asarray(g(jnp.asarray(base), jnp.asarray(rhos)))
    compile_s = time.time() - t0
    best = None
    for s in (1, 2):
        rho2 = np.stack(
            [L.int_to_limbs((v + s) % P * FP_SPEC.r_mod_p % P) for v in rho_ints]
        )
        t0 = time.time()
        np.asarray(g(jnp.asarray(base), jnp.asarray(rho2)))
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    per = best / REPS
    print(
        f"{name:18s} n=2^{n.bit_length()-1:2d} batch={batch_shape}: {per*1000:9.1f} ms/ntt "
        f"({flat*n/per/1e6:7.2f} M elem/s)  compile+first {compile_s:.0f}s",
        flush=True,
    )


def correctness(n):
    import random

    rng = random.Random(3)
    dom = EvaluationDomain(n.bit_length() - 1, 2)
    vals = [rng.randrange(P) for _ in range(n)]
    a = L.to_mont(FP_SPEC, L.ints_to_limbs(vals))
    want = ntt_host(vals, dom.omega)
    mm_out = np.asarray(
        jax.jit(lambda x: MM.ntt_mm(MM.mm_plan_for(P, n, dom.omega), x))(a)
    )
    got = L.limbs_to_ints(np.asarray(L.from_mont(FP_SPEC, mm_out)))
    assert got == want, f"ntt_mm wrong at n={n}"
    print(f"correctness n={n}: mm bit-exact vs host", flush=True)


if __name__ == "__main__":
    logns = [int(x) for x in sys.argv[1:]] or [16, 20]
    for logn in logns:
        n = 1 << logn
        dom = EvaluationDomain(logn, 2)
        if n <= 1 << 12:
            correctness(n)
        timed(
            "butterfly-jnp",
            lambda: (lambda x: D.ntt(D.plan_for(P, n, dom.omega), x)),
            n,
            (),
        )
        timed(
            "matmul-4step",
            lambda: (lambda x: MM.ntt_mm(MM.mm_plan_for(P, n, dom.omega), x)),
            n,
            (),
        )
        # the prover's batched shape: 8 polys of n/8 (e.g. advice columns)
        nb = n // 8
        domb = EvaluationDomain(logn - 3, 2)
        timed(
            "matmul-batched8",
            lambda: (lambda x: MM.ntt_mm(MM.mm_plan_for(P, nb, domb.omega), x)),
            nb,
            (8,),
        )
