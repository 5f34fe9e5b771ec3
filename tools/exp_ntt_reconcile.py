#!/usr/bin/env python
"""Reconcile the round-4 NTT measurement split (VERDICT r5 item #3).

Round 4 left two contradictory numbers for the same kernel family at
2^16: bench.py recorded 10.36 M elem/s (6.3 ms/NTT, K=24 chain) while
exp_ntt_variants recorded 1.65 M elem/s (39.7 ms/NTT, REPS=3 chain). The
single-variable hypothesis: a fixed per-DISPATCH relay cost C amortized
over K reps contaminates short chains — time/rep = t + C/K, so the two
harnesses disagree exactly when C >> t.

This experiment runs the SAME chained harness at K in {3, 8, 24} for both
the butterfly and the matmul 4-step variant and fits (t, C) from the K
sweep: t = (wall_K2*K2 - wall_K1*K1)/(K2 - K1) ... i.e. per-rep marginal
cost, C = K*(wall/K - t). One table, one conclusion.

Usage: python tools/exp_ntt_reconcile.py [--log-size 16] [--sizes 16,18,20]
"""

import argparse
import json
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

from battlezips_halo2_tpu.fields import FP, FP_SPEC, ints_to_limbs
from battlezips_halo2_tpu.fields import limb as L
from battlezips_halo2_tpu.ops import ntt as D
from battlezips_halo2_tpu.poly.domain import EvaluationDomain


def build_chain(n, dom, variant, K):
    if variant == "butterfly" and n >= (1 << 20):
        # baked twiddle tables exceed the relay's compile-payload limit
        # (HTTP 413) from 2^20 — use the argument-twiddle butterfly
        # (ops/ntt.ntt_arg_tw; bit-exact, tests/test_ops.py)
        aplan = D.arg_plan_for(FP.modulus, n, dom.omega)
        rev = jnp.asarray(aplan.rev_idx)
        tws = aplan.device_twiddles()

        @jax.jit
        def chained_args(base, rho_monts, rev_idx, tw_stages):
            def body(carry, rho):
                x = L.mont_mul(FP_SPEC, base, jnp.broadcast_to(rho, base.shape))
                out = D.ntt_arg_tw(FP_SPEC, aplan.logn, x, rev_idx, tw_stages)
                return carry + jnp.sum(out.astype(jnp.uint32)), None

            acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.uint32), rho_monts)
            return acc

        return lambda base, rm: chained_args(base, rm, rev, tws)
    # the variant is selected through the production router (BZ_NTT_MM env,
    # read at trace time) so the experiment times exactly what ntt() runs
    os.environ["BZ_NTT_MM"] = "off" if variant == "butterfly" else "on"
    plan = D.plan_for(FP.modulus, n, dom.omega)

    @jax.jit
    def chained(base, rho_monts):
        def body(carry, rho):
            x = L.mont_mul(FP_SPEC, base, jnp.broadcast_to(rho, base.shape))
            out = D.ntt(plan, x)
            return carry + jnp.sum(out.astype(jnp.uint32)), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.uint32), rho_monts)
        return acc

    return chained


def rho_stack(seed, K):
    r = random.Random(seed)
    rhos = [r.randrange(1, FP.modulus) for _ in range(K)]
    return jnp.asarray(
        np.stack([L.int_to_limbs(v * FP_SPEC.r_mod_p % FP.modulus) for v in rhos])
    )


def run_size(log_size, only=None):
    n = 1 << log_size
    dom = EvaluationDomain(log_size, 2)
    rng = random.Random(3)
    vals = [rng.randrange(FP.modulus) for _ in range(n)]
    base = jnp.asarray(L.to_mont(FP_SPEC, ints_to_limbs(vals)))

    variants = ["butterfly"]
    if (1 << 14) <= n <= (1 << 21):
        variants.append("matmul")
    if only:
        variants = [v for v in variants if v in only]
    rows = []
    # shorter chains at 2^20+: the chained variant pipeline's live buffers
    # exhausted HBM in the r4 harness (VERDICT r4 next #3)
    k_set = (3, 8, 24) if log_size < 20 else (1, 2, 4)
    for variant in variants:
        walls = {}
        for K in k_set:
            try:
                fn = build_chain(n, dom, variant, K)
                rm = rho_stack(1, K)
                t0 = time.time()
                np.asarray(fn(base, rm))
                first = time.time() - t0
                best = None
                for seed in (2, 3, 4):
                    rm2 = rho_stack(seed, K)
                    t0 = time.time()
                    np.asarray(fn(base, rm2))
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
            except Exception as e:  # RESOURCE_EXHAUSTED at this K: fit from the rest
                print(f"n=2^{log_size} {variant} K={K}: {type(e).__name__} (skipped)", flush=True)
                continue
            walls[K] = best
            print(
                f"n=2^{log_size} {variant:9s} K={K:2d}: wall {best:7.3f}s "
                f"({best/K*1000:8.2f} ms/rep; first {first:.1f}s)",
                flush=True,
            )
        if len(walls) < 2:
            print(f"n=2^{log_size} {variant}: <2 chain lengths ran; no fit", flush=True)
            continue
        ks = sorted(walls)
        k_lo, k_hi = ks[0], ks[-1]
        t = (walls[k_hi] - walls[k_lo]) / (k_hi - k_lo)
        C = walls[k_lo] - k_lo * t
        rows.append(
            {
                "n": f"2^{log_size}",
                "variant": variant,
                "walls": {str(k): round(v, 3) for k, v in walls.items()},
                "per_rep_ms": round(t * 1000, 2),
                "fixed_dispatch_s": round(C, 2),
                "eps_at_Kmax": round(n / (walls[k_hi] / k_hi), 1),
                "eps_marginal": round(n / t, 1) if t > 0 else None,
                "k_set_ran": ks,
            }
        )
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="16")
    ap.add_argument("--variants", default=None, help="comma list: butterfly,matmul")
    args = ap.parse_args()
    only = args.variants.split(",") if args.variants else None
    out = []
    for s in args.sizes.split(","):
        out.extend(run_size(int(s), only=only))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
