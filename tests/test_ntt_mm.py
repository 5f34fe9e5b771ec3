"""Matmul (4-step MXU) NTT: bit-exactness vs the host-exact layer.

The reference's NTT is halo2's `best_fft` (SURVEY.md §2.2); ops/ntt_mm.py
re-formulates it as constant-matrix Fp multiplication for the MXU. These
tests pin (a) the exact-arithmetic core `fp_const_matmul` against integer
math, (b) the full 4-step transform against `ntt_host` across sizes and
batch shapes, (c) round-trip with the inverse transform."""

import random

import numpy as np
import pytest

import jax

from battlezips_halo2_tpu.fields import limb as L
from battlezips_halo2_tpu.fields.host import FP
from battlezips_halo2_tpu.fields.limb import FP_SPEC
from battlezips_halo2_tpu.ops.ntt_mm import fp_const_matmul, mm_plan_for, ntt_mm
from battlezips_halo2_tpu.poly.domain import EvaluationDomain, ntt_host

P = FP.modulus


def _rand_limbs(rng, *shape_ints):
    vals = [rng.randrange(P) for _ in range(int(np.prod(shape_ints)))]
    return vals, L.ints_to_limbs(vals).reshape(*shape_ints, 16)


def test_fp_const_matmul_exact():
    rng = random.Random(11)
    K, KP, M = 16, 12, 5
    W = np.array([[rng.randrange(P) for _ in range(K)] for _ in range(KP)], dtype=object)
    a_int = [[rng.randrange(P) for _ in range(M)] for _ in range(K)]
    a = np.stack([L.ints_to_limbs(row) for row in a_int])
    am = np.asarray(L.to_mont(FP_SPEC, a))
    out = np.asarray(jax.jit(lambda x: fp_const_matmul(FP_SPEC, W, x))(am))
    outp = np.asarray(L.from_mont(FP_SPEC, out))
    for j in range(KP):
        got = L.limbs_to_ints(outp[j])
        want = [sum(int(W[j, i]) * a_int[i][m] for i in range(K)) % P for m in range(M)]
        assert got == want


def test_fp_const_matmul_edge_values():
    """p-1 / 0 / 1 operands and worst-case all-(p-1) matrix: maximal chunk
    magnitudes exercise every carry bound in the pipeline."""
    K = 8
    W = np.full((K, K), P - 1, dtype=object)
    a_int = [[P - 1], [0], [1], [P - 2], [P - 1], [P - 1], [1], [0]]
    a = np.stack([L.ints_to_limbs(row) for row in a_int])
    am = np.asarray(L.to_mont(FP_SPEC, a))
    out = np.asarray(jax.jit(lambda x: fp_const_matmul(FP_SPEC, W, x))(am))
    outp = np.asarray(L.from_mont(FP_SPEC, out))
    want_row = sum((P - 1) * v[0] for v in a_int) % P
    for j in range(K):
        assert L.limbs_to_ints(outp[j]) == [want_row]


@pytest.mark.parametrize("logn", [6, 9, 11])
def test_ntt_mm_vs_host(logn):
    rng = random.Random(100 + logn)
    n = 1 << logn
    dom = EvaluationDomain(logn, 2)
    vals = [rng.randrange(P) for _ in range(n)]
    am = L.to_mont(FP_SPEC, L.ints_to_limbs(vals))
    plan = mm_plan_for(P, n, dom.omega)
    out = np.asarray(jax.jit(lambda x: ntt_mm(plan, x))(am))
    got = L.limbs_to_ints(np.asarray(L.from_mont(FP_SPEC, out)))
    assert got == ntt_host(vals, dom.omega)


def test_ntt_mm_batched_matches_single():
    rng = random.Random(5)
    logn, B = 8, 3
    n = 1 << logn
    dom = EvaluationDomain(logn, 2)
    vals = [[rng.randrange(P) for _ in range(n)] for _ in range(B)]
    am = np.stack([np.asarray(L.to_mont(FP_SPEC, L.ints_to_limbs(v))) for v in vals])
    plan = mm_plan_for(P, n, dom.omega)
    out = np.asarray(jax.jit(lambda x: ntt_mm(plan, x))(am))
    for bi in range(B):
        got = L.limbs_to_ints(np.asarray(L.from_mont(FP_SPEC, out[bi])))
        assert got == ntt_host(vals[bi], dom.omega)


def test_ntt_mm_inverse_round_trip():
    rng = random.Random(6)
    logn = 8
    n = 1 << logn
    dom = EvaluationDomain(logn, 2)
    vals = [rng.randrange(P) for _ in range(n)]
    am = L.to_mont(FP_SPEC, L.ints_to_limbs(vals))
    fwd = mm_plan_for(P, n, dom.omega)
    inv = mm_plan_for(P, n, pow(dom.omega, P - 2, P))
    n_inv_mont = L.int_to_limbs(pow(n, P - 2, P) * FP_SPEC.r_mod_p % P)

    def round_trip(x):
        y = ntt_mm(fwd, x)
        z = ntt_mm(inv, y)
        import jax.numpy as jnp

        return L.mont_mul(FP_SPEC, z, jnp.broadcast_to(jnp.asarray(n_inv_mont), z.shape))

    out = np.asarray(jax.jit(round_trip)(am))
    got = L.limbs_to_ints(np.asarray(L.from_mont(FP_SPEC, out)))
    assert got == vals


def test_ntt_mm_matches_butterfly_path():
    """Same input through ops/ntt.py's butterfly path and the matmul path."""
    from battlezips_halo2_tpu.ops import ntt as D

    rng = random.Random(7)
    logn = 9
    n = 1 << logn
    dom = EvaluationDomain(logn, 2)
    vals = [rng.randrange(P) for _ in range(n)]
    am = L.to_mont(FP_SPEC, L.ints_to_limbs(vals))
    bf = np.asarray(jax.jit(lambda x: D.ntt(D.plan_for(P, n, dom.omega), x))(am))
    mm = np.asarray(jax.jit(lambda x: ntt_mm(mm_plan_for(P, n, dom.omega), x))(am))
    assert bf.tolist() == mm.tolist()


def test_ntt_route_flag_matches(monkeypatch):
    """BZ_NTT_MM=on routes ops.ntt.ntt through the matmul path with
    identical results (the flip lever for tools/exp_ntt_variants.py)."""
    from battlezips_halo2_tpu.ops import ntt as D

    rng = random.Random(8)
    n = 256
    dom = EvaluationDomain(8, 2)
    vals = [rng.randrange(P) for _ in range(n)]
    am = L.to_mont(FP_SPEC, L.ints_to_limbs(vals))
    plan = D.plan_for(P, n, dom.omega)
    monkeypatch.setenv("BZ_NTT_MM", "off")
    bf = np.asarray(jax.jit(lambda x: D.ntt(plan, x))(am))
    monkeypatch.setenv("BZ_NTT_MM", "on")
    mm = np.asarray(jax.jit(lambda x: D.ntt(plan, x))(am))
    assert bf.tolist() == mm.tolist()
