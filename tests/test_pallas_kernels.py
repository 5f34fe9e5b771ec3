"""Pallas kernel equivalence vs the jnp reference (interpreter mode on CPU;
the same kernels are validated on real TPU by the bench/verify drives)."""

import random

import numpy as np
import pytest

from battlezips_halo2_tpu.curves import VESTA
from battlezips_halo2_tpu.curves.limb import (
    affine_to_jacobian_host,
    jacobian_to_affine_host,
    point_add,
)
from battlezips_halo2_tpu.fields import FP, FP_SPEC, ints_to_limbs
from battlezips_halo2_tpu.fields import limb as L
from battlezips_halo2_tpu.fields.limb import FieldSpec
from battlezips_halo2_tpu.ops import pallas_kernels as PK


def test_vpu_mul_path_matches_mxu_path():
    rng = random.Random(0)
    xs = [rng.randrange(FP.modulus) for _ in range(32)]
    ys = [rng.randrange(FP.modulus) for _ in range(32)]
    a = L.to_mont(FP_SPEC, ints_to_limbs(xs))
    b = L.to_mont(FP_SPEC, ints_to_limbs(ys))
    cst_kernel = L.spec_consts(FP_SPEC)._replace(in_kernel=True)
    got = np.asarray(L.mont_mul(FP_SPEC, a, b, cst_kernel))
    exp = np.asarray(L.mont_mul(FP_SPEC, a, b))
    assert (got == exp).all()


def test_pallas_mont_mul_interpret():
    rng = random.Random(1)
    xs = [rng.randrange(FP.modulus) for _ in range(64)]
    ys = [rng.randrange(FP.modulus) for _ in range(64)]
    a = L.to_mont(FP_SPEC, ints_to_limbs(xs))
    b = L.to_mont(FP_SPEC, ints_to_limbs(ys))
    got = np.asarray(PK.mont_mul_rows(FP_SPEC, a, b, interpret=True))
    exp = np.asarray(L.mont_mul(FP_SPEC, a, b))
    assert (got == exp).all()


def test_pallas_butterfly_interpret():
    rng = random.Random(2)
    n2 = 64
    u = L.to_mont(FP_SPEC, ints_to_limbs([rng.randrange(FP.modulus) for _ in range(n2)])).reshape(1, n2, 16)
    v = L.to_mont(FP_SPEC, ints_to_limbs([rng.randrange(FP.modulus) for _ in range(n2)])).reshape(1, n2, 16)
    tw = L.to_mont(FP_SPEC, ints_to_limbs([rng.randrange(FP.modulus) for _ in range(n2)]))
    o0, o1 = PK.butterfly_stage(FP_SPEC, u, v, tw, interpret=True)
    vt = L.mont_mul(FP_SPEC, v, tw[None])
    assert (np.asarray(o0) == np.asarray(L.add(FP_SPEC, u, vt))).all()
    assert (np.asarray(o1) == np.asarray(L.sub(FP_SPEC, u, vt))).all()


def test_pallas_point_add_interpret():
    rng = random.Random(3)
    spec = FieldSpec.make(VESTA.base.modulus)
    pts = [VESTA.mul(VESTA.generator, rng.randrange(1, 10**9)) for _ in range(8)]
    jac = affine_to_jacobian_host(spec, pts)
    jac2 = affine_to_jacobian_host(spec, [None] + pts[1:][::-1])
    got = jacobian_to_affine_host(spec, PK.point_add_rows(spec, jac, jac2, interpret=True))
    exp = jacobian_to_affine_host(spec, point_add(spec, jac, jac2))
    assert got == exp


def test_pallas_msm_step_T_interpret():
    """Fused transposed MSM step (incomplete mixed add + head select) vs the
    jnp row-layout formulation, bit-exact, incl. needs_double flags."""
    import jax.numpy as jnp

    from battlezips_halo2_tpu.curves.limb import (
        JacobianPoint,
        point_add_mixed_incomplete,
        select_point,
    )
    from battlezips_halo2_tpu.curves.limb_t import JacobianPointT

    spec = FieldSpec.make(VESTA.base.modulus)
    rng = random.Random(5)
    n = 256
    pts = [VESTA.mul(VESTA.generator, rng.randrange(1, VESTA.scalar.modulus)) for _ in range(n)]
    pts[3] = None  # infinity lane
    jac = affine_to_jacobian_host(spec, pts)
    pinf = jnp.asarray(np.array([p is None for p in pts]))
    # accumulator: shifted copies (incl. a doubling collision at lane 7)
    acc_pts = pts[1:] + [pts[0]]
    acc_pts[7] = pts[7]
    acc = affine_to_jacobian_host(spec, acc_pts)
    head = jnp.asarray(np.array([i % 5 == 0 for i in range(n)]))

    one = jnp.asarray(spec.one_mont)
    merged, nd_ref = point_add_mixed_incomplete(spec, acc, jac.x, jac.y, pinf)
    pz = jnp.where(pinf[:, None], jnp.zeros((1, 16), jnp.uint32), one[None, :])
    ref = select_point(head, JacobianPoint(jac.x, jac.y, pz), merged)

    accT = JacobianPointT(acc.x.T, acc.y.T, acc.z.T)
    got, nd = PK.msm_step_T(spec, accT, jac.x.T, jac.y.T, pinf, head, interpret=True)
    for a, b in zip(ref, got):
        assert (np.asarray(a) == np.asarray(b).T).all()
    assert (np.asarray(nd) == np.asarray(nd_ref)).all()
    assert bool(np.asarray(nd)[7])  # the planted P == Q collision is flagged


def test_pallas_point_add_T_interpret():
    """Fused transposed complete Jacobian add vs host affine math, covering
    identity, doubling and inverse lanes."""
    from battlezips_halo2_tpu.curves.limb import jacobian_to_affine_host
    from battlezips_halo2_tpu.curves.limb_t import JacobianPointT

    spec = FieldSpec.make(VESTA.base.modulus)
    rng = random.Random(6)
    n = 128
    ps = [VESTA.mul(VESTA.generator, rng.randrange(1, VESTA.scalar.modulus)) for _ in range(n)]
    qs = [VESTA.mul(VESTA.generator, rng.randrange(1, VESTA.scalar.modulus)) for _ in range(n)]
    ps[0] = None  # identity + Q
    qs[1] = None  # P + identity
    qs[2] = ps[2]  # doubling
    qs[3] = (ps[3][0], (-ps[3][1]) % VESTA.base.modulus)  # inverse -> identity
    pj = affine_to_jacobian_host(spec, ps)
    qj = affine_to_jacobian_host(spec, qs)
    got = PK.point_add_T(
        spec,
        JacobianPointT(pj.x.T, pj.y.T, pj.z.T),
        JacobianPointT(qj.x.T, qj.y.T, qj.z.T),
        interpret=True,
    )
    from battlezips_halo2_tpu.curves.limb import JacobianPoint

    got_row = JacobianPoint(
        np.asarray(got.x).T.copy(), np.asarray(got.y).T.copy(), np.asarray(got.z).T.copy()
    )
    exp = [VESTA.add(p, q) for p, q in zip(ps, qs)]
    assert jacobian_to_affine_host(spec, got_row) == exp


def test_pallas_ntt_T_interpret():
    """Transposed fused NTT (per-stage butterfly kernels, no gathers) vs the
    host NTT, bit-exact, incl. a batched input."""
    from battlezips_halo2_tpu.ops import ntt as D
    from battlezips_halo2_tpu.poly.domain import EvaluationDomain, ntt_host

    n = 512
    k = 9
    dom = EvaluationDomain(k, 2)
    plan = D.plan_for(FP.modulus, n, dom.omega)
    rng = random.Random(9)
    rows = [[rng.randrange(FP.modulus) for _ in range(n)] for _ in range(2)]
    import jax.numpy as jnp

    a = jnp.stack([L.to_mont(FP_SPEC, ints_to_limbs(r)) for r in rows])
    out = D._ntt_T(plan, a, interpret=True)
    got = [
        L.limbs_to_ints(np.asarray(L.from_mont(FP_SPEC, np.asarray(out[i])))) for i in range(2)
    ]
    assert got == [ntt_host(r, dom.omega) for r in rows]
