"""Device kernel tests: NTT bit-exactness vs host, MSM vs host reference."""

import random

import numpy as np
import pytest

from battlezips_halo2_tpu.curves import VESTA
from battlezips_halo2_tpu.curves.limb import (
    affine_to_jacobian_host,
    jacobian_to_affine_host,
    point_add,
    point_double,
)
from battlezips_halo2_tpu.fields import FP, FP_SPEC, ints_to_limbs, limbs_to_ints
from battlezips_halo2_tpu.fields import limb as L
from battlezips_halo2_tpu.fields.limb import FieldSpec
from battlezips_halo2_tpu.ops import ntt as D
from battlezips_halo2_tpu.ops.msm import msm, scalars_to_digits
from battlezips_halo2_tpu.poly.domain import EvaluationDomain, ntt_host


class TestNtt:
    def test_device_ntt_bit_exact(self):
        dom = EvaluationDomain(8, 9)
        rng = random.Random(0)
        vals = [rng.randrange(FP.modulus) for _ in range(dom.n)]
        plan = D.plan_for(FP.modulus, dom.n, dom.omega)
        a = L.to_mont(FP_SPEC, ints_to_limbs(vals))
        got = limbs_to_ints(np.asarray(L.from_mont(FP_SPEC, D.ntt(plan, a))))
        assert got == ntt_host(vals, dom.omega)

    def test_intt_roundtrip(self):
        dom = EvaluationDomain(7, 9)
        rng = random.Random(1)
        vals = [rng.randrange(FP.modulus) for _ in range(dom.n)]
        plan = D.plan_for(FP.modulus, dom.n, dom.omega)
        plan_inv = D.plan_for(FP.modulus, dom.n, dom.omega_inv)
        n_inv = L.int_to_limbs(FP.inv(dom.n) * FP_SPEC.r_mod_p % FP.modulus)
        a = L.to_mont(FP_SPEC, ints_to_limbs(vals))
        back = L.from_mont(FP_SPEC, D.intt(plan_inv, D.ntt(plan, a), n_inv))
        assert limbs_to_ints(np.asarray(back)) == vals

    def test_batched_ntt(self):
        dom = EvaluationDomain(5, 9)
        rng = random.Random(2)
        batch = [[rng.randrange(FP.modulus) for _ in range(dom.n)] for _ in range(3)]
        plan = D.plan_for(FP.modulus, dom.n, dom.omega)
        a = L.to_mont(FP_SPEC, np.stack([ints_to_limbs(b) for b in batch]))
        out = np.asarray(L.from_mont(FP_SPEC, D.ntt(plan, a)))
        for i, b in enumerate(batch):
            assert limbs_to_ints(out[i]) == ntt_host(b, dom.omega)


class TestJacobian:
    def test_add_double_identity(self):
        spec = FieldSpec.make(VESTA.base.modulus)
        rng = random.Random(1)
        pts = [VESTA.mul(VESTA.generator, rng.randrange(1, 10**9)) for _ in range(4)]
        jac = affine_to_jacobian_host(spec, pts)
        assert jacobian_to_affine_host(spec, point_add(spec, jac, jac)) == [VESTA.double(p) for p in pts]
        assert jacobian_to_affine_host(spec, point_double(spec, jac)) == [VESTA.double(p) for p in pts]
        mixed = affine_to_jacobian_host(spec, [pts[0], None, pts[2], VESTA.neg(pts[3])])
        got = jacobian_to_affine_host(spec, point_add(spec, jac, mixed))
        assert got == [VESTA.double(pts[0]), pts[1], VESTA.double(pts[2]), None]


class TestMsm:
    def test_digits(self):
        d = scalars_to_digits([0x1FF, 1], c=8)
        assert d[0, 0] == 0xFF and d[1, 0] == 1 and d[0, 1] == 1

    def test_msm_vs_host(self):
        rng = random.Random(7)
        n = 32
        pts = [VESTA.mul(VESTA.generator, rng.randrange(1, 10**12)) for _ in range(n)]
        scalars = [rng.randrange(VESTA.scalar.modulus) for _ in range(n)]
        scalars[0] = 0
        pts[1] = None
        assert msm(VESTA, pts, scalars) == VESTA.msm(pts, scalars)
