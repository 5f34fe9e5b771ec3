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
