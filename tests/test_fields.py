"""Field arithmetic: host-exact layer self-tests + device limb kernels vs host.

Edge cases mirror the reference's bitify test vectors (max field element,
p-1, zero — src/chips/bitify.rs:423-492).
"""

import random

import jax
import numpy as np
import pytest

from battlezips_halo2_tpu.fields import (
    FP,
    FQ,
    FP_SPEC,
    FQ_SPEC,
    ints_to_limbs,
    limbs_to_int,
    limbs_to_ints,
)
from battlezips_halo2_tpu.fields import limb as L


def sample_pairs(field, n=32, seed=0):
    rng = random.Random(seed)
    xs = [rng.randrange(field.modulus) for _ in range(n)]
    ys = [rng.randrange(field.modulus) for _ in range(n)]
    xs[:4] = [0, 1, field.modulus - 1, 2]
    ys[:4] = [0, field.modulus - 1, field.modulus - 1, (field.modulus + 1) // 2]
    return xs, ys


# ---------------------------------------------------------------- host layer
class TestHostField:
    @pytest.mark.parametrize("field", [FP, FQ], ids=["Fp", "Fq"])
    def test_basic_ops(self, field):
        xs, ys = sample_pairs(field)
        for x, y in zip(xs, ys):
            assert field.add(x, y) == (x + y) % field.modulus
            assert field.mul(x, y) == x * y % field.modulus
            if x:
                assert field.mul(x, field.inv(x)) == 1

    @pytest.mark.parametrize("field", [FP, FQ], ids=["Fp", "Fq"])
    def test_root_of_unity(self, field):
        w = field.root_of_unity
        assert field.pow(w, 1 << 32) == 1
        assert field.pow(w, 1 << 31) == field.modulus - 1  # primitive

    @pytest.mark.parametrize("field", [FP, FQ], ids=["Fp", "Fq"])
    def test_sqrt(self, field):
        rng = random.Random(7)
        for _ in range(10):
            x = rng.randrange(field.modulus)
            r = field.sqrt(field.mul(x, x))
            assert r is not None and field.mul(r, r) == field.mul(x, x)
        # known non-residue: generator^odd has Legendre -1 iff generator is
        # a non-residue; 5 is a non-residue in both Pasta fields
        assert not field.is_square(field.generator)
        assert field.sqrt(field.generator) is None

    @pytest.mark.parametrize("field", [FP, FQ], ids=["Fp", "Fq"])
    def test_repr_roundtrip(self, field):
        for v in [0, 1, field.modulus - 1, 12345678901234567890]:
            assert field.from_repr(field.to_repr(v)) == v
        with pytest.raises(ValueError):
            field.from_repr(field.modulus.to_bytes(32, "little"))

    def test_batch_inv(self):
        xs, _ = sample_pairs(FP)
        xs = [x for x in xs if x]
        out = FP.batch_inv(xs)
        for x, ix in zip(xs, out):
            assert FP.mul(x, ix) == 1


# -------------------------------------------------------------- device layer
@pytest.mark.parametrize("spec,field", [(FP_SPEC, FP), (FQ_SPEC, FQ)], ids=["Fp", "Fq"])
class TestLimbField:
    def test_limb_roundtrip(self, spec, field):
        xs, _ = sample_pairs(field)
        assert limbs_to_ints(ints_to_limbs(xs)) == xs

    def test_add_sub(self, spec, field):
        xs, ys = sample_pairs(field)
        a, b = ints_to_limbs(xs), ints_to_limbs(ys)
        assert limbs_to_ints(np.asarray(L.add(spec, a, b))) == [
            (x + y) % field.modulus for x, y in zip(xs, ys)
        ]
        assert limbs_to_ints(np.asarray(L.sub(spec, a, b))) == [
            (x - y) % field.modulus for x, y in zip(xs, ys)
        ]
        assert limbs_to_ints(np.asarray(L.neg(spec, a))) == [(-x) % field.modulus for x in xs]

    def test_mont_mul(self, spec, field):
        xs, ys = sample_pairs(field)
        a, b = ints_to_limbs(xs), ints_to_limbs(ys)
        am, bm = L.to_mont(spec, a), L.to_mont(spec, b)
        got = limbs_to_ints(np.asarray(L.from_mont(spec, L.mont_mul(spec, am, bm))))
        assert got == [x * y % field.modulus for x, y in zip(xs, ys)]

    def test_mont_roundtrip(self, spec, field):
        xs, _ = sample_pairs(field)
        a = ints_to_limbs(xs)
        assert limbs_to_ints(np.asarray(L.from_mont(spec, L.to_mont(spec, a)))) == xs

    def test_jit_stability(self, spec, field):
        f = jax.jit(lambda a, b: L.mont_mul(spec, a, b))
        xs, ys = sample_pairs(field, n=8)
        a, b = ints_to_limbs(xs), ints_to_limbs(ys)
        am, bm = L.to_mont(spec, a), L.to_mont(spec, b)
        r1 = np.asarray(f(am, bm))
        r2 = np.asarray(f(am, bm))
        assert (r1 == r2).all()


def test_mont_inv_small_batch():
    xs = [2, 3, 5, FP.modulus - 17]
    a = L.to_mont(FP_SPEC, ints_to_limbs(xs))
    got = limbs_to_ints(np.asarray(L.from_mont(FP_SPEC, L.mont_inv(FP_SPEC, a))))
    assert got == [pow(x, -1, FP.modulus) for x in xs]
