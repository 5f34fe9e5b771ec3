"""Transposed (16, N) limb-major field/curve layer (fields/limb_t.py,
curves/limb_t.py) vs the host-exact reference — bit-exact across add, sub,
neg, Montgomery mul, and the Jacobian point formulas."""

import random

import numpy as np

from battlezips_halo2_tpu.curves import VESTA
from battlezips_halo2_tpu.curves import limb_t as CT
from battlezips_halo2_tpu.curves.limb import affine_to_jacobian_host, jacobian_to_affine_host
from battlezips_halo2_tpu.fields import ints_to_limbs
from battlezips_halo2_tpu.fields import limb as L
from battlezips_halo2_tpu.fields import limb_t as T
from battlezips_halo2_tpu.fields.limb import FieldSpec

SPEC = FieldSpec.make(VESTA.base.modulus)
P = VESTA.base.modulus
CST = T.consts_t(SPEC)


def _to_t(xs):
    """ints -> (16, N) Montgomery transposed layout."""
    rows = L.to_mont(SPEC, ints_to_limbs(xs))  # (N, 16)
    return np.asarray(rows).T.copy()


def _from_t(a):
    """(16, N) Montgomery transposed -> ints."""
    rows = L.from_mont(SPEC, np.asarray(a).T.copy())
    return L.limbs_to_ints(np.asarray(rows))


class TestFieldT:
    def _vals(self, seed, n=64):
        rng = random.Random(seed)
        edge = [0, 1, P - 1, P - 2, 1 << 255 % P]
        return (edge + [rng.randrange(P) for _ in range(n)])[:n]

    def test_add_sub_neg(self):
        xs, ys = self._vals(0), self._vals(1)
        a, b = _to_t(xs), _to_t(ys)
        assert _from_t(T.add(CST, a, b)) == [(x + y) % P for x, y in zip(xs, ys)]
        assert _from_t(T.sub(CST, a, b)) == [(x - y) % P for x, y in zip(xs, ys)]
        assert _from_t(T.neg(CST, a)) == [(-x) % P for x in xs]

    def test_mont_mul(self):
        xs, ys = self._vals(2), self._vals(3)
        a, b = _to_t(xs), _to_t(ys)
        assert _from_t(T.mont_mul(CST, a, b)) == [x * y % P for x, y in zip(xs, ys)]

    def test_mont_mul_matches_row_layout(self):
        rng = random.Random(4)
        xs = [rng.randrange(P) for _ in range(128)]
        ys = [rng.randrange(P) for _ in range(128)]
        a_rows = L.to_mont(SPEC, ints_to_limbs(xs))
        b_rows = L.to_mont(SPEC, ints_to_limbs(ys))
        exp = np.asarray(L.mont_mul(SPEC, a_rows, b_rows))
        got = np.asarray(T.mont_mul(CST, np.asarray(a_rows).T.copy(), np.asarray(b_rows).T.copy()))
        assert (got.T == exp).all()


class TestCurveT:
    def _points(self, seed, n=16):
        rng = random.Random(seed)
        return [VESTA.mul(VESTA.generator, rng.randrange(1, 10**12)) for _ in range(n)]

    def _jac_t(self, pts):
        jac = affine_to_jacobian_host(SPEC, pts)
        return CT.JacobianPointT(
            np.asarray(jac.x).T.copy(), np.asarray(jac.y).T.copy(), np.asarray(jac.z).T.copy()
        )

    def _to_affine(self, p: CT.JacobianPointT):
        from battlezips_halo2_tpu.curves.limb import JacobianPoint

        rows = JacobianPoint(
            np.asarray(p.x).T.copy(), np.asarray(p.y).T.copy(), np.asarray(p.z).T.copy()
        )
        return jacobian_to_affine_host(SPEC, rows)

    def test_point_double(self):
        pts = self._points(0)
        got = self._to_affine(CT.point_double(CST, self._jac_t(pts)))
        assert got == [VESTA.add(p, p) for p in pts]

    def test_point_add(self):
        ps, qs = self._points(1), self._points(2)
        got = self._to_affine(CT.point_add(CST, self._jac_t(ps), self._jac_t(qs)))
        assert got == [VESTA.add(p, q) for p, q in zip(ps, qs)]

    def test_point_add_branches(self):
        # P + P (doubling branch), P + inf, inf + Q, P + (-P)
        p = VESTA.mul(VESTA.generator, 7)
        q = VESTA.mul(VESTA.generator, 11)
        neg_p = (p[0], (-p[1]) % P)
        cases_p = [p, p, None, p]
        cases_q = [p, None, q, neg_p]
        jp, jq = self._jac_t(cases_p), self._jac_t(cases_q)
        got = self._to_affine(CT.point_add(CST, jp, jq))
        want = [VESTA.add(a, b) for a, b in zip(cases_p, cases_q)]
        assert got == want

    def test_mixed_incomplete(self):
        import jax.numpy as jnp

        ps, qs = self._points(3), self._points(4)
        jp = self._jac_t(ps)
        jq = affine_to_jacobian_host(SPEC, qs)
        qx, qy = np.asarray(jq.x).T.copy(), np.asarray(jq.y).T.copy()
        qinf = jnp.zeros((1, len(qs)), bool)
        out, needs_double = CT.point_add_mixed_incomplete(CST, jp, qx, qy, qinf)
        assert not np.asarray(needs_double).any()
        assert self._to_affine(out) == [VESTA.add(p, q) for p, q in zip(ps, qs)]


class TestMontMulI32:
    """Parity of the int32-schoolbook variant vs the f32/MXU path (ADVICE
    round 1): bit-exact over random and edge inputs, for both Pasta fields."""

    def _check(self, modulus, seed):
        from battlezips_halo2_tpu.fields.limb import FieldSpec

        spec = FieldSpec.make(modulus)
        cst = T.consts_t(spec)
        rng = random.Random(seed)
        xs = [0, 1, modulus - 1, modulus - 2] + [rng.randrange(modulus) for _ in range(60)]
        ys = [modulus - 1, 0, modulus - 1, 1] + [rng.randrange(modulus) for _ in range(60)]
        rows_a = L.to_mont(spec, ints_to_limbs(xs))
        rows_b = L.to_mont(spec, ints_to_limbs(ys))
        a = np.asarray(rows_a).T.copy()
        b = np.asarray(rows_b).T.copy()
        got_i32 = np.asarray(T.mont_mul_i32(cst, a, b))
        got_f32 = np.asarray(T.mont_mul(cst, a, b))
        assert (got_i32 == got_f32).all()
        # and against exact integer math (inputs/outputs are Montgomery form)
        exp = [x * y % modulus for x, y in zip(xs, ys)]
        got_ints = L.limbs_to_ints(np.asarray(L.from_mont(spec, got_i32.T.copy())))
        assert got_ints == exp

    def test_fp(self):
        from battlezips_halo2_tpu.fields import FP

        self._check(FP.modulus, 11)

    def test_fq(self):
        from battlezips_halo2_tpu.fields import FQ

        self._check(FQ.modulus, 12)
