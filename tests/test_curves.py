"""Host curve layer: group law, encodings, Pedersen commitment oracle checks."""

import random

from battlezips_halo2_tpu.curves import PALLAS, VESTA
from battlezips_halo2_tpu.fields import FP, FQ
from battlezips_halo2_tpu.utils.constants import (
    BOARD_COMMIT_R_GENERATOR,
    BOARD_COMMIT_V_GENERATOR,
)
from battlezips_halo2_tpu.utils.pedersen import lift_to_scalar, pedersen_commit


class TestGroupLaw:
    def test_generator_order(self):
        for c in (PALLAS, VESTA):
            assert c.is_on_curve(c.generator)
            assert c.mul(c.generator, c.scalar.modulus) is None

    def test_add_commutes_and_associates(self):
        rng = random.Random(1)
        pts = [PALLAS.mul(PALLAS.generator, rng.randrange(1, 1 << 64)) for _ in range(3)]
        a, b, c = pts
        assert PALLAS.add(a, b) == PALLAS.add(b, a)
        assert PALLAS.add(PALLAS.add(a, b), c) == PALLAS.add(a, PALLAS.add(b, c))

    def test_double_vs_add(self):
        g = PALLAS.generator
        assert PALLAS.double(g) == PALLAS.add(g, g)
        assert PALLAS.mul(g, 2) == PALLAS.double(g)

    def test_identity_and_negation(self):
        g = VESTA.generator
        assert VESTA.add(g, None) == g
        assert VESTA.add(g, VESTA.neg(g)) is None

    def test_scalar_mul_linearity(self):
        g = PALLAS.generator
        a, b = 123456789, 987654321
        assert PALLAS.add(PALLAS.mul(g, a), PALLAS.mul(g, b)) == PALLAS.mul(g, a + b)

    def test_msm_matches_sum(self):
        rng = random.Random(2)
        pts = [VESTA.mul(VESTA.generator, rng.randrange(1, 1000)) for _ in range(5)]
        scalars = [rng.randrange(VESTA.scalar.modulus) for _ in range(5)]
        expected = None
        for p, s in zip(pts, scalars):
            expected = VESTA.add(expected, VESTA.mul(p, s))
        assert VESTA.msm(pts, scalars) == expected


class TestEncoding:
    def test_compressed_roundtrip(self):
        for c in (PALLAS, VESTA):
            for k in (1, 2, 12345):
                p = c.mul(c.generator, k)
                assert c.from_bytes(c.to_bytes(p)) == p
        assert PALLAS.from_bytes(b"\x00" * 32) is None
        assert PALLAS.to_bytes(None) == b"\x00" * 32


class TestPedersenOracle:
    """The generators come from the reference's fixed-base tables
    (board_commit_{v,r}.rs GENERATOR bytes) — on-curve and distinct."""

    def test_generators_valid(self):
        assert PALLAS.is_on_curve(BOARD_COMMIT_V_GENERATOR)
        assert PALLAS.is_on_curve(BOARD_COMMIT_R_GENERATOR)
        assert BOARD_COMMIT_V_GENERATOR != BOARD_COMMIT_R_GENERATOR

    def test_commitment_homomorphism(self):
        m1, m2 = 1234, 5678
        r1, r2 = 111, 222
        c1 = pedersen_commit(m1, r1)
        c2 = pedersen_commit(m2, r2)
        c12 = pedersen_commit(m1 + m2, r1 + r2)
        assert PALLAS.add(c1, c2) == c12

    def test_commitment_binding_to_message(self):
        assert pedersen_commit(1, 42) != pedersen_commit(2, 42)

    def test_lift_is_repr_reinterpretation(self):
        m = FP.modulus - 123
        assert FQ.to_repr(lift_to_scalar(m)) == FP.to_repr(m)
