"""ECC gadget + Pedersen chip tests: window-table parity with the reference's
published Z/U tables, fixed-base mul correctness, complete addition edge
cases, and the full in-circuit Pedersen commitment vs the off-circuit value."""

import random

import pytest

from battlezips_halo2_tpu.curves import PALLAS
from battlezips_halo2_tpu.dev import MockProver
from battlezips_halo2_tpu.fields import FP, FQ
from battlezips_halo2_tpu.gadgets import (
    PedersenCommitmentChip,
    board_commit_r,
    board_commit_v,
    decompose_scalar,
)
from battlezips_halo2_tpu.gadgets.fixed_bases import FixedBase, find_z, mul_windows, window_points
from battlezips_halo2_tpu.plonk import Circuit, ConstraintSystem
from battlezips_halo2_tpu.utils.constants import (
    BOARD_COMMIT_V_GENERATOR,
    NUM_WINDOWS,
    reference_tables,
)
from battlezips_halo2_tpu.utils.pedersen import pedersen_commit


class TestWindowTables:
    def test_z_u_parity_with_reference(self):
        """The PRODUCTION tables (board_commit_v/_r, built with zero
        reference-derived inputs: from-scratch z-search + Tonelli-Shanks u)
        reproduce the reference's Z and U data byte-for-byte across ALL 85
        windows of BOTH generators (board_commit_{v,r}.rs:17,28). The
        extracted JSON is consumed here only, as the parity oracle."""
        from battlezips_halo2_tpu.gadgets.fixed_bases import board_commit_r

        for name, table in (("board_commit_v", board_commit_v()), ("board_commit_r", board_commit_r())):
            ref = reference_tables()[name]
            assert [wt.z for wt in table.windows] == ref["z"], name
            for w, wt in enumerate(table.windows):
                for j in range(8):
                    assert FP.to_repr(wt.us[j]) == bytes.fromhex(ref["u"][w][j]), (name, w, j)

    @pytest.mark.parametrize("w", [0, 84])
    def test_z_derivation_from_scratch(self, w):
        """The z-search criterion reproduces the reference's z values."""
        ref = reference_tables()["board_commit_v"]
        pts = window_points(PALLAS, BOARD_COMMIT_V_GENERATOR, w)
        assert find_z([p[1] for p in pts]) == ref["z"][w]

    def test_window_mul_identity(self):
        """Sum over window points == [k]B for random k (host check of the
        in-circuit algorithm)."""
        table = board_commit_v()
        rng = random.Random(3)
        for _ in range(3):
            k = rng.randrange(FQ.modulus)
            windows = decompose_scalar(k)
            assert mul_windows(PALLAS, table, windows) == PALLAS.mul(table.generator, k)

    def test_lagrange_coeffs_interpolate_x(self):
        from battlezips_halo2_tpu.poly.lagrange import eval_poly

        wt = board_commit_r().windows[7]
        for j in range(8):
            assert eval_poly(list(wt.lagrange_coeffs), j) == wt.points[j][0]


class PedersenCircuit(Circuit):
    """Harness: assign the message, commit in-circuit, expose (x, y) as
    public instance."""

    def __init__(self, message: int, trapdoor: int):
        self.message = message
        self.trapdoor = trapdoor

    @classmethod
    def configure(cls, cs: ConstraintSystem):
        advice = [cs.advice_column() for _ in range(10)]
        lagrange = [cs.fixed_column() for _ in range(8)]
        fixed_z = cs.fixed_column()
        constants = cs.fixed_column()
        table = cs.lookup_table_column()
        instance = cs.instance_column()
        for col in advice:
            cs.enable_equality(col)
        cs.enable_equality(instance)
        cs.enable_constant(constants)
        chip_cfg = PedersenCommitmentChip.configure(cs, advice, lagrange, fixed_z, table)
        return chip_cfg, advice[0], instance

    def synthesize(self, config, layouter):
        chip_cfg, load_col, instance = config
        message = layouter.assign_region(
            "load message", lambda r: r.assign_advice("m", load_col, 0, self.message)
        )
        chip = PedersenCommitmentChip(chip_cfg)
        x, y = chip.synthesize(layouter, message, self.trapdoor)
        layouter.constrain_instance(x, instance, 0)
        layouter.constrain_instance(y, instance, 1)

    def without_witnesses(self):
        # nonzero dummies: the incomplete-addition chain cannot represent
        # the identity that a zero scalar would produce
        return PedersenCircuit(1, 1)


K = 12


class TestPedersenChip:
    def test_valid_commitment(self):
        message = (1 << 99) | 0b1011  # a 100-bit board-state-like message
        trapdoor = 0x1234567890ABCDEF1234567890ABCDEF
        commitment = pedersen_commit(message, trapdoor)
        prover = MockProver.run(K, PedersenCircuit(message, trapdoor), [[commitment[0], commitment[1]]])
        assert prover.verify() == []

    def test_zero_message_unsupported(self):
        """Zero scalars hit the identity in the incomplete-addition chain —
        the same limitation as halo2_gadgets' fixed-base mul (an empty board
        is never committed in a real game)."""
        commitment = pedersen_commit(1, 7)  # placeholder instance
        with pytest.raises(ValueError, match="identity"):
            MockProver.run(K, PedersenCircuit(0, 7), [[commitment[0], commitment[1]]])

    def test_wrong_commitment_fails(self):
        message, trapdoor = 12345, 999
        commitment = pedersen_commit(message, trapdoor)
        bad = [FP.add(commitment[0], 1), commitment[1]]
        prover = MockProver.run(K, PedersenCircuit(message, trapdoor), [bad])
        failures = prover.verify()
        assert failures  # instance equality breaks

    def test_overwide_message_fails_range_check(self):
        """A message over 100 bits trips the lookup range check."""
        message = 1 << 101
        trapdoor = 3
        commitment = pedersen_commit(message, trapdoor)
        prover = MockProver.run(K, PedersenCircuit(message, trapdoor), [[commitment[0], commitment[1]]])
        failures = prover.verify()
        assert failures
