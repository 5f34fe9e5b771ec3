"""In-circuit Pedersen commitment chip.

Framework analog of the reference's PedersenCommitmentChip
(src/chips/pedersen.rs:49-134): loads the 2^10-row range-check table,
computes ``[m]BoardCommitV`` (base-field-element fixed-base mul, binding the
assigned message cell through a running-sum decomposition) plus
``[r]BoardCommitR`` (full-width scalar mul of the witnessed trapdoor), and
completes with a complete point addition. The board-state message is also
range-checked to 100 bits via the lookup argument (the application invariant
the reference enforces upstream through Bits2Num).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..plonk import AssignedCell, ConstraintSystem, Layouter, TableColumn
from ..plonk.expression import Column
from .ecc import EccChip, EccConfig
from .fixed_bases import board_commit_r, board_commit_v
from .range_check import LookupRangeCheck, LookupRangeCheckConfig


@dataclass(frozen=True)
class PedersenCommitmentConfig:
    ecc: EccConfig
    range_check: LookupRangeCheckConfig


class PedersenCommitmentChip:
    def __init__(self, config: PedersenCommitmentConfig):
        self.config = config

    @staticmethod
    def configure(
        cs: ConstraintSystem,
        advice: list[Column],
        lagrange: list[Column],
        fixed_z: Column,
        table: TableColumn,
    ) -> PedersenCommitmentConfig:
        assert len(advice) >= 10
        range_check = LookupRangeCheck.configure(cs, advice[9], table)
        ecc = EccChip.configure(cs, advice, lagrange, fixed_z)
        return PedersenCommitmentConfig(ecc, range_check)

    def synthesize(
        self,
        layouter: Layouter,
        message: AssignedCell,
        trapdoor: int,
    ) -> tuple[AssignedCell, AssignedCell]:
        """Commit to an assigned message cell with a witnessed Fq trapdoor;
        returns the assigned commitment coordinates (x, y)."""
        cfg = self.config
        rc = LookupRangeCheck(cfg.range_check)
        ecc = EccChip(cfg.ecc)

        rc.load_table(layouter)
        rc.copy_check(layouter, message, num_words=10, strict=True)
        # max_bits=102: combined with the 100-bit range check this pins the
        # window decomposition to the canonical K = message (no K+p alias)
        v = ecc.mul_base_field(layouter, board_commit_v(), message, max_bits=102)
        r = ecc.mul_full_width(layouter, board_commit_r(), trapdoor)
        return ecc.add_complete(layouter, v, r)


def pedersen_commitment(
    chip: PedersenCommitmentChip, layouter: Layouter, message: AssignedCell, trapdoor: int
):
    """Free-function mirror of the reference's ``pedersen_commitment`` helper
    (src/chips/pedersen.rs:104-134)."""
    return chip.synthesize(layouter, message, trapdoor)
