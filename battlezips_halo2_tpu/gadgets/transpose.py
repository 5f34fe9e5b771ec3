"""Transpose chip: merge 10 ship decompositions into one board bitfield.

Constraint semantics mirror the reference's TransposeChip
(src/chips/transpose.rs:46-147): 10 advice columns of permuted bits plus one
transposed column; vertical placements (odd column index) copy bit
``row % 10 * 10 + row / 10``. The single gate per row constrains

* transposed == sum of the 10 permuted bits, and
* transposed is boolean — booleanity of the sum IS the no-collision check.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..plonk import AssignedCell, ConstraintSystem, Layouter
from ..plonk.expression import Column, Selector
from ..utils.binary import BOARD_SIZE
from .common import with_selector


@dataclass(frozen=True)
class TransposeConfig:
    permuted_bits: tuple  # 10 advice columns
    transposed_bits: Column
    selector: Selector


class TransposeChip:
    def __init__(self, config: TransposeConfig):
        self.config = config

    @staticmethod
    def configure(cs: ConstraintSystem, permuted_bits, transposed_bits: Column) -> TransposeConfig:
        selector = cs.selector()
        # tree shape mirrors transpose.rs:57-63: the sum fold seeds at
        # Constant(0) and adds the ten permuted-bit queries in column order
        from ..plonk.expression import Constant

        acc = Constant(0)
        for col in permuted_bits:
            acc = acc + col.cur()
        cs.create_gate(
            "transpose row constraint",
            with_selector(
                selector.expr(),
                [
                    ("Constrain trace value integrity", transposed_bits.cur() - acc),
                    ("Constrain transposition of bit", (1 - acc) * acc),
                ],
            ),
        )
        return TransposeConfig(tuple(permuted_bits), transposed_bits, selector)

    def synthesize(
        self,
        layouter: Layouter,
        bits: list[int],
        placements: list[list[AssignedCell]],
    ) -> list[AssignedCell]:
        """bits: the 100 transposed board bits; placements: 10 lists of 100
        assigned bit cells ([H5, V5, H4, V4, ...] order)."""
        cfg = self.config

        def region_fn(region):
            for col in range(10):
                for row in range(BOARD_SIZE):
                    transposed_index = row % 10 * 10 + row // 10 if col % 2 == 1 else row
                    orientation = "vertical" if col % 2 == 1 else "horizontal"
                    placements[col][transposed_index].copy_advice(
                        f"permute {orientation} ship {col // 2} bit {row}",
                        region,
                        cfg.permuted_bits[col],
                        row,
                    )
            assigned = []
            for row in range(BOARD_SIZE):
                assigned.append(
                    region.assign_advice(f"assign transposed bit {row}", cfg.transposed_bits, row, bits[row])
                )
                region.enable_selector("transpose", cfg.selector, row)
            return assigned

        return layouter.assign_region("Transpose ship commitments", region_fn)
