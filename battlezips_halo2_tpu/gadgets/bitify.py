"""Binary (de)composition chips: Num2Bits and Bits2Num.

Constraint semantics mirror the reference's bitify chips
(src/chips/bitify.rs:64-93 for the gate, 105-138 for synthesis): a single
selector gates three constraints per row —

* booleanity:        bit * (1 - bit) == 0
* doubling column:   e2 + e2 - e2_next == 0           (e2 seeds at 1)
* accumulator:       bit * e2 + lc1 - lc1_next == 0   (lc1 seeds at 0)

B gated rows decompose/compose a value; the final accumulator cell is
equality-constrained to the claimed value (Num2Bits) or returned as the
composed number (Bits2Num, src/chips/bitify.rs:160-231).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..plonk import AssignedCell, ConstraintSystem, Layouter
from ..plonk.expression import Column, Selector
from .common import vadd, vmul, with_selector


@dataclass(frozen=True)
class BitifyConfig:
    bits: Column
    lc1: Column
    e2: Column
    fixed: Column
    selector: Selector


def _configure(cs: ConstraintSystem, bits, lc1, e2, fixed, gate_name: str) -> BitifyConfig:
    selector = cs.selector()
    bit = bits.cur()
    cs.create_gate(
        gate_name,
        with_selector(
            selector.expr(),
            [
                ("Constrain bit is boolean", bit * (1 - bit)),
                ("Start from 1, doubling", e2.cur() + e2.cur() - e2.next()),
                ("If bit is 1, e2 added to sum", bit * e2.cur() + lc1.cur() - lc1.next()),
            ],
        ),
    )
    return BitifyConfig(bits, lc1, e2, fixed, selector)


class Num2BitsChip:
    """Witness the B-bit decomposition of an assigned value."""

    def __init__(self, value: AssignedCell, bits: list):
        self.value = value
        self.bits = bits  # list[int | None], length B

    @staticmethod
    def configure(cs: ConstraintSystem, bits, lc1, e2, fixed) -> BitifyConfig:
        return _configure(cs, bits, lc1, e2, fixed, "num2bits")

    def synthesize(self, config: BitifyConfig, layouter: Layouter) -> list[AssignedCell]:
        def region_fn(region):
            lc1 = region.assign_advice_from_constant("lc1_0", config.lc1, 0, 0)
            e2 = region.assign_advice_from_constant("e2_0", config.e2, 0, 1)
            out = []
            for i, b in enumerate(self.bits):
                region.enable_selector("bitify", config.selector, i)
                bit = region.assign_advice("bits", config.bits, i, b)
                out.append(bit)
                next_lc1 = vadd(lc1.value, vmul(bit.value, e2.value))
                next_e2 = vadd(e2.value, e2.value)
                lc1 = region.assign_advice("lc1", config.lc1, i + 1, next_lc1)
                e2 = region.assign_advice("e2", config.e2, i + 1, next_e2)
            region.constrain_equal(self.value, lc1)
            return out

        return layouter.assign_region("num2bits", region_fn)


class Bits2NumChip:
    """Compose already-assigned bits back into a number."""

    def __init__(self, value, bits: list):
        self.value = value  # int | None (witness hint, unconstrained)
        self.bits = bits  # list[AssignedCell]

    @staticmethod
    def configure(cs: ConstraintSystem, bits, lc1, e2, fixed) -> BitifyConfig:
        return _configure(cs, bits, lc1, e2, fixed, "bits2num")

    def synthesize(self, config: BitifyConfig, layouter: Layouter) -> AssignedCell:
        def region_fn(region):
            lc1 = region.assign_advice_from_constant("lc1_0", config.lc1, 0, 0)
            e2 = region.assign_advice_from_constant("e2_0", config.e2, 0, 1)
            for i, src in enumerate(self.bits):
                region.enable_selector("bitify", config.selector, i)
                bit = src.copy_advice("bits", region, config.bits, i)
                next_lc1 = vadd(lc1.value, vmul(bit.value, e2.value))
                next_e2 = vadd(e2.value, e2.value)
                lc1 = region.assign_advice("lc1", config.lc1, i + 1, next_lc1)
                e2 = region.assign_advice("e2", config.e2, i + 1, next_e2)
            return lc1

        return layouter.assign_region("bits2num", region_fn)
