"""Lookup-based range check (K = 10 bits).

Framework analog of ``halo2_gadgets::utilities::lookup_range_check::
LookupRangeCheckConfig<F, 10>`` as used by the reference's Pedersen chip
(src/chips/pedersen.rs:10-11,56-57, table load 71-85): a 2^10-row table of
[0, 1024) and a running-sum decomposition — each 10-bit word
``z_i - 2^10 * z_{i+1}`` is looked up; when the selector is off the lookup
input collapses to 0 (which is in the table).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..fields.host import FP
from ..plonk import AssignedCell, ConstraintSystem, Layouter, TableColumn
from ..plonk.expression import Column, Constant, Selector
from ..utils.constants import LOOKUP_SIZE

K = LOOKUP_SIZE
WORD = 1 << K


@dataclass(frozen=True)
class LookupRangeCheckConfig:
    running_sum: Column
    table: TableColumn
    q_lookup: Selector


class LookupRangeCheck:
    def __init__(self, config: LookupRangeCheckConfig):
        self.config = config

    @staticmethod
    def configure(cs: ConstraintSystem, running_sum: Column, table: TableColumn) -> LookupRangeCheckConfig:
        q_lookup = cs.selector()
        word = running_sum.cur() - Constant(WORD) * running_sum.next()
        cs.lookup(
            "lookup_range_check",
            [(q_lookup.expr() * word, table.inner.cur())],
        )
        return LookupRangeCheckConfig(running_sum, table, q_lookup)

    def load_table(self, layouter: Layouter):
        """Assign the 2^10-row table (pedersen.rs:71-85)."""
        cfg = self.config

        def table_fn(table):
            for i in range(WORD):
                table.assign_cell(f"table {i}", cfg.table, i, i)

        layouter.assign_table("range check table", table_fn)

    def copy_check(self, layouter: Layouter, cell: AssignedCell, num_words: int, strict: bool = True):
        """Constrain ``cell`` to num_words*10 bits via running-sum lookups.
        With strict=True the final running sum is constrained to zero."""
        cfg = self.config
        value = cell.value if cell.value is not None else 0
        zs = [value % FP.modulus]
        inv_word = FP.inv(WORD)
        for i in range(num_words):
            zs.append((zs[i] - (zs[i] & (WORD - 1))) * inv_word % FP.modulus)

        def region_fn(region):
            z0 = region.assign_advice("z_run 0", cfg.running_sum, 0, zs[0])
            region.constrain_equal(z0, cell)
            last = z0
            for i in range(1, num_words + 1):
                last = region.assign_advice(f"z_run {i}", cfg.running_sum, i, zs[i])
            for i in range(num_words):
                region.enable_selector("lookup", cfg.q_lookup, i)
            if strict:
                region.constrain_constant(last, 0)
            return last

        return layouter.assign_region("range check", region_fn)
