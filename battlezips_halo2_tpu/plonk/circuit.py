"""PLONKish constraint system: columns, selectors, custom gates, lookups,
equality permutation.

Framework analog of ``halo2_proofs::plonk::ConstraintSystem`` as consumed by
the reference's configure fns (src/chips/board.rs:194-321): advice/fixed/
instance columns, simple selectors, gates as expression trees with rotations,
equality-enabled columns, a global constant column, and tuple lookups against
table columns. Built host-side once per circuit; the prover compiles the gate
DAG into a single vectorized device evaluator.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from .expression import Column, ColumnType, Expression, Selector


@dataclass(frozen=True)
class TableColumn:
    """A fixed column used as a lookup table (halo2 TableColumn)."""

    inner: Column


@dataclass
class Gate:
    index: int
    name: str
    # each constraint: (name, polynomial); satisfied iff poly == 0 on every row
    constraints: list[tuple[str, Expression]]


@dataclass
class Lookup:
    index: int
    name: str
    # pairs of (input expression, table expression)
    mapping: list[tuple[Expression, Expression]]


class ConstraintSystem:
    def __init__(self):
        self.num_advice = 0
        self.num_fixed = 0
        self.num_instance = 0
        self.selectors: list[Selector] = []
        self.gates: list[Gate] = []
        self.lookups: list[Lookup] = []
        self.equality_columns: list[Column] = []
        self.constant_column: Column | None = None
        self.table_columns: list[TableColumn] = []
        # (column, 0) -> creation seq of the rotation-cur query that halo2's
        # enable_equality implicitly makes (plonk/circuit.rs: enable_equality
        # calls query_any_index(column, Rotation::cur) before adding the
        # column to the permutation) — feeds first-use query numbering
        self.equality_query_seq: dict = {}

    # --- column allocation ------------------------------------------------
    def advice_column(self) -> Column:
        col = Column(ColumnType.ADVICE, self.num_advice)
        self.num_advice += 1
        return col

    def fixed_column(self) -> Column:
        col = Column(ColumnType.FIXED, self.num_fixed)
        self.num_fixed += 1
        return col

    def instance_column(self) -> Column:
        col = Column(ColumnType.INSTANCE, self.num_instance)
        self.num_instance += 1
        return col

    def selector(self) -> Selector:
        sel = Selector(len(self.selectors))
        self.selectors.append(sel)
        return sel

    def lookup_table_column(self) -> TableColumn:
        tc = TableColumn(self.fixed_column())
        self.table_columns.append(tc)
        return tc

    # --- features ---------------------------------------------------------
    def enable_equality(self, column: Column):
        if column not in self.equality_columns:
            self.equality_columns.append(column)
            from .expression import next_query_seq

            self.equality_query_seq[(column, 0)] = next_query_seq()

    def enable_constant(self, column: Column):
        """Declare the global constant column (must be fixed, equality on)."""
        assert column.kind == ColumnType.FIXED
        self.constant_column = column
        self.enable_equality(column)

    def create_gate(self, name: str, constraints) -> Gate:
        """constraints: list of (name, Expression) or a callable returning one."""
        if callable(constraints):
            constraints = constraints(self)
        constraints = list(constraints)
        assert constraints, f"gate {name!r} has no constraints"
        gate = Gate(len(self.gates), name, constraints)
        self.gates.append(gate)
        return gate

    def lookup(self, name: str, mapping) -> Lookup:
        if callable(mapping):
            mapping = mapping(self)
        lk = Lookup(len(self.lookups), name, list(mapping))
        self.lookups.append(lk)
        return lk

    # --- analysis ---------------------------------------------------------
    def max_gate_degree(self) -> int:
        deg = 1
        for gate in self.gates:
            for _, poly in gate.constraints:
                deg = max(deg, poly.degree())
        return deg

    def degree(self) -> int:
        """Overall circuit degree: gates, plus lookup and permutation terms.

        The lookup product term is
        ``l_active * (z_next (a'+b)(s'+g) - z (a_comp+b)(s_comp+g))`` — its
        true polynomial-factor count is 2 + in_deg + t_deg (l_active, z,
        compressed input, compressed table), and the permuted branch is
        degree 4. The quotient h = identity/Z_H only fits the extended
        domain when every term's degree is <= the value returned here
        (ext_factor = next pow2 >= degree-1 gives h capacity
        (degree-1)*n - 1 >= degree*(n-1) - n)."""
        deg = max(3, self.max_gate_degree())
        for lk in self.lookups:
            in_deg = max((i.degree() for i, _ in lk.mapping), default=1)
            t_deg = max((t.degree() for _, t in lk.mapping), default=1)
            deg = max(deg, 4, 2 + in_deg + t_deg)
        return deg

    def blinding_factors(self) -> int:
        """Rows reserved at the tail of each column for zero-knowledge
        blinding (mirrors halo2's accounting: enough for all queries plus
        the permutation/lookup arguments)."""
        # t blinding rows for witnesses + 1 for the l_last row + a few for
        # rotations; halo2 0.2 computes max(6, queries); 6 is enough here.
        return 6

    def usable_rows(self, n: int) -> int:
        return n - (self.blinding_factors() + 1)


ConfigureFn = Callable[[ConstraintSystem], object]
