"""MockProver: run a circuit without cryptography and report structured
failures.

Framework analog of ``halo2_proofs::dev::MockProver`` — the central test
fixture of the reference (SURVEY.md §3.3): synthesize with witness collection
into an in-memory cell matrix, then check every gate polynomial on every row,
every equality (permutation) constraint, and every lookup, reporting
gate/region/offset/cell-value provenance.

Gate evaluation is vectorized over all rows with numpy object arrays of
Python ints (exact arithmetic mod p); one tree-walk per constraint.
"""

from __future__ import annotations

import numpy as np

from ..fields.host import FP
from ..plonk.assignment import Assignment, Layouter
from ..plonk.circuit import ConstraintSystem
from ..plonk.expression import Column, ColumnType
from .failures import (
    CellNotAssigned,
    ConstraintNotSatisfied,
    ConstraintRef,
    FailureLocation,
    GateRef,
    LookupFailure,
    Permutation,
    RegionRef,
    VerifyFailure,
)


def _column_array(raw: list, n: int) -> np.ndarray:
    out = np.empty(n, dtype=object)
    for i in range(n):
        v = raw[i]
        out[i] = 0 if v is None else v % FP.modulus
    return out


_KIND_ORDER = {ColumnType.ADVICE: 0, ColumnType.FIXED: 1, ColumnType.INSTANCE: 2}


def _cell_sort_key(cell):
    """halo2 metadata::VirtualCell Ord parity: (column type [Advice < Fixed
    < Instance], column index, rotation) — pins the cell_values ordering the
    reference tests assert."""
    col, rot = cell
    return (_KIND_ORDER[col.kind], col.index, rot)


class MockProver:
    def __init__(self, k: int, cs: ConstraintSystem, assignment: Assignment, instances: list[list[int]]):
        self.k = k
        self.n = 1 << k
        self.cs = cs
        self.assignment = assignment
        self.instances = instances
        # dense matrices
        self.advice = [_column_array(col, self.n) for col in assignment.advice]
        self.fixed = [_column_array(col, self.n) for col in assignment.fixed]
        self.selectors = [np.array([1 if b else 0 for b in col], dtype=object) for col in assignment.selectors]
        inst = []
        for col in range(cs.num_instance):
            vals = instances[col] if col < len(instances) else []
            arr = np.zeros(self.n, dtype=object)
            for i, v in enumerate(vals):
                arr[i] = v % FP.modulus
            inst.append(arr)
        self.instance = inst

    # --- construction -----------------------------------------------------
    @staticmethod
    def run(k: int, circuit, instances: list[list[int]]) -> "MockProver":
        cs = ConstraintSystem()
        config = type(circuit).configure(cs)
        n = 1 << k
        if cs.usable_rows(n) <= 0:
            raise ValueError(f"k={k} too small")
        assignment = Assignment(cs, n)
        layouter = Layouter(assignment)
        circuit.synthesize(config, layouter)
        layouter.finalize()
        return MockProver(k, cs, assignment, instances)

    # --- cell accessors ---------------------------------------------------
    def _format_value(self, v: int) -> str:
        """halo2 dev/util.rs format_value parity: "0", "1", "-1" for the
        trivial values, else 0x-prefixed hex with leading zeros trimmed —
        the exact strings the reference's negative tests assert
        (src/circuits/board.rs:437-467 expects "0x5"; the transpose
        collision tests expect "0"/"1")."""
        v %= FP.modulus
        if v == 0:
            return "0"
        if v == 1:
            return "1"
        if v == FP.modulus - 1:
            return "-1"
        return hex(v)

    def _cell_value(self, column: Column, row: int) -> int:
        row %= self.n
        if column.kind == ColumnType.ADVICE:
            return int(self.advice[column.index][row])
        if column.kind == ColumnType.FIXED:
            return int(self.fixed[column.index][row])
        return int(self.instance[column.index][row])

    def _matrix(self, column: Column) -> np.ndarray:
        if column.kind == ColumnType.ADVICE:
            return self.advice[column.index]
        if column.kind == ColumnType.FIXED:
            return self.fixed[column.index]
        return self.instance[column.index]

    def _locate(self, row: int, columns) -> FailureLocation:
        """Map an absolute row to the (last) region covering it that shares
        columns with the failing constraint."""
        best = None
        for info in self.assignment.regions:
            if info.start <= row < info.end and (not columns or info.columns & columns):
                best = info
        if best is None:
            for info in self.assignment.regions:
                if info.start <= row < info.end:
                    best = info
        if best is None:
            return FailureLocation.outside(row)
        return FailureLocation.in_region(RegionRef(best.index, best.name), row - best.start)

    # --- verification -----------------------------------------------------
    def verify(self) -> list[VerifyFailure]:
        failures: list[VerifyFailure] = []
        failures += self._verify_cells_assigned()
        failures += self._verify_gates()
        failures += self._verify_permutation()
        failures += self._verify_lookups()
        return failures

    def assert_satisfied(self):
        failures = self.verify()
        if failures:
            msg = "\n".join(str(f) for f in failures)
            raise AssertionError(f"circuit is not satisfied:\n{msg}")

    def _eval_expression(self, expr) -> np.ndarray:
        p = FP.modulus

        def cell(column, rot):
            return np.roll(self._matrix(column), -rot)

        return expr.evaluate(
            constant=lambda v: v % p,
            cell=cell,
            selector=lambda s: self.selectors[s.index],
            add=lambda a, b: (a + b) % p,
            mul=lambda a, b: (a * b) % p,
            neg=lambda a: (-a) % p,
        )

    def _verify_cells_assigned(self) -> list[VerifyFailure]:
        """halo2 ``VerifyFailure::CellNotAssigned``: every advice cell a gate
        queries must have been assigned at each row where one of the gate's
        selectors is enabled (catches chips that turn a selector on without
        filling the row)."""
        failures = []
        # per-advice-column unassigned masks from the RAW assignment (the
        # dense matrices default unassigned cells to 0, which gates may
        # accept silently)
        unassigned = [
            np.array([v is None for v in col], dtype=bool) for col in self.assignment.advice
        ]

        def queried_selectors(expr):
            return expr.evaluate(
                constant=lambda v: frozenset(),
                cell=lambda c, r: frozenset(),
                selector=lambda s: frozenset({s.index}),
                add=lambda a, b: a | b,
                mul=lambda a, b: a | b,
                neg=lambda a: a,
            )

        for gate in self.cs.gates:
            sel_ids: frozenset = frozenset()
            cells: set = set()
            for _, poly in gate.constraints:
                sel_ids |= queried_selectors(poly)
                cells |= poly.queried_cells()
            if not sel_ids:
                continue  # always-on gates can't distinguish unassigned-0
            fires = np.zeros(self.n, dtype=bool)
            for s in sel_ids:
                fires |= np.array([bool(v) for v in self.selectors[s]], dtype=bool)
            gate_cols = {c for c, _ in cells}
            for col, rot in sorted(cells, key=_cell_sort_key):
                if col.kind != ColumnType.ADVICE:
                    continue
                bad = fires & np.roll(unassigned[col.index], -rot)
                for row in np.nonzero(bad)[0]:
                    loc = self._locate(int(row), gate_cols)
                    failures.append(
                        CellNotAssigned(
                            gate=GateRef(gate.index, gate.name),
                            region=loc.region,
                            gate_offset=int(row),
                            column=col,
                            rotation=rot,
                        )
                    )
        return failures

    def _verify_gates(self) -> list[VerifyFailure]:
        failures = []
        for gate in self.cs.gates:
            for ci, (cname, poly) in enumerate(gate.constraints):
                values = self._eval_expression(poly)
                if np.isscalar(values) or getattr(values, "shape", None) == ():
                    values = np.full(self.n, int(values), dtype=object)
                bad_rows = np.nonzero(values)[0]
                queried = poly.queried_cells()
                cols = {c for c, _ in queried}
                for row in bad_rows:
                    row = int(row)
                    cell_values = tuple(
                        ((col, rot), self._format_value(self._cell_value(col, row + rot)))
                        for col, rot in sorted(queried, key=_cell_sort_key)
                    )
                    failures.append(
                        ConstraintNotSatisfied(
                            constraint=ConstraintRef(GateRef(gate.index, gate.name), ci, cname),
                            location=self._locate(row, cols),
                            cell_values=cell_values,
                        )
                    )
        return failures

    def _verify_permutation(self) -> list[VerifyFailure]:
        failures = []
        for (ca, ra), (cb, rb) in self.assignment.copies:
            va = self._cell_value(ca, ra)
            vb = self._cell_value(cb, rb)
            if va != vb:
                failures.append(Permutation(ca, ra, self._locate(ra, {ca})))
                failures.append(Permutation(cb, rb, self._locate(rb, {cb})))
        return failures

    def _verify_lookups(self) -> list[VerifyFailure]:
        failures = []
        usable = self.cs.usable_rows(self.n)
        for lk in self.cs.lookups:
            inputs = [self._eval_expression(i)[:usable] for i, _ in lk.mapping]
            tables = [self._eval_expression(t)[:usable] for _, t in lk.mapping]
            table_set = set(zip(*[tuple(t) for t in tables])) if tables else set()
            cols = set()
            for i, _ in lk.mapping:
                cols |= {c for c, _ in i.queried_cells()}
            for row in range(usable):
                tup = tuple(int(col[row]) for col in inputs)
                if tup not in table_set:
                    failures.append(LookupFailure(lk.index, lk.name, self._locate(row, cols)))
        return failures
