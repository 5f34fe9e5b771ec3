"""Circuit synthesis runtime: Layouter, Region, AssignedCell.

Framework analog of halo2's ``SimpleFloorPlanner`` / ``Region`` /
``AssignedCell`` (used throughout the reference's chips, e.g.
src/chips/bitify.rs:105-138): regions are measured with a shape pass, packed
per-column (a region starts at the max occupied row among the columns it
touches), then assigned for real. Witness values are plain ints (or None
during keygen); equality constraints and constants are collected for the
permutation argument.

Region closures are invoked twice (shape pass + assignment pass) and must be
pure with respect to external state.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .circuit import ConstraintSystem, TableColumn
from .expression import Column, ColumnType, Selector


@dataclass(frozen=True)
class AssignedCell:
    """A witnessed cell: (column, absolute row) plus its value (None =
    unknown, keygen mode)."""

    value: int | None
    column: Column
    row: int

    def copy_advice(self, name: str, region: "Region", column: Column, offset: int) -> "AssignedCell":
        """Assign this cell's value elsewhere and equality-constrain the two
        (halo2 AssignedCell::copy_advice; hot path of the transpose chip,
        reference src/chips/transpose.rs:112-127)."""
        cell = region.assign_advice(name, column, offset, self.value)
        region.constrain_equal(cell, self)
        return cell


@dataclass
class RegionInfo:
    index: int
    name: str
    start: int
    rows: int
    columns: set

    @property
    def end(self) -> int:
        return self.start + self.rows


class Assignment:
    """Collected assignment state for one synthesis run."""

    def __init__(self, cs: ConstraintSystem, n: int):
        self.cs = cs
        self.n = n
        self.usable_rows = cs.usable_rows(n)
        self.advice = [[None] * n for _ in range(cs.num_advice)]
        self.fixed = [[None] * n for _ in range(cs.num_fixed)]
        self.selectors = [[False] * n for _ in range(len(cs.selectors))]
        self.copies: list[tuple[tuple[Column, int], tuple[Column, int]]] = []
        self.constants: list[tuple[int, tuple[Column, int]]] = []
        self.regions: list[RegionInfo] = []
        self.table_rows: dict[int, int] = {}  # fixed col index -> rows filled

    def enable_selector(self, sel: Selector, row: int):
        self._check_row(row)
        self.selectors[sel.index][row] = True

    def assign_advice(self, column: Column, row: int, value):
        self._check_row(row)
        self.advice[column.index][row] = value

    def assign_fixed(self, column: Column, row: int, value):
        self._check_row(row)
        self.fixed[column.index][row] = value

    def copy(self, left: tuple[Column, int], right: tuple[Column, int]):
        for col, _ in (left, right):
            if col not in self.cs.equality_columns:
                raise ValueError(f"equality not enabled on {col}")
        self.copies.append((left, right))

    def _check_row(self, row: int):
        if row >= self.usable_rows:
            raise ValueError(
                f"row {row} exceeds usable rows {self.usable_rows} (n={self.n}); "
                "increase k"
            )

    def fill_constants(self):
        """Place collected constants into the constant column at free rows."""
        if not self.constants:
            return
        col = self.cs.constant_column
        assert col is not None, "no constant column enabled"
        data = self.fixed[col.index]
        cursor = 0
        for value, target in self.constants:
            while cursor < self.usable_rows and data[cursor] is not None:
                cursor += 1
            if cursor >= self.usable_rows:
                raise ValueError("constant column overflow; increase k")
            data[cursor] = value
            self.copies.append(((col, cursor), target))
            cursor += 1
        self.constants = []


class _ShapeRegion:
    """Measurement pass: records used columns and row extent, assigns nothing."""

    def __init__(self, layouter: "Layouter"):
        self.columns: set = set()
        self.rows = 0
        self._layouter = layouter

    def _track(self, key, offset: int):
        self.columns.add(key)
        self.rows = max(self.rows, offset + 1)

    def assign_advice(self, name, column, offset, value):
        self._track(column, offset)
        return AssignedCell(None, column, offset)

    def assign_advice_from_constant(self, name, column, offset, constant):
        self._track(column, offset)
        return AssignedCell(None, column, offset)

    def assign_fixed(self, name, column, offset, value):
        self._track(column, offset)
        return AssignedCell(None, column, offset)

    def enable_selector(self, name, sel, offset):
        self._track(sel, offset)

    def constrain_equal(self, a, b):
        pass

    def constrain_constant(self, cell, constant):
        pass


class Region:
    def __init__(self, assignment: Assignment, info: RegionInfo):
        self._a = assignment
        self.info = info

    def _abs(self, offset: int) -> int:
        return self.info.start + offset

    def assign_advice(self, name: str, column: Column, offset: int, value) -> AssignedCell:
        assert column.kind == ColumnType.ADVICE
        row = self._abs(offset)
        self._a.assign_advice(column, row, value)
        return AssignedCell(value, column, row)

    def assign_advice_from_constant(self, name: str, column: Column, offset: int, constant: int) -> AssignedCell:
        cell = self.assign_advice(name, column, offset, constant)
        self.constrain_constant(cell, constant)
        return cell

    def assign_fixed(self, name: str, column: Column, offset: int, value) -> AssignedCell:
        assert column.kind == ColumnType.FIXED
        row = self._abs(offset)
        self._a.assign_fixed(column, row, value)
        return AssignedCell(value, column, row)

    def enable_selector(self, name: str, sel: Selector, offset: int):
        self._a.enable_selector(sel, self._abs(offset))

    def constrain_equal(self, a: AssignedCell, b: AssignedCell):
        self._a.copy((a.column, a.row), (b.column, b.row))

    def constrain_constant(self, cell: AssignedCell, constant: int):
        self._a.constants.append((constant, (cell.column, cell.row)))


class Table:
    """Lookup-table assignment handle; tables occupy rows [0, len) of their
    fixed column (reference: 2^10-row range table, src/chips/pedersen.rs:71-85)."""

    def __init__(self, assignment: Assignment):
        self._a = assignment

    def assign_cell(self, name: str, table: TableColumn, offset: int, value: int):
        col = table.inner
        self._a.assign_fixed(col, offset, value)
        prev = self._a.table_rows.get(col.index, 0)
        self._a.table_rows[col.index] = max(prev, offset + 1)


class Layouter:
    """Per-column packing floor planner (shape pass then assignment pass)."""

    def __init__(self, assignment: Assignment):
        self._a = assignment
        self._column_cursor: dict = {}

    def assign_region(self, name: str, fn):
        shape = _ShapeRegion(self)
        fn(shape)
        start = 0
        for key in shape.columns:
            start = max(start, self._column_cursor.get(key, 0))
        info = RegionInfo(len(self._a.regions), name, start, shape.rows, shape.columns)
        self._a.regions.append(info)
        for key in shape.columns:
            self._column_cursor[key] = start + shape.rows
        return fn(Region(self._a, info))

    def assign_table(self, name: str, fn):
        table = Table(self._a)
        fn(table)
        # reserve the table rows on the underlying fixed column
        for col_idx, rows in self._a.table_rows.items():
            key = Column(ColumnType.FIXED, col_idx)
            self._column_cursor[key] = max(self._column_cursor.get(key, 0), rows)

    def constrain_instance(self, cell: AssignedCell, instance: Column, row: int):
        assert instance.kind == ColumnType.INSTANCE
        self._a.copy((cell.column, cell.row), (instance, row))

    def finalize(self):
        self._a.fill_constants()
