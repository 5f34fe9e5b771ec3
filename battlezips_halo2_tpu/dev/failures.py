"""Structured verification failures — the observability contract.

Framework analog of ``halo2_proofs::dev::VerifyFailure`` (SURVEY.md §4: the
reference's 17 negative tests assert exact gate/region/row/cell-value
failure structures, e.g. src/circuits/board.rs:197-229). Ordering-stable:
gate/region/lookup indices are deterministic given the circuit definition.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..plonk.expression import Column


@dataclass(frozen=True)
class RegionRef:
    index: int
    name: str

    def __str__(self):
        return f"Region {self.index} ('{self.name}')"


@dataclass(frozen=True)
class FailureLocation:
    """Either inside a named region (with offset relative to the region
    start) or a bare absolute row."""

    region: RegionRef | None
    offset: int  # region-relative if region else absolute row

    @staticmethod
    def in_region(region: RegionRef, offset: int) -> "FailureLocation":
        return FailureLocation(region, offset)

    @staticmethod
    def outside(row: int) -> "FailureLocation":
        return FailureLocation(None, row)

    def __str__(self):
        if self.region is not None:
            return f"in {self.region} at offset {self.offset}"
        return f"outside any region, on row {self.offset}"


@dataclass(frozen=True)
class GateRef:
    index: int
    name: str


@dataclass(frozen=True)
class ConstraintRef:
    gate: GateRef
    index: int
    name: str

    def __str__(self):
        return f"Constraint {self.index} ('{self.name}') in gate {self.gate.index} ('{self.gate.name}')"


class VerifyFailure:
    pass


@dataclass(frozen=True)
class ConstraintNotSatisfied(VerifyFailure):
    constraint: ConstraintRef
    location: FailureLocation
    # ((column, rotation), value-hex) for every cell the constraint queries
    cell_values: tuple

    def __str__(self):
        cells = ", ".join(f"{col}@{rot}={val}" for (col, rot), val in self.cell_values)
        return f"{self.constraint} is not satisfied {self.location} [{cells}]"


@dataclass(frozen=True)
class CellNotAssigned(VerifyFailure):
    """A gate's selector is enabled at a row, but an advice cell the gate
    queries there was never assigned (halo2 ``VerifyFailure::CellNotAssigned``:
    catches chips that enable a selector without filling every queried cell)."""

    gate: GateRef
    region: RegionRef | None
    gate_offset: int  # absolute row the gate fires on
    column: Column
    rotation: int

    def __str__(self):
        where = f"in {self.region} " if self.region is not None else ""
        return (
            f"Cell ({self.column}@{self.rotation}) queried by gate {self.gate.index} "
            f"('{self.gate.name}') {where}at gate offset {self.gate_offset} is not assigned"
        )


@dataclass(frozen=True)
class Permutation(VerifyFailure):
    column: Column
    row: int
    location: FailureLocation

    def __str__(self):
        return f"Equality constraint not satisfied by cell ({self.column}, row {self.row}) {self.location}"


@dataclass(frozen=True)
class LookupFailure(VerifyFailure):
    lookup_index: int
    name: str
    location: FailureLocation

    def __str__(self):
        return f"Lookup '{self.name}' (#{self.lookup_index}) input does not exist in table {self.location}"


@dataclass(frozen=True)
class InstanceMismatch(VerifyFailure):
    column: Column
    row: int

    def __str__(self):
        return f"Instance cell ({self.column}, row {self.row}) does not match the committed value"
