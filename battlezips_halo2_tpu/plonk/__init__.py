"""PLONKish proving system: constraint system, synthesis runtime, keygen,
prover, verifier (SURVEY.md §7.1 item 6)."""

from .assignment import AssignedCell, Assignment, Layouter, Region, Table
from .circuit import ConstraintSystem, Gate, Lookup, TableColumn
from .expression import Column, ColumnType, Constant, Expression, Selector


class Circuit:
    """Base circuit protocol (halo2 ``Circuit`` trait analog).

    Subclasses implement:
    * ``configure(cls, cs) -> Config`` (classmethod/staticmethod)
    * ``synthesize(self, config, layouter)``
    * ``without_witnesses(self) -> Circuit`` — same shape, dummy witness
      (used by keygen; reference analog src/circuits/board.rs:26-28).
    """

    @classmethod
    def configure(cls, cs: ConstraintSystem):
        raise NotImplementedError

    def synthesize(self, config, layouter: Layouter):
        raise NotImplementedError

    def without_witnesses(self) -> "Circuit":
        raise NotImplementedError


__all__ = [
    "AssignedCell",
    "Assignment",
    "Circuit",
    "Column",
    "ColumnType",
    "Constant",
    "ConstraintSystem",
    "Expression",
    "Gate",
    "Layouter",
    "Lookup",
    "Region",
    "Selector",
    "Table",
    "TableColumn",
]
