"""Dev harness: MockProver and structured diagnostics (SURVEY.md §7.1 item 7)."""

from .failures import (
    CellNotAssigned,
    ConstraintNotSatisfied,
    ConstraintRef,
    FailureLocation,
    GateRef,
    InstanceMismatch,
    LookupFailure,
    Permutation,
    RegionRef,
    VerifyFailure,
)
from .layout import circuit_layout, circuit_layout_svg, print_circuit_layout
from .mock import MockProver

__all__ = [
    "MockProver",
    "circuit_layout",
    "circuit_layout_svg",
    "print_circuit_layout",
    "VerifyFailure",
    "CellNotAssigned",
    "ConstraintNotSatisfied",
    "ConstraintRef",
    "FailureLocation",
    "GateRef",
    "InstanceMismatch",
    "LookupFailure",
    "Permutation",
    "RegionRef",
]
