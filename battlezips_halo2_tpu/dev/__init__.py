"""Dev harness: MockProver and structured diagnostics (SURVEY.md §7.1 item 7)."""

from .failures import (
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
from .mock import MockProver

__all__ = [
    "MockProver",
    "VerifyFailure",
    "ConstraintNotSatisfied",
    "ConstraintRef",
    "FailureLocation",
    "GateRef",
    "InstanceMismatch",
    "LookupFailure",
    "Permutation",
    "RegionRef",
]
