"""Pasta field arithmetic: host-exact (Python int) and device (JAX limb) layers."""

from .host import FP, FQ, P_PALLAS, Q_VESTA, Field
from .limb import (
    FP_SPEC,
    FQ_SPEC,
    FieldSpec,
    NLIMBS,
    int_to_limbs,
    ints_to_limbs,
    limbs_to_int,
    limbs_to_ints,
)

__all__ = [
    "FP",
    "FQ",
    "P_PALLAS",
    "Q_VESTA",
    "Field",
    "FP_SPEC",
    "FQ_SPEC",
    "FieldSpec",
    "NLIMBS",
    "int_to_limbs",
    "ints_to_limbs",
    "limbs_to_int",
    "limbs_to_ints",
]
