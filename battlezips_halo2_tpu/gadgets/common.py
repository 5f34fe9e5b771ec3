"""Shared gadget helpers: Value-style None propagation and selector gating."""

from __future__ import annotations

from ..fields.host import FP
from ..plonk.expression import Expression, SelectorQuery


def vadd(*xs):
    """Sum of optional field values (None = unknown witness)."""
    if any(x is None for x in xs):
        return None
    return sum(xs) % FP.modulus


def vmul(a, b):
    if a is None or b is None:
        return None
    return a * b % FP.modulus


def vsub(a, b):
    if a is None or b is None:
        return None
    return (a - b) % FP.modulus


def with_selector(selector: Expression, constraints):
    """Multiply each (name, poly) by the selector (halo2
    Constraints::with_selector)."""
    return [(name, selector * poly) for name, poly in constraints]
