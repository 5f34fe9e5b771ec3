"""Polynomial expression DAG for PLONKish gates.

The framework analog of halo2's ``Expression`` tree (consumed by the
reference's gate builders, e.g. src/chips/bitify.rs:64-93): references to
column cells at relative rotations, combined with +, -, * and scalar
constants. Expressions are built host-side at configure time and evaluated
either (a) row-wise over numpy object arrays for MockProver diagnostics, or
(b) compiled to vectorized device evaluation over the extended domain for
the real prover (ops/gate_eval.py).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Callable

# Global creation-order counter for cell queries (and the equality
# registrations in circuit.py). halo2 0.2.0 numbers column queries in
# FIRST-USE order — the order `VirtualCells::query_*` calls happen inside
# `configure` closures, interleaved with `enable_equality` (which itself
# queries the column at Rotation::cur, plonk/circuit.rs). Our chips build
# the same expressions in the reference closures' statement order, so the
# creation sequence of CellQuery objects reproduces that call order and
# ProofSchedule derives halo2's query numbering from min-seq-first-use
# (PARITY.md query-order note).
_SEQ = itertools.count()


def next_query_seq() -> int:
    return next(_SEQ)


class ColumnType(Enum):
    ADVICE = "advice"
    FIXED = "fixed"
    INSTANCE = "instance"


@dataclass(frozen=True)
class Column:
    kind: ColumnType
    index: int

    def __repr__(self):
        return f"{self.kind.value}[{self.index}]"

    def cur(self) -> "Expression":
        return self.query(0)

    def next(self) -> "Expression":
        return self.query(1)

    def prev(self) -> "Expression":
        return self.query(-1)

    def query(self, rotation: int) -> "Expression":
        return CellQuery(self, rotation)


@dataclass(frozen=True)
class Selector:
    """A virtual binary toggle column. We keep selectors as dedicated fixed
    columns (no selector compression yet); the constraint degree accounting
    matches halo2's simple selectors."""

    index: int

    def __repr__(self):
        return f"selector[{self.index}]"

    def expr(self) -> "Expression":
        return SelectorQuery(self)


class Expression:
    """Base class; immutable tree."""

    def __add__(self, other) -> "Expression":
        return Sum(self, _wrap(other))

    def __radd__(self, other) -> "Expression":
        return Sum(_wrap(other), self)

    def __sub__(self, other) -> "Expression":
        return Sum(self, Negated(_wrap(other)))

    def __rsub__(self, other) -> "Expression":
        return Sum(_wrap(other), Negated(self))

    def __mul__(self, other) -> "Expression":
        return Product(self, _wrap(other))

    def __rmul__(self, other) -> "Expression":
        return Product(_wrap(other), self)

    def __neg__(self) -> "Expression":
        return Negated(self)

    # --- analysis ---------------------------------------------------------
    def degree(self) -> int:
        raise NotImplementedError

    def queried_cells(self) -> set:
        """All (Column, rotation) pairs referenced."""
        out: set = set()
        self._collect(out)
        return out

    def _collect(self, out: set):
        raise NotImplementedError

    def evaluate(
        self,
        constant: Callable[[int], Any],
        cell: Callable[["Column", int], Any],
        selector: Callable[["Selector"], Any],
        add: Callable[[Any, Any], Any],
        mul: Callable[[Any, Any], Any],
        neg: Callable[[Any], Any],
    ) -> Any:
        """Fold the tree with caller-supplied semantics (ints, numpy object
        arrays, jnp limb arrays, degree counting, ...)."""
        raise NotImplementedError


def _wrap(v) -> Expression:
    if isinstance(v, Expression):
        return v
    if isinstance(v, int):
        return Constant(v)
    raise TypeError(f"cannot use {type(v)} in an expression")


@dataclass(frozen=True)
class Constant(Expression):
    value: int

    def degree(self):
        return 0

    def _collect(self, out):
        pass

    def evaluate(self, constant, cell, selector, add, mul, neg):
        return constant(self.value)

    def __repr__(self):
        return hex(self.value) if self.value > 0xFFFF else str(self.value)


@dataclass(frozen=True)
class CellQuery(Expression):
    column: Column
    rotation: int
    # creation order (excluded from eq/hash/repr): ProofSchedule derives
    # halo2's first-use query numbering from the earliest seq per (column,
    # rotation) pair — see module docstring note
    seq: int = field(default_factory=next_query_seq, compare=False, repr=False)

    def degree(self):
        return 1

    def _collect(self, out):
        out.add((self.column, self.rotation))

    def evaluate(self, constant, cell, selector, add, mul, neg):
        return cell(self.column, self.rotation)

    def __repr__(self):
        rot = {0: "", 1: "_next", -1: "_prev"}.get(self.rotation, f"@{self.rotation}")
        return f"{self.column}{rot}"


@dataclass(frozen=True)
class SelectorQuery(Expression):
    sel: Selector
    seq: int = field(default_factory=next_query_seq, compare=False, repr=False)

    def degree(self):
        return 1

    def _collect(self, out):
        pass

    def evaluate(self, constant, cell, selector, add, mul, neg):
        return selector(self.sel)

    def __repr__(self):
        return repr(self.sel)


@dataclass(frozen=True)
class Sum(Expression):
    a: Expression
    b: Expression

    def degree(self):
        return max(self.a.degree(), self.b.degree())

    def _collect(self, out):
        self.a._collect(out)
        self.b._collect(out)

    def evaluate(self, constant, cell, selector, add, mul, neg):
        return add(
            self.a.evaluate(constant, cell, selector, add, mul, neg),
            self.b.evaluate(constant, cell, selector, add, mul, neg),
        )

    def __repr__(self):
        return f"({self.a} + {self.b})"


@dataclass(frozen=True)
class Product(Expression):
    a: Expression
    b: Expression

    def degree(self):
        return self.a.degree() + self.b.degree()

    def _collect(self, out):
        self.a._collect(out)
        self.b._collect(out)

    def evaluate(self, constant, cell, selector, add, mul, neg):
        return mul(
            self.a.evaluate(constant, cell, selector, add, mul, neg),
            self.b.evaluate(constant, cell, selector, add, mul, neg),
        )

    def __repr__(self):
        return f"{self.a} * {self.b}"


@dataclass(frozen=True)
class Negated(Expression):
    a: Expression

    def degree(self):
        return self.a.degree()

    def _collect(self, out):
        self.a._collect(out)

    def evaluate(self, constant, cell, selector, add, mul, neg):
        return neg(self.a.evaluate(constant, cell, selector, add, mul, neg))

    def __repr__(self):
        return f"(-{self.a})"
