"""Selector compression.

Framework analog of halo2's ``plonk::circuit::compress_selectors`` (SURVEY.md
§2.2 "selectors + selector compression"): after the keygen synthesis has
produced the concrete selector activations, binary selector columns are
packed into combined fixed columns. Selectors sharing a combined column are
mutually exclusive row-wise; the column holds the 1-based slot index of
whichever selector fires on a row (0 = none). Every ``SelectorQuery`` in the
gates and lookups is rewritten into the slot's indicator polynomial of the
combined column:

    q_m(x) = norm * prod_{j in {0..g} \\ {m}} (x - j)    (degree g)

which is 1 exactly when x == m and 0 on every other slot value. Grouping is
degree-aware: a selector with worst-case constraint degree D only joins a
group of size g when (D - 1 + g) fits the circuit's pre-compression degree,
so the quotient domain never grows. The MockProver path keeps raw selectors
(as halo2's does); only the keygen/prover/verifier pipeline sees the
rewritten system.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..fields.host import FP
from .circuit import ConstraintSystem, Gate, Lookup
from .expression import (
    CellQuery,
    Column,
    ColumnType,
    Constant,
    Expression,
    Negated,
    Product,
    SelectorQuery,
    Sum,
)

P = FP.modulus


@dataclass(frozen=True)
class SelectorAssignment:
    """Where a compressed selector lives: combined column (index within the
    appended selector-column space) and 1-based slot value."""

    group: int
    slot: int


def _selector_max_degrees(cs: ConstraintSystem) -> dict[int, int]:
    """Per selector: the max degree of any constraint/lookup-input it
    appears in (the budget its group size must fit under)."""
    out: dict[int, int] = {}

    def scan(expr: Expression, degree: int):
        if isinstance(expr, SelectorQuery):
            out[expr.sel.index] = max(out.get(expr.sel.index, 0), degree)
        elif isinstance(expr, (Sum, Product)):
            scan(expr.a, degree)
            scan(expr.b, degree)
        elif isinstance(expr, Negated):
            scan(expr.a, degree)

    for gate in cs.gates:
        for _, poly in gate.constraints:
            scan(poly, poly.degree())
    for lk in cs.lookups:
        for i_expr, t_expr in lk.mapping:
            # the lookup product term carries l_active, z, the compressed
            # input AND the compressed table as polynomial factors: a
            # selector inside either expression must budget for
            # 2 + in_deg + t_deg (see ConstraintSystem.degree) — growing a
            # group grows the whole term's degree
            pair = 2 + i_expr.degree() + t_expr.degree()
            scan(i_expr, pair)
            scan(t_expr, pair)
    return out


def plan_groups(cs: ConstraintSystem, selector_values: list, max_degree: int) -> list[list[int]]:
    """Greedy packing: selectors (hardest first) join the first group with no
    row overlap whose new size keeps every member's constraint degree within
    max_degree. Returns groups of selector indices (slot = position + 1)."""
    degrees = _selector_max_degrees(cs)
    order = sorted(range(len(cs.selectors)), key=lambda s: -degrees.get(s, 1))
    groups: list[list[int]] = []
    group_rows: list[set] = []
    group_deg: list[int] = []  # max member degree in the group
    for s in order:
        rows = {i for i, b in enumerate(selector_values[s]) if b}
        d = degrees.get(s, 1)
        placed = False
        for gi in range(len(groups)):
            g = len(groups[gi]) + 1
            if max(group_deg[gi], d) - 1 + g > max_degree:
                continue
            if group_rows[gi] & rows:
                continue
            groups[gi].append(s)
            group_rows[gi] |= rows
            group_deg[gi] = max(group_deg[gi], d)
            placed = True
            break
        if not placed:
            groups.append([s])
            group_rows.append(rows)
            group_deg.append(d)
    return groups


def combined_columns(groups: list[list[int]], selector_values: list, n: int) -> list[list[int]]:
    """Per group: length-n value list, slot index m (1-based) where the
    group's m-1-th selector fires, else 0."""
    cols = []
    for group in groups:
        col = [0] * n
        for slot, s in enumerate(group, start=1):
            for i, b in enumerate(selector_values[s]):
                if b:
                    assert col[i] == 0, "overlapping selectors in one group"
                    col[i] = slot
        cols.append(col)
    return cols


def _indicator(column: Column, slot: int, group_len: int) -> Expression:
    """Degree-group_len polynomial of the combined column that is 1 when the
    column equals ``slot`` and 0 on the other slot values {0..group_len}."""
    norm = 1
    for j in range(group_len + 1):
        if j != slot:
            norm = norm * ((slot - j) % P) % P
    expr: Expression = Constant(pow(norm, P - 2, P))
    for j in range(group_len + 1):
        if j != slot:
            expr = Product(expr, Sum(CellQuery(column, 0), Constant((-j) % P)))
    return expr


def _substitute(expr: Expression, repl: dict[int, Expression]) -> Expression:
    if isinstance(expr, SelectorQuery):
        return repl[expr.sel.index]
    if isinstance(expr, Sum):
        return Sum(_substitute(expr.a, repl), _substitute(expr.b, repl))
    if isinstance(expr, Product):
        return Product(_substitute(expr.a, repl), _substitute(expr.b, repl))
    if isinstance(expr, Negated):
        return Negated(_substitute(expr.a, repl))
    return expr


def compress_selectors(cs: ConstraintSystem, selector_values: list, n: int):
    """Rewrite ``cs`` in place: pack selectors into combined fixed columns
    (appended after the real fixed columns, i.e. combined index
    ``cs.num_fixed + group``) and substitute every SelectorQuery. Returns the
    combined column value lists to append to the fixed assignment.

    Sets ``cs.num_selector_columns`` (consumed by keygen's
    ``num_fixed_total``) and ``cs.selector_assignments`` (provenance)."""
    if not cs.selectors:
        cs.num_selector_columns = 0
        cs.selector_assignments = {}
        return []
    max_degree = cs.degree()
    groups = plan_groups(cs, selector_values, max_degree)
    repl: dict[int, Expression] = {}
    assignments: dict[int, SelectorAssignment] = {}
    for gi, group in enumerate(groups):
        col = Column(ColumnType.FIXED, cs.num_fixed + gi)
        for slot, s in enumerate(group, start=1):
            assignments[s] = SelectorAssignment(gi, slot)
            if len(group) == 1:
                # singleton: the column IS the 0/1 selector (degree 1, same
                # as uncompressed; avoids a pointless inverse-normalized form)
                repl[s] = CellQuery(col, 0)
            else:
                repl[s] = _indicator(col, slot, len(group))
    cs.gates = [
        Gate(g.index, g.name, [(name, _substitute(poly, repl)) for name, poly in g.constraints])
        for g in cs.gates
    ]
    cs.lookups = [
        Lookup(
            lk.index,
            lk.name,
            [(_substitute(i, repl), _substitute(t, repl)) for i, t in lk.mapping],
        )
        for lk in cs.lookups
    ]
    cs.num_selector_columns = len(groups)
    cs.selector_assignments = assignments
    # the quotient domain is sized from the PRE-compression degree: the
    # rewritten system must never exceed it (h would alias in the extended
    # iNTT and proofs would fail to verify — caught hard here instead)
    assert cs.degree() <= max_degree, (
        f"selector compression raised circuit degree {cs.degree()} past the "
        f"pre-compression bound {max_degree} (grouping budget bug)"
    )
    # singleton groups: slot value 1 where enabled == the raw 0/1 selector,
    # so CellQuery-on-column substitution above is exact for them too
    return combined_columns(groups, selector_values, n)
