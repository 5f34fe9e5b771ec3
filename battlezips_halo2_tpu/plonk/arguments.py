"""Shared protocol machinery: query schedule, permutation & lookup argument
formulas.

The constraint formulas are written with plain Python operators so the SAME
code evaluates them on the prover's extended-domain vectors (numpy object
arrays) and on the verifier's scalars at the challenge point — one source of
truth, no prover/verifier divergence.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..fields.host import FP
from .circuit import ConstraintSystem
from .expression import Column, ColumnType
from .keys import DELTA, num_fixed_total, selector_column_index

P = FP.modulus


def _obj_array(values):
    import numpy as np

    out = np.empty(len(values), dtype=object)
    for i, v in enumerate(values):
        out[i] = v % P
    return out


def _lagrange_basis_extended(domain, rows: list[int]) -> dict[int, np.ndarray]:
    """l_i(X) on the extended coset for the given row indices (batch-inverted)."""
    m = P
    ext = domain.extended_n
    t_ext = domain.t_extended()
    xs = []
    acc = domain.g_coset
    for _ in range(ext):
        xs.append(acc)
        acc = acc * domain.extended_omega % m
    out = {}
    omega = domain.omega
    for i in rows:
        wi = pow(omega, i, m)
        denoms = [(domain.n * (x - wi)) % m for x in xs]
        invs = FP.batch_inv(denoms)
        out[i] = _obj_array([wi * t % m * inv % m for t, inv in zip(t_ext, invs)])
    return out





@dataclass(frozen=True)
class ProofSchedule:
    """Canonical query ordering + argument shapes, derived purely from the
    constraint system (identical on prover and verifier)."""

    advice_queries: tuple  # ((col_index, rotation), ...)
    fixed_queries: tuple  # ((combined_fixed_index, rotation), ...)
    instance_queries: tuple  # ((col_index, rotation), ...)
    num_perm_chunks: int
    chunk_len: int

    @staticmethod
    def build(cs: ConstraintSystem) -> "ProofSchedule":
        # pure function of the constraint system — cached on it (the walk
        # over every gate expression costs ~14 ms per call at board scale,
        # and prover AND verifier build it per proof)
        cached = getattr(cs, "_schedule_cache", None)
        if cached is not None:
            return cached
        schedule = ProofSchedule._build_uncached(cs)
        cs._schedule_cache = schedule
        return schedule

    @staticmethod
    def _build_uncached(cs: ConstraintSystem) -> "ProofSchedule":
        # FIRST-USE query numbering (halo2 0.2.0 semantics): a column query
        # gets its index at its first `query_*` call during configure —
        # enable_equality's implicit Rotation::cur query interleaved with
        # the gate/lookup builders' queries in closure statement order. Our
        # expressions carry a creation sequence (CellQuery.seq), and
        # enable_equality records its seq on the constraint system, so the
        # minimum seq per (column, rotation) reproduces that order exactly
        # when the chips build expressions in the reference closures'
        # statement order (PARITY.md "query numbering"). Legacy pickled
        # systems without seqs fall back to the old sorted order via the
        # BIG sentinel + key tiebreak.
        BIG = 1 << 62
        advice: dict = {}
        fixed: dict = {}

        def note(d, key, seq):
            if key not in d or seq < d[key]:
                d[key] = seq

        def visit_expr(expr):
            from .expression import CellQuery, Negated, Product, SelectorQuery, Sum

            if isinstance(expr, CellQuery):
                seq = getattr(expr, "seq", BIG)
                col = expr.column
                if col.kind == ColumnType.ADVICE:
                    note(advice, (col.index, expr.rotation), seq)
                elif col.kind == ColumnType.FIXED:
                    note(fixed, (col.index, expr.rotation), seq)
                else:
                    raise ValueError("instance columns may not appear in gates")
            elif isinstance(expr, SelectorQuery):
                note(fixed, (selector_column_index(cs, expr.sel.index), 0), getattr(expr, "seq", BIG))
            elif isinstance(expr, (Sum, Product)):
                visit_expr(expr.a)
                visit_expr(expr.b)
            elif isinstance(expr, Negated):
                visit_expr(expr.a)

        for gate in cs.gates:
            for _, poly in gate.constraints:
                visit_expr(poly)
        for lk in cs.lookups:
            for i_expr, t_expr in lk.mapping:
                visit_expr(i_expr)
                visit_expr(t_expr)
        # the permutation argument reads every equality column at rotation 0
        # (halo2: enable_equality itself queried the column at cur)
        eq_seqs = getattr(cs, "equality_query_seq", {})
        instance_d: dict = {}
        for col in cs.equality_columns:
            seq = eq_seqs.get((col, 0), BIG)
            if col.kind == ColumnType.ADVICE:
                note(advice, (col.index, 0), seq)
            elif col.kind == ColumnType.FIXED:
                note(fixed, (col.index, 0), seq)
            else:
                note(instance_d, (col.index, 0), seq)

        def ordered(d):
            return tuple(k for k in sorted(d, key=lambda k: (d[k], k)))

        chunk_len = max(1, cs.degree() - 2)
        n_cols = len(cs.equality_columns)
        chunks = (n_cols + chunk_len - 1) // chunk_len
        return ProofSchedule(
            advice_queries=ordered(advice),
            fixed_queries=ordered(fixed),
            instance_queries=ordered(instance_d),
            num_perm_chunks=chunks,
            chunk_len=chunk_len,
        )


def _collect_selectors(expr, fixed: set, cs: ConstraintSystem):
    from .expression import Negated, Product, SelectorQuery, Sum

    if isinstance(expr, SelectorQuery):
        fixed.add((selector_column_index(cs, expr.sel.index), 0))
    elif isinstance(expr, (Sum, Product)):
        _collect_selectors(expr.a, fixed, cs)
        _collect_selectors(expr.b, fixed, cs)
    elif isinstance(expr, Negated):
        _collect_selectors(expr.a, fixed, cs)


def evaluate_expression(cs: ConstraintSystem, expr, cell_fn, selector_as_fixed_fn):
    """Evaluate a gate/lookup Expression with polymorphic arithmetic.

    cell_fn(column, rotation) -> value (array or scalar);
    selector_as_fixed_fn(combined_fixed_index) -> value."""
    return expr.evaluate(
        constant=lambda v: v % P,
        cell=cell_fn,
        selector=lambda s: selector_as_fixed_fn(selector_column_index(cs, s.index)),
        add=lambda a, b: (a + b) % P,
        mul=lambda a, b: (a * b) % P,
        neg=lambda a: (-a) % P,
    )


# ----------------------------------------------------------------- formulas
def permutation_terms(
    chunks: list,
    l0,
    llast,
    lactive,
    beta,
    gamma,
    x_coord,
):
    """Permutation argument constraint values (prover: vectors, verifier:
    scalars).

    chunks: list of dicts with keys
      z, z_next       — z(X), z(omega X)
      prev_last       — z_{c-1}(omega^u X) (None for chunk 0)
      cols            — list of (value, sigma_eval, global_column_index)
    """
    terms = []
    first_z = chunks[0]["z"]
    terms.append(l0 * (1 - first_z) % P)
    last_z = chunks[-1]["z"]
    terms.append(llast * (last_z * last_z % P - last_z) % P)
    for c in range(1, len(chunks)):
        # chunks[c]["prev_last"] holds z_{c-1}(omega^u X)
        terms.append(l0 * (chunks[c]["z"] - chunks[c]["prev_last"]) % P)
    for chunk in chunks:
        left = chunk["z_next"]
        right = chunk["z"]
        for value, sigma_eval, col_j in chunk["cols"]:
            left = left * ((value + beta * sigma_eval + gamma) % P) % P
            right = right * ((value + beta * pow(DELTA, col_j, P) % P * x_coord + gamma) % P) % P
        terms.append((left - right) % P * lactive % P)
    return terms


def lookup_terms(lk, l0, llast, lactive, beta, gamma):
    """Lookup argument constraint values.

    lk: dict with keys z, z_next, a_compressed, s_compressed, a_perm,
    a_perm_prev (A''(omega^-1 X)), s_perm."""
    z, z_next = lk["z"], lk["z_next"]
    terms = [
        l0 * (1 - z) % P,
        llast * (z * z % P - z) % P,
        (
            z_next * ((lk["a_perm"] + beta) % P) % P * ((lk["s_perm"] + gamma) % P)
            - z * ((lk["a_compressed"] + beta) % P) % P * ((lk["s_compressed"] + gamma) % P)
        )
        % P
        * lactive
        % P,
        l0 * (lk["a_perm"] - lk["s_perm"]) % P,
        (lk["a_perm"] - lk["s_perm"]) % P * ((lk["a_perm"] - lk["a_perm_prev"]) % P) % P * lactive % P,
    ]
    return terms


def permute_lookup_inputs(a_values: list[int], s_values: list[int]):
    """halo2's lookup permutation: sort A; S gets matching first-occurrence
    values, leftovers fill the rest. Raises if some input is not in the
    table."""
    a_sorted = sorted(a_values)
    from collections import Counter

    leftover = Counter(s_values)
    s_perm: list = [None] * len(a_sorted)
    for i, v in enumerate(a_sorted):
        if i == 0 or a_sorted[i] != a_sorted[i - 1]:
            if leftover[v] <= 0:
                raise ValueError(f"lookup input {hex(v)} not found in table")
            leftover[v] -= 1
            s_perm[i] = v
    fill = iter(sorted(leftover.elements()))
    for i in range(len(s_perm)):
        if s_perm[i] is None:
            s_perm[i] = next(fill)
    return a_sorted, s_perm
