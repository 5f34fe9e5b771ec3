"""Pinned verifying-key description and its transcript digest.

halo2 0.2.0 seeds every proof transcript with a hash of the verifying key
(``VerifyingKey::hash_into``, consumed by the reference at
/root/reference/src/circuits/board.rs:912,924 via keygen_vk/verify_proof):

    blake2b-512(person = b"Halo2-Verify-Key",
                data   = u64_le(len(s)) || s)          -> from_bytes_wide

where ``s = format!("{:?}", vk.pinned())`` — the Rust *derived Debug* text
of ``PinnedVerificationKey`` (halo2_proofs 0.2.0 plonk/mod.rs hash_into,
plonk/circuit.rs PinnedConstraintSystem). This module emulates that text in
Python: the same structure, field order and Rust ``{:?}`` compact
formatting conventions, over this framework's own vk data.

Formatting rules reproduced (Rust std::fmt derived Debug, compact mode):

* struct:        ``Name { field: value, field2: value2 }``
* tuple variant: ``Name(v1, v2)``   (e.g. ``Rotation(0)``, ``Sum(a, b)``)
* Vec/slice:     ``[a, b, c]``
* tuple:         ``(a, b)``
* &'static str:  double-quoted
* Option:        ``None`` / ``Some(v)``
* pasta field elements: ``0x`` + 64 lowercase hex chars (big-endian repr —
  pasta_curves Fp/Fq Debug impl)
* pasta affine points: ``(x, y)`` with field-element coordinates
  (pasta_curves new_curve_impl Debug; identity renders as zero coords)

Structure reproduced (halo2 0.2.0):

    PinnedVerificationKey { base_modulus, scalar_modulus, domain,
                            cs, fixed_commitments, permutation }
    PinnedEvaluationDomain { k, extended_k, omega }
    PinnedConstraintSystem { num_fixed_columns, num_advice_columns,
                             num_instance_columns, num_selectors, gates,
                             advice_queries, instance_queries,
                             fixed_queries, permutation, lookups,
                             constants, minimum_degree }
    Expression::{Constant, Fixed, Advice, Instance, Negated, Sum, Product}
      (struct variants carry query_index / column_index / rotation)
    Column { index, column_type }, Rotation(i), Argument { columns },
    lookup Argument { input_expressions, table_expressions },
    permutation VerifyingKey { commitments }

Query indices follow halo2's FIRST-USE numbering (r5:
plonk/arguments.ProofSchedule orders by CellQuery creation seq — see the
PARITY.md residue section). Expression trees for the in-repo application
gates match the reference closures' construction; the ECC gadget region
is this framework's own (semantically equal) gate layout, so its pinned
text is a framework construction by design. The digest is a stable
commitment to the full pinned vk — circuit shape, query schedule,
fixed/sigma commitments — with halo2's exact hashing construction. The
text itself is byte-pinned for a tiny circuit in tests/test_pinned.py.
"""

from __future__ import annotations

import hashlib

from ..fields.host import FP, FQ
from .arguments import ProofSchedule
from .expression import (
    CellQuery,
    ColumnType,
    Constant,
    Expression,
    Negated,
    Product,
    SelectorQuery,
    Sum,
)

_KIND_NAME = {
    ColumnType.ADVICE: "Advice",
    ColumnType.FIXED: "Fixed",
    ColumnType.INSTANCE: "Instance",
}


def _fe(v: int, field=FP) -> str:
    """pasta field-element Debug: 0x + 64 lowercase hex (big-endian)."""
    return f"0x{v % field.modulus:064x}"


def _point(p) -> str:
    """pasta affine Debug: (x, y) over the curve's base field (FQ for
    Vesta commitments); the identity renders with zero coordinates."""
    if p is None:
        return f"({_fe(0, FQ)}, {_fe(0, FQ)})"
    return f"({_fe(p[0], FQ)}, {_fe(p[1], FQ)})"


def _column(index: int, kind: ColumnType) -> str:
    return f"Column {{ index: {index}, column_type: {_KIND_NAME[kind]} }}"


def _rotation(r: int) -> str:
    return f"Rotation({r})"


class _QueryIndex:
    """(kind, column, rotation) -> query_index, from the canonical
    ProofSchedule ordering (the same lists printed as *_queries)."""

    def __init__(self, schedule: ProofSchedule):
        self.adv = {q: i for i, q in enumerate(schedule.advice_queries)}
        self.fix = {q: i for i, q in enumerate(schedule.fixed_queries)}
        self.ins = {q: i for i, q in enumerate(schedule.instance_queries)}

    def lookup(self, kind: ColumnType, col: int, rot: int) -> int:
        table = {
            ColumnType.ADVICE: self.adv,
            ColumnType.FIXED: self.fix,
            ColumnType.INSTANCE: self.ins,
        }[kind]
        return table[(col, rot)]


def _expr(e: Expression, qi: _QueryIndex, cs) -> str:
    """Rust derived-Debug text of one gate/lookup expression."""
    if isinstance(e, Constant):
        return f"Constant({_fe(e.value)})"
    if isinstance(e, CellQuery):
        kind = e.column.kind
        idx = qi.lookup(kind, e.column.index, e.rotation)
        return (
            f"{_KIND_NAME[kind]} {{ query_index: {idx}, "
            f"column_index: {e.column.index}, rotation: {_rotation(e.rotation)} }}"
        )
    if isinstance(e, SelectorQuery):
        # post-compression systems have no SelectorQuery left; raw-selector
        # systems (BZ_NO_SELECTOR_COMPRESS) expose them as their dedicated
        # fixed column, mirroring what the prover evaluates
        from .arguments import selector_column_index

        col = selector_column_index(cs, e.sel.index)
        idx = qi.lookup(ColumnType.FIXED, col, 0)
        return (
            f"Fixed {{ query_index: {idx}, column_index: {col}, "
            f"rotation: {_rotation(0)} }}"
        )
    if isinstance(e, Negated):
        return f"Negated({_expr(e.a, qi, cs)})"
    if isinstance(e, Sum):
        return f"Sum({_expr(e.a, qi, cs)}, {_expr(e.b, qi, cs)})"
    if isinstance(e, Product):
        return f"Product({_expr(e.a, qi, cs)}, {_expr(e.b, qi, cs)})"
    raise TypeError(f"unknown expression node {type(e)}")


def _queries(queries, kind: ColumnType) -> str:
    items = ", ".join(
        f"({_column(col, kind)}, {_rotation(rot)})" for col, rot in queries
    )
    return f"[{items}]"


def pinned_vk_text(vk) -> str:
    """The full ``{:?}`` PinnedVerificationKey text for this vk."""
    cs = vk.cs
    schedule = ProofSchedule.build(cs)
    qi = _QueryIndex(schedule)
    from .keys import num_fixed_total

    gates = []
    for gate in cs.gates:
        for _, poly in gate.constraints:
            gates.append(_expr(poly, qi, cs))
    lookups = []
    for lk in cs.lookups:
        ins = ", ".join(_expr(i, qi, cs) for i, _ in lk.mapping)
        tabs = ", ".join(_expr(t, qi, cs) for _, t in lk.mapping)
        lookups.append(
            f"Argument {{ input_expressions: [{ins}], table_expressions: [{tabs}] }}"
        )
    perm_cols = ", ".join(_column(c.index, c.kind) for c in cs.equality_columns)
    constants = (
        f"[{_column(cs.constant_column.index, ColumnType.FIXED)}]"
        if cs.constant_column is not None
        else "[]"
    )
    extended_k = vk.domain.extended_n.bit_length() - 1
    pinned_cs = (
        "PinnedConstraintSystem { "
        f"num_fixed_columns: {num_fixed_total(cs)}, "
        f"num_advice_columns: {cs.num_advice}, "
        f"num_instance_columns: {cs.num_instance}, "
        f"num_selectors: {len(cs.selectors)}, "
        f"gates: [{', '.join(gates)}], "
        f"advice_queries: {_queries(schedule.advice_queries, ColumnType.ADVICE)}, "
        f"instance_queries: {_queries(schedule.instance_queries, ColumnType.INSTANCE)}, "
        f"fixed_queries: {_queries(schedule.fixed_queries, ColumnType.FIXED)}, "
        f"permutation: Argument {{ columns: [{perm_cols}] }}, "
        f"lookups: [{', '.join(lookups)}], "
        f"constants: {constants}, "
        "minimum_degree: None }"
    )
    fixed_commits = ", ".join(_point(c) for c in vk.fixed_commitments)
    sigma_commits = ", ".join(_point(c) for c in vk.permutation.sigma_commitments)
    return (
        "PinnedVerificationKey { "
        f'base_modulus: "0x{FQ.modulus:064x}", '
        f'scalar_modulus: "0x{FP.modulus:064x}", '
        "domain: PinnedEvaluationDomain { "
        f"k: {vk.k}, extended_k: {extended_k}, omega: {_fe(vk.domain.omega)} }}, "
        f"cs: {pinned_cs}, "
        f"fixed_commitments: [{fixed_commits}], "
        f"permutation: VerifyingKey {{ commitments: [{sigma_commits}] }} }}"
    )


def vk_transcript_repr(vk) -> int:
    """halo2 0.2.0 hash_into: blake2b-512 with person "Halo2-Verify-Key"
    over u64_le(len(s)) || s, wide-reduced into the scalar field."""
    s = pinned_vk_text(vk).encode()
    h = hashlib.blake2b(digest_size=64, person=b"Halo2-Verify-Key")
    h.update(len(s).to_bytes(8, "little"))
    h.update(s)
    return FP.from_bytes_wide(h.digest())
