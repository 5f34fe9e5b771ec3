"""Proof-format description: the exact transcript layout of a proof.

Dev/parity tooling: enumerates every element the prover writes (and the
verifier reads) in order — commitment points (32-byte compressed) and
scalars (32-byte LE reprs) — with the protocol phase it belongs to.
``describe_proof(vk, params)`` returns the ordered item list;
``proof_size(vk, params)`` the exact byte length, which every produced
proof must match (tests/test_format.py).

The layout mirrors halo2 0.2.0 (plonk/prover.rs write order; see the
conformance table in PARITY.md): h pieces are committed individually but
opened as ONE x^n-collapsed polynomial (no h evals in the proof), instance
evals ARE written, permutation-z "last" evals trail the (z@x, z@ωx) pairs
in reverse set order, and the IPA carries the synthetic-blinding S
commitment before its log-n rounds.
"""

from __future__ import annotations

from dataclasses import dataclass

from .arguments import ProofSchedule


@dataclass(frozen=True)
class ProofItem:
    phase: str
    name: str
    kind: str  # "point" | "scalar"

    @property
    def size(self) -> int:
        return 32


def describe_proof(vk, params) -> list[ProofItem]:
    cs = vk.cs
    domain = vk.domain
    schedule = ProofSchedule.build(cs)
    items: list[ProofItem] = []

    def pt(phase, name):
        items.append(ProofItem(phase, name, "point"))

    def sc(phase, name):
        items.append(ProofItem(phase, name, "scalar"))

    for i in range(cs.num_advice):
        pt("advice", f"advice_commitment[{i}]")
    for i in range(len(cs.lookups)):
        pt("lookup-permute", f"lookup[{i}].a_perm_commitment")
        pt("lookup-permute", f"lookup[{i}].s_perm_commitment")
    for c in range(schedule.num_perm_chunks):
        pt("permutation", f"perm_z_commitment[{c}]")
    for i in range(len(cs.lookups)):
        pt("lookup-product", f"lookup[{i}].z_commitment")
    pt("vanishing", "random_poly_commitment")
    num_pieces = domain.extended_n // domain.n
    for i in range(num_pieces):
        pt("vanishing", f"h_piece_commitment[{i}]")

    for col, rot in schedule.instance_queries:
        sc("evaluations", f"instance[{col}]@rot{rot}")
    for col, rot in schedule.advice_queries:
        sc("evaluations", f"advice[{col}]@rot{rot}")
    for col, rot in schedule.fixed_queries:
        sc("evaluations", f"fixed[{col}]@rot{rot}")
    sc("evaluations", "random_poly@x")
    for j in range(len(cs.equality_columns)):
        sc("evaluations", f"sigma[{j}]@x")
    for c in range(schedule.num_perm_chunks):
        sc("evaluations", f"perm_z[{c}]@x")
        sc("evaluations", f"perm_z[{c}]@wx")
    for c in range(schedule.num_perm_chunks - 2, -1, -1):
        sc("evaluations", f"perm_z[{c}]@w^last x")
    for i in range(len(cs.lookups)):
        for which in ("z@x", "z@wx", "a_perm@x", "a_perm@w^-1x", "s_perm@x"):
            sc("evaluations", f"lookup[{i}].{which}")

    # multiopen: q evals are one per distinct point-set; the sets follow
    # the prover/verifier-shared query order (halo2 verifier.rs: instance,
    # advice, permutation sets, lookups, fixed, sigmas, vanishing h+random)
    from ..pcs.multiopen import VerifierQuery, _group

    queries = []
    for col, rot in schedule.instance_queries:
        queries.append(VerifierQuery(("instance", col), None, ("rot", rot), 0))
    for col, rot in schedule.advice_queries:
        queries.append(VerifierQuery(("advice", col), None, ("rot", rot), 0))
    for c in range(schedule.num_perm_chunks):
        queries.append(VerifierQuery(("perm_z", c), None, ("rot", 0), 0))
        queries.append(VerifierQuery(("perm_z", c), None, ("rot", 1), 0))
    for c in range(schedule.num_perm_chunks - 2, -1, -1):
        queries.append(VerifierQuery(("perm_z", c), None, ("rot", "last"), 0))
    for li in range(len(cs.lookups)):
        queries.append(VerifierQuery(("lk_z", li), None, ("rot", 0), 0))
        queries.append(VerifierQuery(("lk_a", li), None, ("rot", 0), 0))
        queries.append(VerifierQuery(("lk_s", li), None, ("rot", 0), 0))
        queries.append(VerifierQuery(("lk_a", li), None, ("rot", -1), 0))
        queries.append(VerifierQuery(("lk_z", li), None, ("rot", 1), 0))
    for col, rot in schedule.fixed_queries:
        queries.append(VerifierQuery(("fixed", col), None, ("rot", rot), 0))
    for j in range(len(cs.equality_columns)):
        queries.append(VerifierQuery(("sigma", j), None, ("rot", 0), 0))
    queries.append(VerifierQuery(("h",), None, ("rot", 0), 0))
    queries.append(VerifierQuery(("random",), None, ("rot", 0), 0))
    _, _, set_order, _ = _group(queries, key_fn=lambda q: q.name)

    pt("multiopen", "f_poly_commitment")
    for i in range(len(set_order)):
        sc("multiopen", f"q[{i}]@x3")

    # IPA (halo2 poly/commitment/prover.rs): synthetic-blinding commitment
    # S, then k rounds of (L, R), then the final scalar a and blind f
    pt("ipa", "s_poly_commitment")
    for j in range(params.k):
        pt("ipa", f"L[{j}]")
        pt("ipa", f"R[{j}]")
    sc("ipa", "a_final")
    sc("ipa", "blind_final")
    return items


def proof_size(vk, params) -> int:
    """Exact proof byte length for this (vk, params) pair."""
    return sum(item.size for item in describe_proof(vk, params))


def format_report(vk, params) -> str:
    """Human-readable phase-by-phase layout summary."""
    items = describe_proof(vk, params)
    lines = [f"proof layout: {len(items)} elements, {sum(i.size for i in items)} bytes"]
    phase = None
    count = 0
    start = 0
    for idx, item in enumerate(items + [ProofItem("<end>", "", "point")]):
        if item.phase != phase:
            if phase is not None:
                lines.append(f"  {phase:<16} {count:>3} x 32 B  (offset {start * 32})")
            phase, count, start = item.phase, 1, idx
        else:
            count += 1
    return "\n".join(lines)
