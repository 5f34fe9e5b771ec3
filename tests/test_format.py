"""Proof-format describer (plonk/format.py): the predicted layout must
match real proofs byte-for-byte in length, for circuits with and without
lookups."""

import random

from battlezips_halo2_tpu.pcs.ipa import Params
from battlezips_halo2_tpu.plonk import create_proof, keygen
from battlezips_halo2_tpu.plonk.format import describe_proof, format_report, proof_size


def test_mul_circuit_proof_size(params_k5_shared=None):
    import sys

    sys.path.insert(0, "tests")
    from test_prover import MulCircuit

    params = Params.new(5)
    pk = keygen(params, MulCircuit(1, 1, 1))
    proof = create_proof(params, pk, MulCircuit(3, 5, 15), [[15]], random.Random(0))
    assert len(proof) == proof_size(pk.vk, params)
    report = format_report(pk.vk, params)
    assert "ipa" in report and "advice" in report


def test_lookup_circuit_proof_size():
    import sys

    sys.path.insert(0, "tests")
    from test_prover import LookupCircuit

    params = Params.new(6)
    pk = keygen(params, LookupCircuit([1, 5, 9]))
    proof = create_proof(params, pk, LookupCircuit([1, 5, 9]), [], random.Random(0))
    assert len(proof) == proof_size(pk.vk, params)


class TestFirstUseQueryOrder:
    """halo2 0.2.0 numbers column queries in FIRST-USE order (the order of
    query_* calls during configure, with enable_equality making an implicit
    Rotation::cur query). ProofSchedule derives this from CellQuery creation
    seqs (r5, VERDICT #6) — pinned here with a circuit whose first-use order
    differs from the old sorted order."""

    def test_first_use_beats_sorted(self):
        from battlezips_halo2_tpu.plonk import ConstraintSystem
        from battlezips_halo2_tpu.plonk.arguments import ProofSchedule

        cs = ConstraintSystem()
        a = cs.advice_column()  # index 0
        b = cs.advice_column()  # index 1
        s = cs.selector()
        # query b BEFORE a, and a rotation before the cur queries
        bn = b.next()
        bc = b.cur()
        ac = a.cur()
        cs.create_gate("g", [("c", s.expr() * (bn + bc * ac))])
        cs.enable_equality(a)  # equality query AFTER the gate queries
        schedule = ProofSchedule.build(cs)
        assert schedule.advice_queries == ((1, 1), (1, 0), (0, 0))

    def test_equality_first_when_enabled_first(self):
        from battlezips_halo2_tpu.plonk import ConstraintSystem
        from battlezips_halo2_tpu.plonk.arguments import ProofSchedule

        cs = ConstraintSystem()
        a = cs.advice_column()
        b = cs.advice_column()
        cs.enable_equality(b)  # first use of (b, cur)
        cs.enable_equality(a)
        s = cs.selector()
        cs.create_gate("g", [("c", s.expr() * (a.cur() * b.cur()))])
        schedule = ProofSchedule.build(cs)
        assert schedule.advice_queries == ((1, 0), (0, 0))
