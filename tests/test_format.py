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
