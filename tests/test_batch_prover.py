"""Batch-amortized prover (plonk/batch_prover.py): bit-identity vs the
sequential prover.

The batch prover's contract is that scheduling is the ONLY difference:
proof i of a batch is byte-identical to create_proof run alone with the
same rng seed. The fast tier checks this over the mul and lookup harness
circuits (one proving key, several witnesses); the slow tier re-checks on
the production shot circuit and the batched session API."""

import os
import random

import pytest

from battlezips_halo2_tpu.pcs.ipa import Params
from battlezips_halo2_tpu.plonk import create_proof, create_proofs_batched, keygen, verify_proof

from test_prover import LookupCircuit, MulCircuit

SLOW = os.environ.get("BZ_RUN_SLOW", "") not in ("", "0")


@pytest.fixture(scope="module")
def params_k5():
    return Params.new(5)


@pytest.fixture(scope="module")
def params_k6():
    return Params.new(6)


class TestBatchBitIdentity:
    def test_mul_batch_matches_sequential(self, params_k5):
        pk = keygen(params_k5, MulCircuit(1, 1, 1))
        witnesses = [(3, 5, 15), (2, 7, 14), (4, 4, 16)]
        circuits = [MulCircuit(*w) for w in witnesses]
        instances = [[[w[2]]] for w in witnesses]
        sequential = [
            create_proof(params_k5, pk, MulCircuit(*w), [[w[2]]], random.Random(100 + i))
            for i, w in enumerate(witnesses)
        ]
        batched = create_proofs_batched(
            params_k5,
            pk,
            circuits,
            instances,
            [random.Random(100 + i) for i in range(len(witnesses))],
            engine="host",
        )
        assert batched == sequential
        for proof, w in zip(batched, witnesses):
            assert verify_proof(params_k5, pk.vk, proof, [[w[2]]])

    def test_lookup_batch_matches_sequential(self, params_k6):
        pk = keygen(params_k6, LookupCircuit([0] * 4))
        values = [[1, 3, 3, 15], [0, 2, 4, 8]]
        sequential = [
            create_proof(params_k6, pk, LookupCircuit(v), [], random.Random(7 + i))
            for i, v in enumerate(values)
        ]
        batched = create_proofs_batched(
            params_k6,
            pk,
            [LookupCircuit(v) for v in values],
            [[] for _ in values],
            [random.Random(7 + i) for i in range(len(values))],
            engine="host",
        )
        assert batched == sequential
        for proof in batched:
            assert verify_proof(params_k6, pk.vk, proof, [])

    def test_singleton_batch(self, params_k5):
        pk = keygen(params_k5, MulCircuit(1, 1, 1))
        (proof,) = create_proofs_batched(
            params_k5, pk, [MulCircuit(3, 5, 15)], [[[15]]], [random.Random(42)], engine="host"
        )
        assert proof == create_proof(params_k5, pk, MulCircuit(3, 5, 15), [[15]], random.Random(42))

    def test_empty_batch(self, params_k5):
        pk = keygen(params_k5, MulCircuit(1, 1, 1))
        assert create_proofs_batched(params_k5, pk, [], [], [], engine="host") == []

    def test_tail_workers_bit_identical(self, params_k5, monkeypatch):
        """The threaded multiopen/IPA tail must not change bytes."""
        pk = keygen(params_k5, MulCircuit(1, 1, 1))
        witnesses = [(3, 5, 15), (2, 7, 14)]
        args = (
            params_k5,
            pk,
            [MulCircuit(*w) for w in witnesses],
            [[[w[2]]] for w in witnesses],
        )
        serial = create_proofs_batched(
            *args, [random.Random(i) for i in range(2)], engine="host"
        )
        monkeypatch.setenv("BZ_BATCH_TAIL_WORKERS", "2")
        threaded = create_proofs_batched(
            *args, [random.Random(i) for i in range(2)], engine="host"
        )
        assert serial == threaded


@pytest.mark.skipif(not SLOW, reason="set BZ_RUN_SLOW=1 for production batch proofs")
class TestBatchProduction:
    def test_shot_batch_matches_sequential(self):
        from battlezips_halo2_tpu.circuits import ShotCircuit
        from battlezips_halo2_tpu.pcs.ipa import cached_params
        from battlezips_halo2_tpu.utils import BinaryValue, Board, Deck, serialize

        board = Board.from_deck(
            Deck.from_placements(
                [(3, 3, True), (5, 4, False), (0, 1, False), (0, 5, True), (6, 1, False)]
            )
        )
        shots = [((3, 3), 1), ((0, 0), 0)]
        circuits = [
            ShotCircuit(board.state(), 0xBEEF, serialize([x], [y]), BinaryValue(h))
            for (x, y), h in shots
        ]
        params = cached_params(11)
        pk = keygen(params, circuits[0])
        sequential = [
            create_proof(params, pk, c, [c.public_instance()], random.Random(i))
            for i, c in enumerate(circuits)
        ]
        batched = create_proofs_batched(
            params,
            pk,
            circuits,
            [[c.public_instance()] for c in circuits],
            [random.Random(i) for i in range(len(circuits))],
            engine="host",
        )
        assert batched == sequential
        for c, proof in zip(circuits, batched):
            assert verify_proof(params, pk.vk, proof, [c.public_instance()])

    def test_session_pp_subbatches_bit_identical(self):
        """workers>1 in batched mode splits the shot batch into PP
        sub-batches — bytes must not change."""
        from battlezips_halo2_tpu import api

        placements = [(3, 3, True), (5, 4, False), (0, 1, False), (0, 5, True), (6, 1, False)]
        one = api.prove_session([placements], shots_per_game=4, trapdoors=[0x31], seed=3, batched=True)
        two = api.prove_session(
            [placements], shots_per_game=4, trapdoors=[0x31], seed=3, batched=True, workers=2
        )
        assert [p.proof for p in one.shot_proofs] == [p.proof for p in two.shot_proofs]

    def test_session_batched_bit_identical(self):
        """api.prove_session(batched=True) == sequential session, same seed."""
        from battlezips_halo2_tpu import api

        placements = [(3, 3, True), (5, 4, False), (0, 1, False), (0, 5, True), (6, 1, False)]
        seq = api.prove_session([placements], shots_per_game=2, trapdoors=[0x77], seed=5)
        bat = api.prove_session(
            [placements], shots_per_game=2, trapdoors=[0x77], seed=5, batched=True
        )
        assert [p.proof for p in seq.board_proofs] == [p.proof for p in bat.board_proofs]
        assert [p.proof for p in seq.shot_proofs] == [p.proof for p in bat.shot_proofs]
        assert api.verify_session(bat)
