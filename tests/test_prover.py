"""Real-prover integration tests (the reference's `production` tests,
src/circuits/board.rs:879-933 / shot.rs:880-941, at framework level).

The fast tier proves small harness circuits end-to-end on the CPU backend;
the full k=11/k=12 shot/board production proofs run when BZ_RUN_SLOW=1
(they are also exercised by the bench/verify drives on real hardware)."""

import os
import random

import pytest

from battlezips_halo2_tpu.fields import FP
from battlezips_halo2_tpu.gadgets.common import with_selector
from battlezips_halo2_tpu.pcs.ipa import Params
from battlezips_halo2_tpu.plonk import Circuit, ConstraintSystem, create_proof, keygen, verify_proof

SLOW = os.environ.get("BZ_RUN_SLOW", "") not in ("", "0")


class MulCircuit(Circuit):
    def __init__(self, a, b, c):
        self.a, self.b, self.c = a, b, c

    @classmethod
    def configure(cls, cs: ConstraintSystem):
        a, b, c = cs.advice_column(), cs.advice_column(), cs.advice_column()
        inst = cs.instance_column()
        s = cs.selector()
        for col in (a, b, c):
            cs.enable_equality(col)
        cs.enable_equality(inst)
        cs.create_gate("mul", with_selector(s.expr(), [("a*b=c", a.cur() * b.cur() - c.cur())]))
        return (a, b, c, inst, s)

    def synthesize(self, config, layouter):
        a, b, c, inst, s = config

        def region(r):
            r.enable_selector("mul", s, 0)
            r.assign_advice("a", a, 0, self.a)
            r.assign_advice("b", b, 0, self.b)
            return r.assign_advice("c", c, 0, self.c)

        out = layouter.assign_region("mul", region)
        layouter.constrain_instance(out, inst, 0)

    def without_witnesses(self):
        return MulCircuit(1, 1, 1)


class LookupCircuit(Circuit):
    """Small circuit exercising the lookup argument end-to-end."""

    def __init__(self, values):
        self.values = values

    @classmethod
    def configure(cls, cs: ConstraintSystem):
        a = cs.advice_column()
        cs.enable_equality(a)
        table = cs.lookup_table_column()
        s = cs.selector()
        cs.lookup("in-table", [(s.expr() * a.cur(), table.inner.cur())])
        return (a, table, s)

    def synthesize(self, config, layouter):
        a, table, s = config

        def table_fn(t):
            for i in range(16):
                t.assign_cell(f"t{i}", table, i, i)

        layouter.assign_table("table", table_fn)

        def region(r):
            for i, v in enumerate(self.values):
                r.enable_selector("lk", s, i)
                r.assign_advice("a", a, i, v)

        layouter.assign_region("values", region)

    def without_witnesses(self):
        return LookupCircuit([0] * len(self.values))


@pytest.fixture(scope="module")
def params_k5():
    return Params.new(5)


@pytest.fixture(scope="module")
def params_k6():
    return Params.new(6)


class TestMulProof:
    def test_prove_verify_roundtrip(self, params_k5):
        pk = keygen(params_k5, MulCircuit(1, 1, 1))
        rng = random.Random(42)
        proof = create_proof(params_k5, pk, MulCircuit(3, 5, 15), [[15]], rng)
        assert verify_proof(params_k5, pk.vk, proof, [[15]])

    def test_wrong_instance_rejected(self, params_k5):
        pk = keygen(params_k5, MulCircuit(1, 1, 1))
        proof = create_proof(params_k5, pk, MulCircuit(3, 5, 15), [[15]], random.Random(1))
        assert not verify_proof(params_k5, pk.vk, proof, [[16]])

    def test_corrupted_proof_rejected(self, params_k5):
        pk = keygen(params_k5, MulCircuit(1, 1, 1))
        proof = create_proof(params_k5, pk, MulCircuit(3, 5, 15), [[15]], random.Random(2))
        for offset in (0, len(proof) // 2, len(proof) - 1):
            bad = bytearray(proof)
            bad[offset] ^= 1
            try:
                ok = verify_proof(params_k5, pk.vk, bytes(bad), [[15]])
            except (ValueError, AssertionError):
                ok = False
            assert not ok

    def test_proofs_are_randomized(self, params_k5):
        """Two proofs of the same statement differ (ZK blinding)."""
        pk = keygen(params_k5, MulCircuit(1, 1, 1))
        p1 = create_proof(params_k5, pk, MulCircuit(3, 5, 15), [[15]], random.Random(1))
        p2 = create_proof(params_k5, pk, MulCircuit(3, 5, 15), [[15]], random.Random(2))
        assert p1 != p2
        assert verify_proof(params_k5, pk.vk, p1, [[15]])
        assert verify_proof(params_k5, pk.vk, p2, [[15]])

    def test_deterministic_with_seeded_rng(self, params_k5):
        """Same RNG seed -> bit-identical proof (SURVEY.md §7.3 item 1:
        injectable RNG for reproducible proof vectors)."""
        pk = keygen(params_k5, MulCircuit(1, 1, 1))
        p1 = create_proof(params_k5, pk, MulCircuit(3, 5, 15), [[15]], random.Random(7))
        p2 = create_proof(params_k5, pk, MulCircuit(3, 5, 15), [[15]], random.Random(7))
        assert p1 == p2


class TestLookupProof:
    def test_lookup_satisfied(self, params_k6):
        pk = keygen(params_k6, LookupCircuit([0] * 4))
        proof = create_proof(params_k6, pk, LookupCircuit([1, 3, 3, 15]), [], random.Random(3))
        assert verify_proof(params_k6, pk.vk, proof, [])

    def test_lookup_violation_unprovable(self, params_k6):
        pk = keygen(params_k6, LookupCircuit([0] * 4))
        with pytest.raises(ValueError, match="not found in table"):
            create_proof(params_k6, pk, LookupCircuit([1, 99, 3, 15]), [], random.Random(3))


@pytest.mark.skipif(not SLOW, reason="set BZ_RUN_SLOW=1 for production circuit proofs")
class TestProduction:
    def test_shot_production(self):
        from battlezips_halo2_tpu.circuits import ShotCircuit
        from battlezips_halo2_tpu.pcs.ipa import cached_params
        from battlezips_halo2_tpu.utils import BinaryValue, Board, Deck, serialize

        board = Board.from_deck(
            Deck.from_placements([(3, 3, True), (5, 4, False), (0, 1, False), (0, 5, True), (6, 1, False)])
        )
        circuit = ShotCircuit(board.state(), 0xBEEF, serialize([3], [3]), BinaryValue(1))
        params = cached_params(11)
        pk = keygen(params, circuit)
        proof = create_proof(params, pk, circuit, [circuit.public_instance()], random.Random(1))
        assert verify_proof(params, pk.vk, proof, [circuit.public_instance()])
        bad = circuit.public_instance()
        bad[3] = 1 - bad[3]
        assert not verify_proof(params, pk.vk, proof, [bad])

    def test_board_production(self):
        from battlezips_halo2_tpu.circuits import BoardCircuit
        from battlezips_halo2_tpu.pcs.ipa import cached_params
        from battlezips_halo2_tpu.utils import Board, Deck, pedersen_commit

        board = Board.from_deck(
            Deck.from_placements([(3, 3, True), (5, 4, False), (0, 1, False), (0, 5, True), (6, 1, False)])
        )
        trapdoor = 0x1234
        commitment = pedersen_commit(board.state().to_fp(), trapdoor)
        circuit = BoardCircuit(board.witness(), board.state(), trapdoor)
        params = cached_params(12)
        pk = keygen(params, circuit)
        proof = create_proof(params, pk, circuit, [[commitment[0], commitment[1]]], random.Random(1))
        assert verify_proof(params, pk.vk, proof, [[commitment[0], commitment[1]]])


@pytest.mark.skipif(not SLOW, reason="set BZ_RUN_SLOW=1 for the session API round trip")
class TestSessionAPI:
    def test_session_round_trip(self):
        """Batched game-session API (BASELINE config 5, minimal scale):
        1 board proof + 2 shot proofs through api.prove_session, all
        verifying; a tampered shot proof rejects."""
        from battlezips_halo2_tpu import api

        placements = [(3, 3, True), (5, 4, False), (0, 1, False), (0, 5, True), (6, 1, False)]
        session = api.prove_session([placements], shots_per_game=2)
        assert len(session.board_proofs) == 1 and len(session.shot_proofs) == 2
        assert api.verify_session(session)
        sp = session.shot_proofs[0]
        session.shot_proofs[0] = api.ShotProof(
            commitment=sp.commitment,
            shot=sp.shot,
            hit=1 - sp.hit,
            proof=sp.proof,
        )
        assert not api.verify_session(session)

    def test_session_pipelined_workers(self):
        """workers=2 pipelines independent proofs across threads (proof-
        batch PP); results must verify exactly like the serial path."""
        from battlezips_halo2_tpu import api

        placements = [(3, 3, True), (5, 4, False), (0, 1, False), (0, 5, True), (6, 1, False)]
        session = api.prove_session([placements], shots_per_game=2, workers=2)
        assert api.verify_session(session)
