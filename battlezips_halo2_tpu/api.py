"""Public proving API — the framework's serving surface.

Semantic mirror of the reference's WASM bindings
(src/wasm/circuit_wasm.rs:34-195): ``prove_board`` / ``verify_board`` /
``prove_shot`` / ``verify_shot`` over plain Python data. Unlike the
reference (which regenerates params+keys on every call,
circuit_wasm.rs:57-62), keys are cached per (circuit, k) — the
checkpoint/artifact store the reference lacks (SURVEY.md §5.4).
"""

from __future__ import annotations

import secrets
from dataclasses import dataclass
from functools import lru_cache

from .circuits import BoardCircuit, ShotCircuit
from .fields.host import FQ
from .pcs.ipa import cached_params
from .plonk import create_proof, keygen, verify_proof
from .utils import BinaryValue, Board, Deck, serialize


@dataclass
class BoardProof:
    """Mirror of the BattleZipsWASM export struct (circuit_wasm.rs:27-31)."""

    commitment: tuple  # (x, y) ints
    proof: bytes


@lru_cache(maxsize=2)
def _board_keys():
    params = cached_params(BoardCircuit.K)
    pk = keygen(params, BoardCircuit([BinaryValue(1)] + [BinaryValue.empty()] * 9, BinaryValue(1), 1))
    return params, pk


@lru_cache(maxsize=2)
def _shot_keys():
    params = cached_params(ShotCircuit.K)
    pk = keygen(params, ShotCircuit(BinaryValue(1), 1, BinaryValue(1), BinaryValue(1)))
    return params, pk


def _rng():
    class _SecretsRng:
        def randrange(self, n):
            return secrets.randbelow(n)

    return _SecretsRng()


def prove_board(ships: list, trapdoor: int | None = None) -> BoardProof:
    """ships: 5 optional (x, y, z) tuples (circuit_wasm.rs:34-85)."""
    from .utils.pedersen import pedersen_commit

    board = Board.from_deck(Deck.from_placements(ships))
    if trapdoor is None:
        trapdoor = FQ.random()
    state = board.state()
    commitment = pedersen_commit(state.to_fp(), trapdoor)
    params, pk = _board_keys()
    circuit = BoardCircuit(board.witness(), state, trapdoor)
    proof = create_proof(params, pk, circuit, [[commitment[0], commitment[1]]], _rng())
    return BoardProof(commitment=commitment, proof=proof)


def verify_board(proof: BoardProof) -> bool:
    """Rebuilds vk from cached keys (circuit_wasm.rs:88-112)."""
    params, pk = _board_keys()
    return verify_proof(params, pk.vk, proof.proof, [[proof.commitment[0], proof.commitment[1]]])


@dataclass
class ShotProof:
    commitment: tuple  # board commitment (x, y)
    shot: int  # serialized shot bitfield
    hit: int  # 0/1
    proof: bytes


def prove_shot(board_state: BinaryValue, trapdoor: int, shot_xy: tuple, hit: bool) -> ShotProof:
    """Prove a hit/miss assertion against a committed board
    (circuit_wasm.rs:115-169)."""
    shot = serialize([shot_xy[0]], [shot_xy[1]])
    circuit = ShotCircuit(board_state, trapdoor, shot, BinaryValue(1 if hit else 0))
    params, pk = _shot_keys()
    instance = circuit.public_instance()
    proof = create_proof(params, pk, circuit, [instance], _rng())
    return ShotProof(
        commitment=(instance[0], instance[1]), shot=instance[2], hit=instance[3], proof=proof
    )


def verify_shot(proof: ShotProof) -> bool:
    params, pk = _shot_keys()
    instance = [proof.commitment[0], proof.commitment[1], proof.shot, proof.hit]
    return verify_proof(params, pk.vk, proof.proof, [instance])
