#!/usr/bin/env python
"""Generate the frozen proof-byte golden vectors (tests/golden/*.json).

VERDICT r2 #8: pin vk digest, exact proof length and full seeded proof
bytes for MulCircuit (k=5), ShotCircuit (k=11) and BoardCircuit (k=12) as
in-repo regression vectors. Proof bytes are deterministic given the seeded
blinding rng and are backend-independent (the device quotient evaluator is
bit-identical to the host path — tests/test_prover.py), so vectors frozen
on CPU must keep matching TPU-produced proofs. PARITY.md records what a
future rust-oracle run must confirm about these bytes.

Usage: python tools/make_golden.py [mul shot board]
"""

import json
import os
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_platform = "cpu" if os.environ.get("BZ_FORCE_CPU") else "tpu"
from battlezips_halo2_tpu.utils.jaxcache import configure as _configure_cache  # noqa: E402

_configure_cache(jax, _REPO, _platform)
if _platform == "cpu":
    # proofs are backend-independent (device quotient bit-identical to host);
    # CPU generation keeps the relay free and is deterministic offline
    jax.config.update("jax_platforms", "cpu")

GOLDEN = Path(__file__).resolve().parent.parent / "tests" / "golden"

SEED = 7


def write(name, k, vk, params, proof, instance):
    from battlezips_halo2_tpu.plonk.format import proof_size

    expect = proof_size(vk, params)
    assert len(proof) == expect, (name, len(proof), expect)
    GOLDEN.mkdir(exist_ok=True)
    (GOLDEN / f"{name}.json").write_text(
        json.dumps(
            {
                "circuit": name,
                "k": k,
                "seed": SEED,
                "vk_digest": hex(vk.digest),
                "proof_len": len(proof),
                "proof_hex": proof.hex(),
                "instance": [[hex(v) for v in col] for col in instance],
            },
            indent=1,
        )
    )
    print(f"{name}: k={k} proof_len={len(proof)} vk_digest={hex(vk.digest)[:18]}...", flush=True)


def make_mul():
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
    from test_prover import MulCircuit

    from battlezips_halo2_tpu.pcs.ipa import Params, cached_params
    from battlezips_halo2_tpu.plonk import create_proof, keygen, verify_proof
    from battlezips_halo2_tpu.plonk.pinned import pinned_vk_text

    # frozen pinned-vk text (tests/test_pinned.py) — regenerated together
    # with the proof vectors so digest and bytes can never drift apart
    pk3 = keygen(Params.new(3), MulCircuit(1, 1, 1))
    (GOLDEN / "pinned_mul_k3.txt").write_text(pinned_vk_text(pk3.vk))
    print("pinned_mul_k3.txt written", flush=True)

    params = cached_params(5)
    pk = keygen(params, MulCircuit(1, 1, 1))
    proof = create_proof(params, pk, MulCircuit(3, 5, 15), [[15]], random.Random(SEED))
    assert verify_proof(params, pk.vk, proof, [[15]])
    write("mul_k5", 5, pk.vk, params, proof, [[15]])


def make_shot():
    from battlezips_halo2_tpu.circuits import ShotCircuit
    from battlezips_halo2_tpu.pcs.ipa import cached_params
    from battlezips_halo2_tpu.plonk import create_proof, keygen, verify_proof
    from battlezips_halo2_tpu.utils import BinaryValue, Board, Deck, serialize

    board = Board.from_deck(
        Deck.from_placements([(3, 3, True), (5, 4, False), (0, 1, False), (0, 5, True), (6, 1, False)])
    )
    circuit = ShotCircuit(board.state(), 0xBEEF, serialize([3], [3]), BinaryValue(1))
    params = cached_params(11)
    pk = keygen(params, circuit)
    instance = [circuit.public_instance()]
    proof = create_proof(params, pk, circuit, instance, random.Random(SEED))
    assert verify_proof(params, pk.vk, proof, instance)
    write("shot_k11", 11, pk.vk, params, proof, instance)


def make_board():
    from battlezips_halo2_tpu.circuits import BoardCircuit
    from battlezips_halo2_tpu.pcs.ipa import cached_params
    from battlezips_halo2_tpu.plonk import create_proof, keygen, verify_proof
    from battlezips_halo2_tpu.utils import Board, Deck
    from battlezips_halo2_tpu.utils.pedersen import pedersen_commit

    board = Board.from_deck(
        Deck.from_placements([(3, 3, True), (5, 4, False), (0, 1, False), (0, 5, True), (6, 1, False)])
    )
    state = board.state()
    commitment = pedersen_commit(state.to_fp(), 0xBEEF)
    instance = [[commitment[0], commitment[1]]]
    circuit = BoardCircuit(board.witness(), state, 0xBEEF)
    params = cached_params(12)
    pk = keygen(params, circuit)
    proof = create_proof(params, pk, circuit, instance, random.Random(SEED))
    assert verify_proof(params, pk.vk, proof, instance)
    write("board_k12", 12, pk.vk, params, proof, instance)


if __name__ == "__main__":
    which = sys.argv[1:] or ["mul", "shot", "board"]
    for name in which:
        t0 = time.time()
        {"mul": make_mul, "shot": make_shot, "board": make_board}[name]()
        print(f"  ({time.time() - t0:.0f} s)", flush=True)
