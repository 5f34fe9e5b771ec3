#!/usr/bin/env python
"""End-to-end BattleZips demo: commit a board, prove its legality, then
prove hits/misses against the commitment — all through the public API.

Run:  python examples/demo.py  (first run generates/caches SRS + keys)
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from battlezips_halo2_tpu import api
from battlezips_halo2_tpu.utils import Board, Deck
from battlezips_halo2_tpu.fields.host import FQ


def main():
    ships = [(3, 3, True), (5, 4, False), (0, 1, False), (0, 5, True), (6, 1, False)]
    board = Board.from_deck(Deck.from_placements(ships))
    print("Player one's secret board:")
    print(board.render())

    trapdoor = FQ.random()

    print("\nProving board legality (k=12 PLONK proof over the IPA PCS)...")
    t0 = time.time()
    board_proof = api.prove_board(ships, trapdoor)
    print(f"  proved in {time.time() - t0:.1f}s, proof = {len(board_proof.proof)} bytes")
    print(f"  commitment = ({hex(board_proof.commitment[0])[:18]}..., ...)")

    t0 = time.time()
    assert api.verify_board(board_proof)
    print(f"  verified in {time.time() - t0:.1f}s")

    state = board.state()
    for (x, y) in [(3, 3), (9, 9)]:
        hit = state.bit(y * 10 + x)
        print(f"\nOpponent fires at ({x}, {y}) — proving {'HIT' if hit else 'MISS'}...")
        t0 = time.time()
        shot_proof = api.prove_shot(state, trapdoor, (x, y), hit)
        print(f"  proved in {time.time() - t0:.1f}s")
        assert api.verify_shot(shot_proof)
        print("  verified — the assertion is cryptographically binding to the committed board")

    print("\nDemo complete.")


if __name__ == "__main__":
    main()
