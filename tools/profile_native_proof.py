"""Per-phase + cProfile breakdown of the native-engine proof pipeline.

Forces the CPU jax backend (never touches the relay) and the auto engine,
which at k=11/12 routes all polynomial work to csrc/pasta.cpp. Used to
locate the host-side costs a batch-amortized prover must attack
(VERDICT r4 next-steps #1).

Usage: python tools/profile_native_proof.py [shot|board|both] [reps]
"""

import cProfile
import io
import os
import pstats
import random
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("BZ_TPU_TRACE", "1")
import jax

jax.config.update("jax_platforms", "cpu")

from battlezips_halo2_tpu import api


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "shot"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    ships = [(0, 0, False), (9, 1, True), (2, 2, False), (3, 4, True), (5, 5, False)]

    if which in ("board", "both"):
        api._board_keys()
        for i in range(reps):
            t0 = time.time()
            p = api.prove_board(ships, trapdoor=12345, rng=random.Random(i))
            print(f"board proof {i}: {time.time()-t0:.3f}s")
        t0 = time.time()
        assert api.verify_board(p)
        print(f"board verify: {time.time()-t0:.3f}s")

    if which in ("shot", "both"):
        from battlezips_halo2_tpu.utils import Board, Deck

        api._shot_keys()
        state = Board.from_deck(Deck.from_placements(ships)).state()
        for i in range(reps):
            t0 = time.time()
            p = api.prove_shot(state, 777, (0, 0), True, rng=random.Random(i))
            print(f"shot proof {i}: {time.time()-t0:.3f}s")
        # cProfile the last one
        pr = cProfile.Profile()
        pr.enable()
        p = api.prove_shot(state, 777, (0, 0), True, rng=random.Random(99))
        pr.disable()
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(35)
        print(s.getvalue())
        t0 = time.time()
        assert api.verify_shot(p)
        print(f"shot verify: {time.time()-t0:.3f}s")


if __name__ == "__main__":
    main()
