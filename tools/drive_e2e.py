"""End-to-end drive of the public API on the default (TPU) platform.

Exercises the /verify recipe: domain flow + commitment cross-check, device
mont_mul vs host bit-exactness, shot prove/verify round trip with a
tampered-proof rejection probe, and malicious-witness probes.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    t_start = time.time()
    import jax

    print(f"[drive] backend: {jax.default_backend()}, devices: {jax.devices()}")

    # --- 1. domain flow + commitment cross-check ---------------------------
    from battlezips_halo2_tpu.utils.deck import Deck
    from battlezips_halo2_tpu.utils.board import Board
    from battlezips_halo2_tpu.utils.pedersen import pedersen_commit
    from battlezips_halo2_tpu.utils import constants as C
    from battlezips_halo2_tpu.curves import PALLAS

    placements = [(0, 0, False), (0, 1, False), (0, 2, False), (0, 3, False), (0, 4, False)]
    deck = Deck.from_placements(placements)
    board = Board.from_deck(deck)
    state = board.state()
    trapdoor = 12345678901234567890
    com = pedersen_commit(state.to_fp(), trapdoor)
    v_gen, r_gen = C.BOARD_COMMIT_V_GENERATOR, C.BOARD_COMMIT_R_GENERATOR
    expected = PALLAS.add(PALLAS.mul(v_gen, state.to_fp()), PALLAS.mul(r_gen, trapdoor))
    assert com == expected, "pedersen_commit mismatch vs raw generator math"
    print(f"[drive] domain flow + commitment cross-check OK ({time.time()-t_start:.1f}s)")

    # --- 2. device mont_mul vs host -----------------------------------------
    import random

    from battlezips_halo2_tpu.fields import FP, limb as L
    from battlezips_halo2_tpu.fields.limb import FP_SPEC

    rng = random.Random(7)
    xs = [rng.randrange(FP.modulus) for _ in range(1024)]
    ys = [rng.randrange(FP.modulus) for _ in range(1024)]
    r_inv = pow(1 << 256, -1, FP.modulus)
    a = L.ints_to_limbs(xs)
    b = L.ints_to_limbs(ys)
    got = L.limbs_to_ints(np.asarray(jax.jit(lambda a, b: L.mont_mul(FP_SPEC, a, b))(a, b)))
    exp = [x * y * r_inv % FP.modulus for x, y in zip(xs, ys)]
    assert got == exp, "device mont_mul != host"
    print(f"[drive] device mont_mul bit-exact over 1024 lanes OK ({time.time()-t_start:.1f}s)")

    # --- 3. shot proof round trip + tamper probe ----------------------------
    from battlezips_halo2_tpu import api

    t0 = time.time()
    sp = api.prove_shot(state, trapdoor, (3, 0), True)
    t_prove = time.time() - t0
    t0 = time.time()
    assert api.verify_shot(sp), "shot proof failed to verify"
    t_verify = time.time() - t0
    print(f"[drive] shot prove {t_prove:.1f}s verify {t_verify:.1f}s OK")

    bad = bytearray(sp.proof)
    bad[len(bad) // 2] ^= 1
    import dataclasses

    sp_bad = dataclasses.replace(sp, proof=bytes(bad))
    assert not api.verify_shot(sp_bad), "tampered proof verified!"
    print("[drive] tampered-proof rejection OK")

    # --- 4. malicious witness probes ----------------------------------------
    from battlezips_halo2_tpu.utils.ship import WitnessOption
    from battlezips_halo2_tpu.utils.binary import BinaryValue

    w_ok = board.witness()
    w_bad = board.witness(tuple([WitnessOption.OVERSIZED] * 5))
    assert any(a.value != b.value for a, b in zip(w_ok, w_bad)), "malicious witness is a no-op"
    try:
        BinaryValue.empty().with_bit(0, True).zip(BinaryValue.empty().with_bit(0, True))
        raise AssertionError("overlapping zip did not raise")
    except Exception:
        pass
    print("[drive] malicious-witness + overlap probes OK")
    print(f"[drive] ALL OK in {time.time()-t_start:.1f}s")


if __name__ == "__main__":
    main()
