#!/usr/bin/env python
"""Verify drive: end-to-end exercise of the public API on the default
(real TPU) platform with the round-4 adaptive proof engine.

Covers the skill recipe: domain flow + commitment cross-check, board/shot
prove/verify round trips (adaptive engine: native latency tier at k=11/12),
device mont_mul bit-exactness vs the host layer, engine cross-checks
(host vs device transform bit-equality on chip), and the adversarial
probes (malicious witnesses, overlap zip, tampered proof byte)."""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import numpy as np


def check(name, ok):
    print(("PASS" if ok else "FAIL"), name, flush=True)
    if not ok:
        sys.exit(1)


def main():
    t_start = time.time()
    print("backend:", jax.default_backend(), jax.devices())

    # --- 1. domain flow + commitment cross-check ---------------------------
    from battlezips_halo2_tpu.utils import BinaryValue, Board, Deck
    from battlezips_halo2_tpu.utils.pedersen import (
        BOARD_COMMIT_R_GENERATOR,
        BOARD_COMMIT_V_GENERATOR,
        lift_to_scalar,
        pedersen_commit,
    )
    from battlezips_halo2_tpu.curves.host import PALLAS
    from battlezips_halo2_tpu.fields.host import FQ

    deck = Deck.from_placements(
        [(3, 3, True), (5, 4, False), (0, 1, False), (0, 5, True), (6, 1, False)]
    )
    board = Board.from_deck(deck)
    state = board.state()
    check("board has 17 occupied cells", bin(state.value).count("1") == 17)
    trapdoor = 0xBEEF
    cx, cy = pedersen_commit(state.to_fp(), trapdoor)
    v_part = PALLAS.mul(BOARD_COMMIT_V_GENERATOR, lift_to_scalar(state.to_fp()))
    r_part = PALLAS.mul(BOARD_COMMIT_R_GENERATOR, trapdoor % FQ.modulus)
    check("pedersen == [m]V + [r]R", PALLAS.add(v_part, r_part) == (cx, cy))

    # --- 2. device kernel bit-exactness ------------------------------------
    import jax.numpy as jnp
    from battlezips_halo2_tpu.fields import limb as L
    from battlezips_halo2_tpu.fields.host import FP
    from battlezips_halo2_tpu.fields.limb import FP_SPEC

    rng = random.Random(9)
    xs = [rng.randrange(FP.modulus) for _ in range(4096)]
    ys = [rng.randrange(FP.modulus) for _ in range(4096)]
    xm = jnp.asarray(L.to_mont(FP_SPEC, L.ints_to_limbs(xs)))
    ym = jnp.asarray(L.to_mont(FP_SPEC, L.ints_to_limbs(ys)))
    out = np.asarray(jax.jit(lambda a, b: L.from_mont(FP_SPEC, L.mont_mul(FP_SPEC, a, b)))(xm, ym))
    got = L.limbs_to_ints(out)
    check("device mont_mul batch == host", got == [x * y % FP.modulus for x, y in zip(xs, ys)])

    # --- 3. engine cross-check on this very backend ------------------------
    from battlezips_halo2_tpu.poly import transforms as T
    from battlezips_halo2_tpu.poly.domain import EvaluationDomain

    dom = EvaluationDomain(8, 3)
    cols = [[rng.randrange(FP.modulus) for _ in range(dom.n)] for _ in range(2)]
    os.environ["BZ_PROOF_ENGINE"] = "host"
    host_out = T.batch_lagrange_to_coeff(dom, cols)
    os.environ["BZ_PROOF_ENGINE"] = "device"
    dev_out = T.batch_lagrange_to_coeff(dom, cols)
    os.environ["BZ_PROOF_ENGINE"] = "auto"
    check("host vs device iNTT bit-equal on chip", host_out == dev_out)

    # --- 4. proof flow: shot + board round trips (adaptive engine) ---------
    from battlezips_halo2_tpu import api

    t0 = time.time()
    shot_res = api.prove_shot(state, trapdoor, (3, 3), True)
    print(f"prove_shot: {time.time() - t0:.2f}s")
    check("shot proof verifies", api.verify_shot(shot_res))
    t0 = time.time()
    board_res = api.prove_board([(3, 3, True), (5, 4, False), (0, 1, False), (0, 5, True), (6, 1, False)], trapdoor=trapdoor)
    print(f"prove_board: {time.time() - t0:.2f}s")
    check("board proof verifies", api.verify_board(board_res))

    # --- 5. adversarial probes ---------------------------------------------
    bad = bytearray(board_res.proof)
    bad[len(bad) // 2] ^= 1
    import dataclasses

    tampered = dataclasses.replace(board_res, proof=bytes(bad))
    check("tampered board proof rejected", not api.verify_board(tampered))

    from battlezips_halo2_tpu.utils.ship import WitnessOption

    ship = next(s for s in deck.iterator() if s is not None)
    normal = ship.witness()
    evil = ship.witness(WitnessOption.OVERSIZED)
    check("malicious witness differs", normal != evil)
    try:
        BinaryValue(0b11).zip(BinaryValue(0b10))
        check("overlap zip raises", False)
    except Exception:
        check("overlap zip raises", True)

    print(f"ALL CHECKS PASSED ({time.time() - t_start:.1f}s total)")


if __name__ == "__main__":
    main()
