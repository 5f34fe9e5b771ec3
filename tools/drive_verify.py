"""End-to-end drive of the public API on the real TPU (verify recipe).

Covers: domain flow, Pedersen commitment cross-check, device kernel
bit-exactness (mont_mul + msm + msm_many), a full shot-proof round trip
with tamper rejection, and malicious-witness probes.
"""

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

print("backend:", jax.default_backend(), jax.devices())

# ---- 1. domain flow ---------------------------------------------------------
from battlezips_halo2_tpu.curves.host import PALLAS
from battlezips_halo2_tpu.utils import BinaryValue, Board, Deck, pedersen_commit, serialize
from battlezips_halo2_tpu.utils.constants import BOARD_COMMIT_R_GENERATOR as BOARD_COMMIT_R, BOARD_COMMIT_V_GENERATOR as BOARD_COMMIT_V

deck = Deck.from_placements([(3, 3, True), (5, 4, False), (0, 1, False), (0, 5, True), (6, 1, False)])
board = Board.from_deck(deck)
state = board.state()
trapdoor = 0x1234_5678_9ABC
comm = pedersen_commit(state.to_fp(), trapdoor)
manual = PALLAS.add(PALLAS.mul(BOARD_COMMIT_V, state.to_fp()), PALLAS.mul(BOARD_COMMIT_R, trapdoor))
assert comm == manual, "pedersen_commit mismatch vs raw generator math"
print("1. domain flow + pedersen cross-check OK")

# ---- 2. malicious witness probes -------------------------------------------
from battlezips_halo2_tpu.utils.ship import WitnessOption

w_def = board.witness()
w_bad = board.witness([WitnessOption.OVERSIZED] * 5)
assert any(a.value != b.value for a, b in zip(w_def, w_bad)), "oversized witness did not change"
try:
    BinaryValue(0b11).zip(BinaryValue(0b10))
    raise SystemExit("zip overlap not rejected")
except ValueError:
    pass
print("2. malicious witness + overlap probes OK")

# ---- 3. device kernels bit-exact -------------------------------------------
from battlezips_halo2_tpu.fields import FP, FP_SPEC, ints_to_limbs, limbs_to_ints
from battlezips_halo2_tpu.fields import limb as L

rng = random.Random(9)
xs = [rng.randrange(FP.modulus) for _ in range(256)]
ys = [rng.randrange(FP.modulus) for _ in range(256)]
r = FP_SPEC.r_mod_p
a = ints_to_limbs([x * r % FP.modulus for x in xs])
b = ints_to_limbs([y * r % FP.modulus for y in ys])
out = jax.jit(lambda a, b: L.mont_mul(FP_SPEC, a, b))(a, b)
got = limbs_to_ints(np.asarray(L.from_mont(FP_SPEC, out)))
want = [x * y % FP.modulus for x, y in zip(xs, ys)]
assert got == want, "device mont_mul mismatch"
print("3a. mont_mul bit-exact on", jax.default_backend())

from battlezips_halo2_tpu.curves.host import VESTA
from battlezips_halo2_tpu.ops.msm import msm, msm_many

pts = [VESTA.mul(VESTA.generator, rng.randrange(1, 1 << 60)) for _ in range(256)]
sc = [rng.randrange(VESTA.scalar.modulus) for _ in range(256)]
t0 = time.time()
assert msm(VESTA, pts, sc, force_device=True) == VESTA.pippenger(pts, sc), "device msm mismatch"
print("3b. msm (2^8) bit-exact, %.1fs" % (time.time() - t0))
sc_list = [[rng.randrange(VESTA.scalar.modulus) for _ in range(256)] for _ in range(5)]
t0 = time.time()
outs = msm_many(VESTA, pts, sc_list, force_device=True)
for o, s in zip(outs, sc_list):
    assert o == VESTA.pippenger(pts, s), "msm_many mismatch"
print("3c. msm_many (5x2^8, vmapped) bit-exact, %.1fs" % (time.time() - t0))

# ---- 4. proof round trip on device -----------------------------------------
from battlezips_halo2_tpu.api import prove_shot, verify_shot

hit = bool(state.bit(3 * 10 + 3))
t0 = time.time()
res = prove_shot(state, trapdoor, (3, 3), hit)
print("4a. prove_shot (hit=%s): %.1fs" % (hit, time.time() - t0))
t0 = time.time()
assert verify_shot(res), "shot proof did not verify"
print("4b. verify_shot OK: %.1fs" % (time.time() - t0))
bad = bytearray(res.proof)
bad[len(bad) // 2] ^= 1
import dataclasses

res_bad = dataclasses.replace(res, proof=bytes(bad))
assert not verify_shot(res_bad), "tampered proof accepted!"
print("4c. tampered proof rejected")
print("DRIVE OK")
