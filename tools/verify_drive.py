#!/usr/bin/env python
"""End-to-end drive on the REAL TPU (verify skill recipe).

Exercises, on the default (axon/TPU) platform:
  1. domain flow + off-circuit Pedersen commitment;
  2. device kernels: mont_mul batch and the Pippenger MSM (the changed
     ops/msm.py path) bit-exact vs the host layer;
  3. a full prove/verify roundtrip through the VM-bytecode quotient
     evaluator (ops/gate_eval.py), plus tamper rejection.

Run from the repo root: python tools/verify_drive.py
"""

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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np

print(f"backend: {jax.default_backend()}, devices: {jax.devices()}", flush=True)

# ---- 1. domain flow + Pedersen ------------------------------------------
from battlezips_halo2_tpu.utils import BinaryValue, Board, Deck, serialize
from battlezips_halo2_tpu.utils.pedersen import pedersen_commit

deck = Deck.from_placements([(3, 3, True), (5, 4, False), (0, 1, False), (0, 5, True), (6, 1, False)])
board = Board.from_deck(deck)
state = board.state()
commitment = pedersen_commit(state.to_fp(), 0xBEEF)
assert commitment is not None
print("domain + pedersen ok:", hex(commitment[0])[:18], flush=True)

# ---- 2. device kernels ----------------------------------------------------
from battlezips_halo2_tpu.fields import FP, FP_SPEC, ints_to_limbs, limbs_to_ints
from battlezips_halo2_tpu.fields import limb as L

rng = random.Random(1234)
xs = [rng.randrange(FP.modulus) for _ in range(256)]
ys = [rng.randrange(FP.modulus) for _ in range(256)]
a = L.to_mont(FP_SPEC, ints_to_limbs(xs))
b = L.to_mont(FP_SPEC, ints_to_limbs(ys))
t0 = time.time()
out = jax.jit(lambda a, b: L.from_mont(FP_SPEC, L.mont_mul(FP_SPEC, a, b)))(a, b)
got = limbs_to_ints(np.asarray(out))
assert got == [x * y % FP.modulus for x, y in zip(xs, ys)], "mont_mul mismatch"
print(f"mont_mul 256-batch bit-exact on {jax.default_backend()} ({time.time()-t0:.1f}s)", flush=True)

from battlezips_halo2_tpu.curves import VESTA
from battlezips_halo2_tpu.ops.msm import msm
from battlezips_halo2_tpu.pcs.ipa import cached_params

n = 1 << 10
pts = cached_params(10).g
sc = [rng.randrange(VESTA.scalar.modulus) for _ in range(n)]
t0 = time.time()
got = msm(VESTA, pts, sc, force_device=True)
assert got == VESTA.pippenger(pts, sc), "device MSM mismatch vs host Pippenger"
print(f"MSM 2^10 device == host Pippenger ({time.time()-t0:.1f}s)", flush=True)

# ---- 3. proof roundtrip through the VM quotient evaluator ----------------
from battlezips_halo2_tpu.pcs.ipa import Params
from battlezips_halo2_tpu.plonk import create_proof, keygen, verify_proof

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
from test_prover import LookupCircuit, MulCircuit

params = Params.new(6)
circuit = LookupCircuit([3, 7, 7, 1, 15, 0])
pk = keygen(params, circuit)
ev = getattr(pk.vk, "_quotient_evaluator", None)
t0 = time.time()
proof = create_proof(params, pk, circuit, [[]], random.Random(7))
ev = getattr(pk.vk, "_quotient_evaluator", None)
assert ev is not None, "device quotient evaluator not used"
print(f"lookup proof created via VM quotient (prog={ev.vm_size[0]} ops, "
      f"{ev.vm_size[1]} regs) in {time.time()-t0:.1f}s", flush=True)
assert verify_proof(params, pk.vk, proof, [[]]), "proof must verify"
bad = bytearray(proof)
bad[len(bad) // 2] ^= 1
assert not verify_proof(params, pk.vk, bytes(bad), [[]]), "tampered proof must fail"

params5 = Params.new(5)
pk5 = keygen(params5, MulCircuit(3, 5, 15))
proof5 = create_proof(params5, pk5, MulCircuit(3, 5, 15), [[15]], random.Random(9))
assert verify_proof(params5, pk5.vk, proof5, [[15]])
assert not verify_proof(params5, pk5.vk, proof5, [[16]]), "wrong instance must fail"
print("mul proof + instance tamper rejection ok", flush=True)

print("VERIFY DRIVE: ALL OK", flush=True)
