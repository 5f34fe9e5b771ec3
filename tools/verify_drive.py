#!/usr/bin/env python
"""End-to-end verify drive on the real TPU (.claude/skills/verify recipe):
domain flow, device kernels (mont_mul + signed MSM), adversarial probes, and
a shot-proof round trip with tamper rejection."""

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

print(f"backend={jax.default_backend()} devices={jax.devices()}", flush=True)
t_start = time.time()


def ok(name):
    print(f"  ok: {name}  [{time.time() - t_start:.0f}s]", flush=True)


# ---- 1. domain flow ------------------------------------------------------
from battlezips_halo2_tpu.utils.board import Board
from battlezips_halo2_tpu.utils.deck import Deck
from battlezips_halo2_tpu.utils.pedersen import pedersen_commit
from battlezips_halo2_tpu.utils.ship import DEFAULT_WITNESS_OPTIONS, WitnessOption

placements = [(0, 0, False), (0, 1, False), (0, 2, False), (0, 3, False), (0, 4, False)]
deck = Deck.from_placements(placements)
board = Board.from_deck(deck)
state = board.state(DEFAULT_WITNESS_OPTIONS)
trapdoor = 0x1234567890ABCDEF
commitment = pedersen_commit(state.to_fp(), trapdoor)
assert commitment is not None
ok("domain flow: deck -> board -> state -> pedersen commitment")

# malicious witness options must alter the witness
wit_good = board.witness(DEFAULT_WITNESS_OPTIONS)
wit_bad = board.witness([WitnessOption.OVERSIZED] + list(DEFAULT_WITNESS_OPTIONS[1:]))
assert any(a.value != b.value for a, b in zip(wit_good, wit_bad))
ok("probe: malicious WitnessOption changes witness")

from battlezips_halo2_tpu.utils.binary import BinaryValue

try:
    BinaryValue.from_fp(1).zip(BinaryValue.from_fp(1))
    raise AssertionError("overlap zip must raise")
except ValueError:
    ok("probe: BinaryValue.zip overlap raises")

# ---- 2. device kernels ---------------------------------------------------
from battlezips_halo2_tpu.curves import VESTA
from battlezips_halo2_tpu.fields import FP, FP_SPEC, ints_to_limbs
from battlezips_halo2_tpu.fields import limb as L

rng = random.Random(7)
xs = [rng.randrange(FP.modulus) for _ in range(512)]
ys = [rng.randrange(FP.modulus) for _ in range(512)]
a = L.to_mont(FP_SPEC, ints_to_limbs(xs))
b = L.to_mont(FP_SPEC, ints_to_limbs(ys))
got = L.limbs_to_ints(np.asarray(L.from_mont(FP_SPEC, jax.jit(lambda a, b: L.mont_mul(FP_SPEC, a, b))(a, b))))
assert got == [x * y % FP.modulus for x, y in zip(xs, ys)], "device mont_mul mismatch"
ok("device mont_mul bit-exact vs host (512 lanes, real TPU)")

# signed MSM on device vs host-exact Pippenger
from battlezips_halo2_tpu.ops.msm import msm

pts = [VESTA.mul(VESTA.generator, rng.randrange(1, VESTA.scalar.modulus)) for _ in range(128)]
sc = [rng.randrange(VESTA.scalar.modulus) for _ in range(128)]
want = VESTA.pippenger(pts, sc)
got = msm(VESTA, pts, sc, c=None, force_device=True)
assert got == want, "device MSM mismatch"
ok("device MSM (auto window) bit-exact vs host Pippenger")

# fused lagrange-commit (the production TPU prover's commitment path,
# plonk/prover.py -> pcs/ipa.commit_lagrange_many) bit-identical to the
# two-step batch_lagrange_to_coeff + commit_many pipeline ON CHIP
from battlezips_halo2_tpu.pcs.ipa import Params, commit_lagrange_many, commit_many
from battlezips_halo2_tpu.poly.domain import EvaluationDomain
from battlezips_halo2_tpu.poly.transforms import batch_lagrange_to_coeff

fc_params = Params.new(8)
fc_domain = EvaluationDomain(8, 2)
fc_vals = [[rng.randrange(FP.modulus) for _ in range(fc_domain.n)] for _ in range(3)]
fc_blinds = [rng.randrange(FP.modulus) for _ in range(3)]
fc_polys, fc_points = commit_lagrange_many(fc_params, fc_domain, fc_vals, fc_blinds)
ref_polys = batch_lagrange_to_coeff(fc_domain, fc_vals)
ref_points = commit_many(fc_params, ref_polys, fc_blinds)
assert fc_polys == ref_polys and fc_points == ref_points, "fused commit mismatch"
ok("fused commit_lagrange_many bit-identical to two-step pipeline (TPU)")

# ---- 3. proof flow -------------------------------------------------------
from battlezips_halo2_tpu import api

proof = api.prove_shot(state, trapdoor, (0, 0), True)  # (0,0) is a carrier hit
assert api.verify_shot(proof), "valid shot proof must verify"
ok("prove_shot -> verify_shot round trip (k=11, real prover)")

tampered = api.ShotProof(
    commitment=proof.commitment,
    shot=proof.shot,
    hit=proof.hit,
    proof=bytes([proof.proof[0] ^ 1]) + proof.proof[1:],
)
assert not api.verify_shot(tampered), "tampered proof must fail"
ok("probe: corrupted proof byte rejected")

wrong_hit = api.ShotProof(
    commitment=proof.commitment, shot=proof.shot, hit=not proof.hit, proof=proof.proof
)
assert not api.verify_shot(wrong_hit), "flipped public hit must fail"
ok("probe: tampered public input rejected")

print(f"ALL VERIFY CHECKS PASSED  [{time.time() - t_start:.0f}s total]", flush=True)
