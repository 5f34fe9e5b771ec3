#!/usr/bin/env python
"""2-process CPU validation of the multi-host sharded NTT (SURVEY §5.8).

Spawns N worker processes (default 2), each with 4 virtual CPU devices;
`jax.distributed.initialize` + gloo collectives give an 8-device GLOBAL
mesh spanning both processes, and the production 4-step NTT
(parallel/ntt.py) runs over it — its 3 all_to_alls now crossing the
process boundary (the DCN analog). Every process checks its addressable
output shards bit-exactly against the host NTT.

Launcher:  python tools/multihost_ntt.py [--procs 2] [--logn 10]
Worker:    (spawned with BZ_PROC_ID/BZ_NUM_PROCS/BZ_COORDINATOR set)
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LOCAL_DEVICES = 4


def worker(logn: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={LOCAL_DEVICES}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )

    from battlezips_halo2_tpu.parallel import distributed as dist

    dist.initialize()
    assert jax.process_count() == int(os.environ["BZ_NUM_PROCS"])
    mesh = dist.global_mesh()
    d = mesh.devices.size
    n = 1 << logn
    assert n % (d * d) == 0, "n must be divisible by D^2"

    import random

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from battlezips_halo2_tpu.fields import FP, limb as L
    from battlezips_halo2_tpu.fields.limb import FP_SPEC
    from battlezips_halo2_tpu.parallel.collectives import AXIS
    from battlezips_halo2_tpu.parallel.ntt import distributed_ntt
    from battlezips_halo2_tpu.poly.domain import EvaluationDomain, ntt_host

    rng = random.Random(42)  # same seed on every process: shared input
    vals = [rng.randrange(FP.modulus) for _ in range(n)]
    a_mont = np.asarray(L.to_mont(FP_SPEC, L.ints_to_limbs(vals)))
    dom = EvaluationDomain(logn, 2)

    sharding = NamedSharding(mesh, P(AXIS))
    a_global = jax.make_array_from_callback(
        (n, L.NLIMBS), sharding, lambda idx: a_mont[idx]
    )
    out = distributed_ntt(mesh, n, dom.omega, a_global)

    expected = ntt_host(vals, dom.omega)
    # check the shards THIS process owns
    checked = 0
    for shard in out.addressable_shards:
        rows = shard.index[0]
        got = L.limbs_to_ints(L.from_mont(FP_SPEC, np.asarray(shard.data)))
        want = expected[rows]
        assert got == want, f"mismatch in rows {rows} on process {jax.process_index()}"
        checked += len(got)
    print(
        f"[proc {jax.process_index()}/{jax.process_count()}] distributed NTT n={n} over "
        f"{d} global devices ({jax.local_device_count()} local): {checked} rows bit-exact",
        flush=True,
    )


def launch(procs: int, logn: int) -> int:
    port = 12800 + (os.getpid() % 1000)
    env_base = {
        **os.environ,
        "BZ_COORDINATOR": f"127.0.0.1:{port}",
        "BZ_NUM_PROCS": str(procs),
        "JAX_PLATFORMS": "cpu",
    }
    children = []
    for rank in range(procs):
        env = {**env_base, "BZ_PROC_ID": str(rank)}
        children.append(
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--worker", "--logn", str(logn)],
                env=env,
            )
        )
    deadline = time.time() + 900
    rc = 0
    for p in children:
        remaining = max(1, int(deadline - time.time()))
        try:
            rc |= p.wait(timeout=remaining)
        except subprocess.TimeoutExpired:
            p.kill()
            rc |= 1
    print("multihost_ntt:", "OK" if rc == 0 else f"FAILED rc={rc}", flush=True)
    return rc


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--logn", type=int, default=10)
    args = ap.parse_args()
    if args.worker:
        worker(args.logn)
    else:
        sys.exit(launch(args.procs, args.logn))
