"""Active-mesh execution context: one switch that reroutes the prover's
hot kernels onto a device mesh.

The reference's rayon runtime is load-bearing INSIDE every prover call —
`create_proof` transparently uses however many cores exist. The TPU-native
equivalent is this context: `use_mesh(mesh)` makes `pcs.ipa.commit/
commit_many` (and through them every advice/lookup/permutation/quotient
commitment in plonk/prover.py) run the TP-sharded MSM of parallel/msm.py,
with points partitioned over the mesh axis and one all_gather + lane-
parallel fold per batch. Proofs are bit-identical to the single-device
path (tests/test_parallel.py::test_proof_bit_identical_under_mesh).
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

_state = threading.local()


def get_mesh():
    """The active mesh, or None. Thread-local: session worker threads can
    pin different meshes (or none) independently."""
    return getattr(_state, "mesh", None)


def set_mesh(mesh) -> None:
    _state.mesh = mesh


@contextmanager
def use_mesh(mesh):
    prev = get_mesh()
    set_mesh(mesh)
    try:
        yield mesh
    finally:
        set_mesh(prev)


def mesh_is_active() -> bool:
    m = get_mesh()
    return m is not None and m.devices.size > 1


def mesh_from_config(devices=None):
    """Build the 2-D (dp, tp) jax Mesh described by config().mesh
    (BZ_MESH_DP / BZ_MESH_TP). Missing axis sizes are inferred: tp defaults
    to all remaining devices, dp to 1. Returns None when only one device is
    visible and no shape was requested — callers then skip mesh routing.

    This is the runtime entry the config system promises (SURVEY §5.6):
    `with use_mesh(mesh_from_config()): create_proof(...)` shards every
    prover commitment without any call-site mesh plumbing."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    from ..config import config

    mc = config().mesh
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    dp, tp = mc.dp, mc.tp
    if dp is None and tp is None:
        if n == 1:
            return None
        dp, tp = 1, n
    elif dp is None:
        dp = max(1, n // tp)
    elif tp is None:
        tp = max(1, n // dp)
    assert dp * tp <= n, f"mesh {dp}x{tp} needs {dp * tp} devices, have {n}"
    grid = np.array(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, mc.axis_names)
