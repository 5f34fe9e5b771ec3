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
