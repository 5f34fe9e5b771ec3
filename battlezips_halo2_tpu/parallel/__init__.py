"""Multi-chip parallelism: mesh construction, collectives, sharded MSM/NTT
(SURVEY.md §2.3, §5.7-5.8).

The framework's "distributed backend": JAX collectives over a
``jax.sharding.Mesh`` — psum/all_gather for MSM bucket reduction, all_to_all
for the 4-step NTT butterfly exchange, data-parallel proof batches over the
same mesh. Replaces the reference's rayon shared-memory threading
(Cargo.lock:718, src/wasm/circuit_wasm.rs:24) with compiler-scheduled ICI
communication.
"""

from .collectives import default_mesh, mesh_from_devices
from .msm import sharded_msm
from .ntt import distributed_ntt

__all__ = ["default_mesh", "mesh_from_devices", "sharded_msm", "distributed_ntt"]
