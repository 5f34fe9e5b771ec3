"""Multi-host runtime wiring (SURVEY.md §5.8).

The reference's only parallel runtime is rayon's in-process thread pool
(Cargo.lock:392; wasm web workers via init_thread_pool,
src/wasm/circuit_wasm.rs:24). The TPU-native equivalent spans HOSTS: each
process owns its local chips, `jax.distributed.initialize` brings up the
cross-process runtime, and the same `shard_map` + collectives code then
rides ICI within a slice and DCN across slices — the mesh shape is the only
thing that changes.

Process topology comes from env vars (set by the launcher or scheduler):

    BZ_COORDINATOR  host:port of process 0 (default 127.0.0.1:12807)
    BZ_NUM_PROCS    total process count
    BZ_PROC_ID      this process's rank

On CPU the cross-process collectives run over gloo
(jax_cpu_collectives_implementation=gloo, the jax 0.9 default), which is
how `tools/multihost_ntt.py` validates the DCN choreography with 2
processes x 4 virtual devices without TPU pods.
"""

from __future__ import annotations

import os

from ..config import config as _config

import jax
import numpy as np
from jax.sharding import Mesh

from .collectives import AXIS

_INITIALIZED = False


def initialize(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Bring up the multi-process runtime (idempotent).

    Arguments default from BZ_COORDINATOR / BZ_NUM_PROCS / BZ_PROC_ID; a
    single-process configuration (num_processes in (None, 1)) is a no-op so
    library code can call this unconditionally.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    cfg = _config()
    num_processes = num_processes or cfg.procs
    if num_processes <= 1:
        return
    coordinator = coordinator or cfg.coordinator
    process_id = (
        process_id if process_id is not None else cfg.proc_id
    )
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    _INITIALIZED = True


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def global_mesh(axis: str = AXIS) -> Mesh:
    """1-D mesh over ALL global devices (every process's chips), ordered
    process-major so contiguous shards live on contiguous hosts and the
    all_to_all's host-crossing edges are the minimal set."""
    return Mesh(np.array(jax.devices()), (axis,))


def global_mesh_2d(dp: int, axis_names=("dp", "tp")) -> Mesh:
    """(dp, tp) mesh over all global devices. tp is laid out within-process
    first so tensor-parallel collectives ride ICI and only the dp axis
    crosses DCN (the scaling-book layout rule)."""
    devs = np.array(jax.devices())
    assert devs.size % dp == 0, f"{devs.size} devices not divisible by dp={dp}"
    return Mesh(devs.reshape(dp, devs.size // dp), axis_names)


def host_local_slice(global_len: int) -> slice:
    """The [start, stop) range of a length-global_len axis owned by this
    process under contiguous process-major sharding."""
    per = global_len // jax.process_count()
    start = per * jax.process_index()
    return slice(start, start + per)
