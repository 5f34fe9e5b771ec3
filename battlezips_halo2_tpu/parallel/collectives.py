"""Named communication backend: mesh helpers + collective wrappers.

This is the framework's single place where inter-chip communication is
spelled out (SURVEY.md §5.8): everything rides `jax.lax` collectives
(`psum`, `all_gather`, `all_to_all`, `ppermute`) inside ``shard_map`` over a
``jax.sharding.Mesh``; on a single device every wrapper degrades to a no-op.
XLA schedules these over ICI within a pod slice and DCN across slices — no
NCCL/MPI analog is needed.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


AXIS = "shard"  # canonical 1-D mesh axis name


def mesh_from_devices(devices=None, axis: str = AXIS) -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def default_mesh(n: int | None = None) -> Mesh:
    """A 1-D mesh over the first n (default: all) local devices."""
    devices = jax.devices()
    if n is not None:
        assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
        devices = devices[:n]
    return mesh_from_devices(devices)


def axis_size(axis: str = AXIS) -> int:
    return jax.lax.axis_size(axis)


def my_index(axis: str = AXIS):
    return jax.lax.axis_index(axis)


def all_gather(x, axis: str = AXIS):
    return jax.lax.all_gather(x, axis)


def all_to_all(x, split_axis: int, concat_axis: int, axis: str = AXIS):
    return jax.lax.all_to_all(x, axis, split_axis=split_axis, concat_axis=concat_axis, tiled=False)


def psum(x, axis: str = AXIS):
    return jax.lax.psum(x, axis)
