"""Multi-chip MSM: points partitioned per chip, partial sums combined over
the mesh.

TP-style sharding of the north-star kernel (SURVEY.md §2.3): each device
runs the full local Pippenger pipeline (ops/msm.py) over its contiguous
point/scalar shard; the per-device Jacobian partials are all_gathered and
folded with ~log(D) point additions. Communication: one all_gather of a
single point per device — O(D) bytes, negligible vs compute, so scaling
efficiency is compute-bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..curves.host import Curve
from ..curves.limb import JacobianPoint, affine_to_jacobian_host, jacobian_to_affine_host, point_add
from ..fields.limb import FieldSpec
from ..ops.msm import (
    _msm_device_wsums,
    _signed_doubled,
    auto_window,
    host_window_fold,
    scalars_to_digits,
    scalars_to_signed_digits,
)
from .collectives import AXIS


@functools.lru_cache(maxsize=None)
def _compiled_sharded_msm(
    modulus: int, n_local: int, c: int, n_windows: int, mesh_key, signed: bool = False
):
    spec = FieldSpec.make(modulus)
    mesh = _MESHES[mesh_key]

    def local_fn(qx, qy, qinf, digits):
        if signed:
            # per-device [P | -P] doubling of the LOCAL point shard (the
            # signed digit's sign selects the negated half in the gather)
            qx, qy, qinf = _signed_doubled(spec, qx, qy, qinf)
        partial, _ = _msm_device_wsums(spec, qx, qy, qinf, digits, c, complete=True, signed=signed)
        gathered = jax.lax.all_gather(partial, AXIS)  # JacobianPoint of (D, W, 16) leaves
        d = gathered.x.shape[0]
        # fold the per-device window-sum partials lane-parallel over W
        acc = JacobianPoint(gathered.x[0], gathered.y[0], gathered.z[0])
        for i in range(1, d):
            acc = point_add(spec, acc, JacobianPoint(gathered.x[i], gathered.y[i], gathered.z[i]))
        return acc

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(None, AXIS)),
        out_specs=JacobianPoint(P(), P(), P()),
        check_rep=False,
    )
    return jax.jit(fn)  # returns replicated (W, 16)-leaf window sums


_MESHES: dict = {}


def sharded_msm(curve: Curve, points, scalars, mesh, c: int | None = None, signed: bool | None = None):
    """MSM sharded over a 1-D mesh; bit-exact vs the single-device kernel.

    Window size / signed-digit use auto-picked from the PER-DEVICE shard
    size (the bucket aggregation runs per device) unless ``c`` is given;
    ``signed`` overrides the digit encoding explicitly (tests)."""
    assert len(points) == len(scalars)
    d = mesh.devices.size
    # pad so the shard divides evenly (power-of-two total, like ops.msm)
    target = max(64 * d, 1 << (len(points) - 1).bit_length())
    if target % d:
        target *= 2
    if c is None:
        c, auto_signed = auto_window(target // d)
        signed = auto_signed if signed is None else signed
    else:
        signed = bool(signed)
    if len(points) < target:
        pad = target - len(points)
        points = list(points) + [curve.generator] * pad
        scalars = list(scalars) + [0] * pad

    spec = FieldSpec.make(curve.base.modulus)
    jac = affine_to_jacobian_host(spec, points)
    qinf = jnp.asarray(np.array([p is None for p in points], dtype=bool))
    to_digits = scalars_to_signed_digits if signed else scalars_to_digits
    digits = jnp.asarray(to_digits([s % curve.scalar.modulus for s in scalars], c))

    mesh_key = tuple(str(dev) for dev in mesh.devices.flat)
    _MESHES[mesh_key] = mesh
    f = _compiled_sharded_msm(
        curve.base.modulus, len(points) // d, c, digits.shape[0], mesh_key, signed=signed
    )
    wsums = f(jac.x, jac.y, qinf, digits)  # (W, 16) leaves
    return host_window_fold(curve, jacobian_to_affine_host(spec, wsums), c)


@functools.lru_cache(maxsize=None)
def _compiled_sharded_msm_batch(
    modulus: int, n_local: int, c: int, n_windows: int, batch: int, mesh_key, signed: bool = False
):
    """Batched variant: digits (B, W, N); one lax.scan over the batch inside
    the shard_map (sequential per set, lane-parallel within; ONE all_gather
    for all B partials)."""
    spec = FieldSpec.make(modulus)
    mesh = _MESHES[mesh_key]

    def local_fn(qx, qy, qinf, digit_stack):
        if signed:
            qx, qy, qinf = _signed_doubled(spec, qx, qy, qinf)

        def body(_, digits):
            partial, _coll = _msm_device_wsums(
                spec, qx, qy, qinf, digits, c, complete=True, signed=signed
            )
            return None, partial

        _, partials = jax.lax.scan(body, None, digit_stack)  # (B, W, 16) leaves
        gathered = jax.lax.all_gather(partials, AXIS)  # (D, B, W, 16)
        d = gathered.x.shape[0]
        acc = JacobianPoint(gathered.x[0], gathered.y[0], gathered.z[0])
        for i in range(1, d):
            acc = point_add(spec, acc, JacobianPoint(gathered.x[i], gathered.y[i], gathered.z[i]))
        return acc

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(None, None, AXIS)),
        out_specs=JacobianPoint(P(), P(), P()),
        check_rep=False,
    )
    return jax.jit(fn)


def sharded_msm_many(curve: Curve, points, scalars_list, mesh, c: int | None = None):
    """Batched TP-sharded MSM over one shared point set — the mesh-routed
    backend of pcs.ipa.commit_many (parallel/context.py). Uses the COMPLETE
    addition law (no collision-redo round trip: mesh dispatch is the
    latency-critical path). Bit-exact vs ops.msm.msm_many."""
    if not scalars_list:
        return []
    d = mesh.devices.size
    n0 = len(points)
    target = max(64 * d, 1 << (n0 - 1).bit_length())
    if target % d:
        target *= 2
    if c is None:
        c, signed = auto_window(target // d)
    else:
        signed = False
    to_digits = scalars_to_signed_digits if signed else scalars_to_digits
    pts = list(points) + [curve.generator] * (target - n0)
    spec = FieldSpec.make(curve.base.modulus)
    jac = affine_to_jacobian_host(spec, pts)
    qinf = jnp.asarray(np.array([p is None for p in pts], dtype=bool))
    mesh_key = tuple(str(dev) for dev in mesh.devices.flat)
    _MESHES[mesh_key] = mesh

    chunk = 4  # same watchdog bound as ops.msm.msm_many
    results = []
    for start in range(0, len(scalars_list), chunk):
        group = scalars_list[start : start + chunk]
        b_target = max(1, 1 << (len(group) - 1).bit_length())
        digit_stack = np.stack(
            [
                to_digits([s % curve.scalar.modulus for s in sc] + [0] * (target - n0), c)
                for sc in group
            ]
            + [to_digits([0] * target, c)] * (b_target - len(group))
        )
        w = digit_stack.shape[1]
        f = _compiled_sharded_msm_batch(
            curve.base.modulus, target // d, c, w, b_target, mesh_key, signed=signed
        )
        out = f(jac.x, jac.y, qinf, jnp.asarray(digit_stack))  # (B, W, 16) leaves
        flat = JacobianPoint(
            np.asarray(out.x).reshape(-1, 16),
            np.asarray(out.y).reshape(-1, 16),
            np.asarray(out.z).reshape(-1, 16),
        )
        wsum_pts = jacobian_to_affine_host(spec, flat)
        for bi in range(len(group)):
            results.append(host_window_fold(curve, wsum_pts[bi * w : (bi + 1) * w], c))
    return results
