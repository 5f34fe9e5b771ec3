"""Fused Pallas TPU kernels for the hot limb pipelines.

The jnp formulation of a Montgomery multiply is ~150 elementwise ops + 2
matmuls; XLA materializes many intermediates to HBM, making NTT stages and
point additions memory-bound. These kernels run the SAME limb code
(fields/limb.py with threaded LimbConsts) inside a Pallas block so every
intermediate stays in VMEM/registers and HBM traffic drops to the operands:

* ``butterfly_stage`` — one whole NTT stage: (u, v, tw) -> (u + v*tw, u - v*tw)
* ``point_add_rows``  — one full Jacobian point addition (the MSM combine)
* ``mont_mul_rows``   — standalone fused Montgomery multiply

Kernels are gated to the TPU backend (the pure-jnp path remains the
reference everywhere); equivalence tests run them in interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields import limb as L
from ..fields.limb import FieldSpec, LimbConsts


def use_pallas() -> bool:
    return jax.default_backend() == "tpu"


def _pick_tile(rows: int, target: int = 512) -> int:
    t = min(rows, target)
    while rows % t:
        t //= 2
    return max(t, 1)


def _const_arrays(spec: FieldSpec):
    """Host-side constant operand list (all >= 2D for TPU layout).
    Kernels consume the j-major product layout, so they get the j-major
    accumulation matrices."""
    full, low = L._conv_mats_jmajor()
    # NUMPY on purpose: these are lifted into whatever trace invokes the
    # kernel — caching jnp arrays here would leak tracers when the cached
    # closure is first built inside a jit trace
    return (
        np.asarray(full),
        np.asarray(low),
        spec.p_limbs[None, :],
        spec.p17.astype(np.int32)[None, :],
        spec.nprime_limbs[None, :],
        spec.one_mont[None, :],
    )


def _const_specs():
    def fixed(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda *ids: (0,) * nd, memory_space=pltpu.VMEM)

    return [
        fixed((4 * L.NLIMBS * L.NLIMBS, 2 * L.NLIMBS + 2)),
        fixed((4 * L.NLIMBS * L.NLIMBS, L.NLIMBS)),
        fixed((1, L.NLIMBS)),
        fixed((1, 17)),
        fixed((1, L.NLIMBS)),
        fixed((1, L.NLIMBS)),
    ]


def _consts_from_refs(refs):
    conv_full, conv_low, p, p17, nprime, one = refs
    return LimbConsts(
        conv_full=conv_full[:],
        conv_low=conv_low[:],
        p_limbs=p[0, :],
        p17_i32=p17[0, :],
        nprime=nprime[0, :],
        one_mont=one[0, :],
        in_kernel=True,
    )


# ------------------------------------------------------------- butterfly
@functools.lru_cache(maxsize=None)
def _butterfly_call(modulus: int, batch: int, n2: int, interpret: bool):
    spec = FieldSpec.make(modulus)
    tile = _pick_tile(n2)
    grid = (batch, n2 // tile)
    row_spec = pl.BlockSpec((1, tile, L.NLIMBS), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((tile, L.NLIMBS), lambda b, t: (t, 0), memory_space=pltpu.VMEM)
    cspecs = _const_specs()

    def kernel(u_ref, v_ref, tw_ref, *rest):
        crefs, outs = rest[:6], rest[6:]
        cst = _consts_from_refs(crefs)
        u = u_ref[:]
        vt = L.mont_mul(spec, v_ref[:], tw_ref[:], cst)
        outs[0][:] = L.add(spec, u, vt, cst)
        outs[1][:] = L.sub(spec, u, vt, cst)

    consts = _const_arrays(spec)

    def call(u, v, tw):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[row_spec, row_spec, tw_spec] + cspecs,
            out_specs=[row_spec, row_spec],
            out_shape=[jax.ShapeDtypeStruct((batch, n2, L.NLIMBS), jnp.uint32)] * 2,
            interpret=interpret,
        )(u, v, tw, *consts)

    return call


def butterfly_stage(spec: FieldSpec, u, v, tw, interpret: bool = False):
    """u, v: (B, n2, 16); tw: (n2, 16) Montgomery twiddles ->
    (u + v*tw, u - v*tw)."""
    batch, n2, _ = u.shape
    return _butterfly_call(spec.modulus, batch, n2, interpret)(u, v, tw)


# ------------------------------------------------------------- point add
@functools.lru_cache(maxsize=None)
def _point_add_call(modulus: int, rows: int, interpret: bool):
    from ..curves.limb import JacobianPoint, point_add

    spec = FieldSpec.make(modulus)
    # tile 128: ~30 live Montgomery muls × (tile, 1024) bf16 intermediates
    # must fit the 16MB VMEM scoped-stack budget
    tile = _pick_tile(rows, 128)
    grid = (rows // tile,)
    blk = pl.BlockSpec((tile, L.NLIMBS), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cspecs = _const_specs()

    def kernel(px, py, pz, qx, qy, qz, *rest):
        crefs, outs = rest[:6], rest[6:]
        cst = _consts_from_refs(crefs)
        p = JacobianPoint(px[:], py[:], pz[:])
        q = JacobianPoint(qx[:], qy[:], qz[:])
        r = point_add(spec, p, q, cst)
        outs[0][:] = r.x
        outs[1][:] = r.y
        outs[2][:] = r.z

    consts = _const_arrays(spec)

    def call(p, q):
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[blk] * 6 + cspecs,
            out_specs=[blk] * 3,
            out_shape=[jax.ShapeDtypeStruct((rows, L.NLIMBS), jnp.uint32)] * 3,
            interpret=interpret,
        )(p.x, p.y, p.z, q.x, q.y, q.z, *consts)
        return JacobianPoint(*out)

    return call


def point_add_rows(spec: FieldSpec, p, q, interpret: bool = False):
    """Fused Jacobian addition for (rows, 16) leaf shapes."""
    rows = p.x.shape[0]
    return _point_add_call(spec.modulus, rows, interpret)(p, q)


# ----------------------------------------------------- mixed add (MSM step)
@functools.lru_cache(maxsize=None)
def _mixed_step_call(modulus: int, rows: int, interpret: bool):
    from ..curves.limb import JacobianPoint, point_add_mixed, select_point

    spec = FieldSpec.make(modulus)
    # ~13 live Montgomery muls x (tile, 1024) bf16 intermediates in VMEM
    tile = _pick_tile(rows, 256)
    grid = (rows // tile,)
    blk = pl.BlockSpec((tile, L.NLIMBS), lambda i: (i, 0), memory_space=pltpu.VMEM)
    flg = pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cspecs = _const_specs()

    def kernel(ax, ay, az, px, py, pinf, head, *rest):
        crefs, outs = rest[:6], rest[6:]
        cst = _consts_from_refs(crefs)
        acc = JacobianPoint(ax[:], ay[:], az[:])
        qx, qy = px[:], py[:]
        q_inf = pinf[:, 0] != 0
        merged = point_add_mixed(spec, acc, qx, qy, q_inf, cst)
        qz = jnp.where(q_inf[:, None], jnp.zeros_like(qx), cst.one_mont[None, :].astype(jnp.uint32))
        started = JacobianPoint(qx, qy, qz)
        r = select_point(head[:, 0] != 0, started, merged)
        outs[0][:] = r.x
        outs[1][:] = r.y
        outs[2][:] = r.z

    consts = _const_arrays(spec)

    def call(acc, px, py, pinf, head):
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[blk] * 5 + [flg, flg] + cspecs,
            out_specs=[blk] * 3,
            out_shape=[jax.ShapeDtypeStruct((rows, L.NLIMBS), jnp.uint32)] * 3,
            interpret=interpret,
        )(
            acc.x,
            acc.y,
            acc.z,
            px,
            py,
            pinf.astype(jnp.int32)[:, None],
            head.astype(jnp.int32)[:, None],
            *consts,
        )
        from ..curves.limb import JacobianPoint as JP

        return JP(*out)

    return call


def msm_step_rows(spec: FieldSpec, acc, px, py, pinf, head, interpret: bool = False):
    """One fused MSM bucket-accumulation step: select(head, lift(P),
    acc + P_affine) over (rows, 16) leaves, all intermediates VMEM-resident."""
    rows = acc.x.shape[0]
    return _mixed_step_call(spec.modulus, rows, interpret)(acc, px, py, pinf, head)


# ------------------------------------------------------------- mont mul
@functools.lru_cache(maxsize=None)
def _mont_mul_call(modulus: int, rows: int, interpret: bool):
    spec = FieldSpec.make(modulus)
    tile = _pick_tile(rows, 512)
    grid = (rows // tile,)
    blk = pl.BlockSpec((tile, L.NLIMBS), lambda i: (i, 0), memory_space=pltpu.VMEM)
    cspecs = _const_specs()

    def kernel(a_ref, b_ref, *rest):
        crefs, outs = rest[:6], rest[6:]
        cst = _consts_from_refs(crefs)
        outs[0][:] = L.mont_mul(spec, a_ref[:], b_ref[:], cst)

    consts = _const_arrays(spec)

    def call(a, b):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[blk, blk] + cspecs,
            out_specs=blk,
            out_shape=jax.ShapeDtypeStruct((rows, L.NLIMBS), jnp.uint32),
            interpret=interpret,
        )(a, b, *consts)

    return call


def mont_mul_rows(spec: FieldSpec, a, b, interpret: bool = False):
    rows = a.shape[0]
    return _mont_mul_call(spec.modulus, rows, interpret)(a, b)


# ---------------------------------------------- transposed (16, N) kernels
#
# The row-layout kernels above waste 7/8 of every vector register: a
# (tile, 16) u32 block puts the 16-limb axis on the 128-wide lane dimension.
# The transposed layout maps limbs to SUBLANES and points to LANES, so the
# native (8, 128) u32 tile is fully occupied, and the int32 schoolbook
# multiply (fields/limb_t.py mont_mul_i32 — no 8-bit chunk expansion, no
# bf16 matmuls) runs at ~3 ns/element vs ~23 ns for the XLA chunk path
# (tools/exp_step_t.py kmicro, TPU v5e).


def _consts_T(spec: FieldSpec):
    """Minimal transposed-kernel constants: three tiny column arrays ride in
    as refs; n'/p limbs are STATIC Python ints closed over by the trace."""
    from ..fields import limb_t as T

    cst = T.consts_t(spec)
    arrays = (
        np.asarray(cst["pp1_col"]),  # (16, 1)
        np.asarray(cst["pcomp17_col"]),  # (17, 1)
        np.asarray(cst["one_col"]),  # (16, 1)
    )
    static = {"np_ints": cst["np_ints"], "p_ints": cst["p_ints"], "use_i32": True}
    return arrays, static


def _consts_T_specs():
    def fixed(shape):
        return pl.BlockSpec(shape, lambda *ids: (0, 0), memory_space=pltpu.VMEM)

    return [fixed((L.NLIMBS, 1)), fixed((17, 1)), fixed((L.NLIMBS, 1))]


def _cst_T_from_refs(crefs, static):
    pp1, pcomp, one = crefs
    return {
        "pp1_col": pp1[:],
        "pcomp17_col": pcomp[:],
        "one_col": one[:],
        **static,
    }


@functools.lru_cache(maxsize=None)
def _msm_step_T_call(modulus: int, lanes: int, interpret: bool):
    from ..curves import limb_t as CT

    spec = FieldSpec.make(modulus)
    tile = _pick_tile(lanes, 512)
    grid = (lanes // tile,)
    blk = pl.BlockSpec((L.NLIMBS, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    flg = pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    cspecs = _consts_T_specs()
    consts, static = _consts_T(spec)

    def kernel(ax, ay, az, px, py, pinf, head, *rest):
        crefs, outs = rest[:3], rest[3:]
        cst = _cst_T_from_refs(crefs, static)
        acc = CT.JacobianPointT(ax[:], ay[:], az[:])
        qx, qy = px[:], py[:]
        q_inf = pinf[:] != 0
        h = head[:] != 0
        merged, nd = CT.point_add_mixed_incomplete(cst, acc, qx, qy, q_inf)
        one = jnp.broadcast_to(cst["one_col"], qx.shape).astype(jnp.uint32)
        qz = jnp.where(q_inf, jnp.zeros_like(qx), one)
        r = CT.select_point(h, CT.JacobianPointT(qx, qy, qz), merged)
        outs[0][:] = r.x
        outs[1][:] = r.y
        outs[2][:] = r.z
        outs[3][:] = nd.astype(jnp.int32)

    def call(acc, pxT, pyT, pinf, head):
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[blk] * 5 + [flg, flg] + cspecs,
            out_specs=[blk] * 3 + [flg],
            out_shape=[jax.ShapeDtypeStruct((L.NLIMBS, lanes), jnp.uint32)] * 3
            + [jax.ShapeDtypeStruct((1, lanes), jnp.int32)],
            interpret=interpret,
        )(
            acc.x,
            acc.y,
            acc.z,
            pxT,
            pyT,
            pinf.astype(jnp.int32)[None, :],
            head.astype(jnp.int32)[None, :],
            *[jnp.asarray(c) for c in consts],
        )
        from ..curves.limb_t import JacobianPointT

        return JacobianPointT(out[0], out[1], out[2]), out[3][0] != 0

    return call


def msm_step_T(spec: FieldSpec, acc, pxT, pyT, pinf, head, interpret: bool = False):
    """One fused MSM bucket-accumulation step in the transposed layout:
    select(head, lift(P), acc + P_affine) with the incomplete mixed add.

    acc: JacobianPointT of (16, L) leaves (stays transposed across the scan);
    pxT/pyT: (16, L); pinf/head: (L,) bool. Returns (acc', needs_double (L,)
    bool) — the P == Q collision flag of the incomplete add (callers redo
    with the complete jnp law on the astronomically-rare hit, ops/msm.py)."""
    lanes = acc.x.shape[1]
    return _msm_step_T_call(spec.modulus, lanes, interpret)(acc, pxT, pyT, pinf, head)


@functools.lru_cache(maxsize=None)
def _point_add_T_call(modulus: int, lanes: int, interpret: bool):
    from ..curves import limb_t as CT

    spec = FieldSpec.make(modulus)
    tile = _pick_tile(lanes, 512)
    grid = (lanes // tile,)
    blk = pl.BlockSpec((L.NLIMBS, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    cspecs = _consts_T_specs()
    consts, static = _consts_T(spec)

    def kernel(px, py, pz, qx, qy, qz, *rest):
        crefs, outs = rest[:3], rest[3:]
        cst = _cst_T_from_refs(crefs, static)
        p = CT.JacobianPointT(px[:], py[:], pz[:])
        q = CT.JacobianPointT(qx[:], qy[:], qz[:])
        r = CT.point_add(cst, p, q)
        outs[0][:] = r.x
        outs[1][:] = r.y
        outs[2][:] = r.z

    def call(p, q):
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[blk] * 6 + cspecs,
            out_specs=[blk] * 3,
            out_shape=[jax.ShapeDtypeStruct((L.NLIMBS, lanes), jnp.uint32)] * 3,
            interpret=interpret,
        )(p.x, p.y, p.z, q.x, q.y, q.z, *[jnp.asarray(c) for c in consts])
        from ..curves.limb_t import JacobianPointT

        return JacobianPointT(*out)

    return call


def point_add_T(spec: FieldSpec, p, q, interpret: bool = False):
    """Fused complete Jacobian addition in the transposed layout
    ((16, L) leaves) — used by the MSM aggregation scans."""
    lanes = p.x.shape[1]
    return _point_add_T_call(spec.modulus, lanes, interpret)(p, q)


@functools.lru_cache(maxsize=None)
def _butterfly_T_call(modulus: int, batch: int, half: int, interpret: bool):
    from ..fields import limb_t as T

    spec = FieldSpec.make(modulus)
    tile = _pick_tile(half, 2048)
    grid = (batch, half // tile)
    blk = pl.BlockSpec((1, L.NLIMBS, tile), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((L.NLIMBS, tile), lambda b, t: (0, t), memory_space=pltpu.VMEM)
    cspecs = _consts_T_specs()
    consts, static = _consts_T(spec)

    def kernel(u_ref, v_ref, tw_ref, *rest):
        crefs, outs = rest[:3], rest[3:]
        cst = _cst_T_from_refs(crefs, static)
        u = u_ref[0]
        vt = T.mont_mul_i32(cst, v_ref[0], tw_ref[:])
        outs[0][0] = T.add(cst, u, vt)
        outs[1][0] = T.sub(cst, u, vt)

    def call(u, v, tw):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[blk, blk, tw_spec] + cspecs,
            out_specs=[blk, blk],
            out_shape=[jax.ShapeDtypeStruct((batch, L.NLIMBS, half), jnp.uint32)] * 2,
            interpret=interpret,
        )(u, v, tw, *[jnp.asarray(c) for c in consts])

    return call


def butterfly_stage_T(spec: FieldSpec, u, v, tw, interpret: bool = False):
    """One whole NTT stage in the transposed layout: u, v (B, 16, half);
    tw (16, half) Montgomery twiddles -> (u + v*tw, u - v*tw). i32 schoolbook
    muls, all intermediates VMEM-resident (~3 ns/element vs ~23 ns for the
    XLA chunk path)."""
    batch, _, half = u.shape
    return _butterfly_T_call(spec.modulus, batch, half, interpret)(u, v, tw)
