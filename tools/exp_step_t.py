#!/usr/bin/env python
"""MSM scan-step implementation shootout (the per-row cost sets the MSM
throughput ceiling):

  jnp_row    : current — row layout (N,16), point_add_mixed_incomplete
  jnp_T      : transposed (16,N) limb-major, plain XLA
  pallas_T   : transposed inside a Pallas kernel (VMEM-resident temps)
  pallas_row : existing (tile,16) Pallas msm_step kernel

Each chained STEPS times inside one jit (select(head, P, acc+P)); results
cross-checked bit-exactly against jnp_row.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import functools

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from battlezips_halo2_tpu.curves import VESTA
from battlezips_halo2_tpu.curves.limb import (
    JacobianPoint,
    affine_to_jacobian_host,
    point_add_mixed_incomplete,
    select_point,
)
from battlezips_halo2_tpu.curves import limb_t as CT
from battlezips_halo2_tpu.fields import limb as L
from battlezips_halo2_tpu.fields import limb_t as T
from battlezips_halo2_tpu.fields.limb import FieldSpec

SPEC = FieldSpec.make(VESTA.base.modulus)
N = int(os.environ.get("PROF_N", str(1 << 15)))
STEPS = int(os.environ.get("PROF_STEPS", "64"))
TILE = int(os.environ.get("PROF_TILE", "512"))
print(f"backend={jax.default_backend()} N={N} steps={STEPS} tile={TILE}", flush=True)

CST = CT.infinity.__globals__  # noqa: just to quiet linters
CONSTS = T.consts_t(SPEC)


def timed(name, fn, *args):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)
    t0 = time.time()
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: np.asarray(x), out)
    dt = time.time() - t0
    rows = N * STEPS
    print(f"{name:44s} {dt*1e3:9.1f} ms  {dt/rows*1e9:7.1f} ns/row", flush=True)
    return out


# ---------------------------------------------------------------- variants


def step_row(acc, px, py, pinf, head):
    one = jnp.asarray(SPEC.one_mont)
    merged, _flag = point_add_mixed_incomplete(SPEC, acc, px, py, pinf)
    pz = jnp.where(pinf[:, None], jnp.zeros((1, 16), jnp.uint32), one[None, :])
    return select_point(head, JacobianPoint(px, py, pz), merged)


def chain_row(acc, px, py, pinf, heads):
    def body(a, h):
        return step_row(a, px, py, pinf, h), None

    out, _ = jax.lax.scan(body, acc, heads)
    return out


def step_T(acc, px, py, pinf, head):
    # acc: JacobianPointT (16,N); pinf/head: (1,N) bool
    merged, _flag = CT.point_add_mixed_incomplete(CONSTS, acc, px, py, pinf)
    one = jnp.broadcast_to(jnp.asarray(CONSTS["one_col"]), px.shape).astype(jnp.uint32)
    pz = jnp.where(pinf, jnp.zeros_like(px), one)
    return CT.select_point(head, CT.JacobianPointT(px, py, pz), merged)


def chain_T(acc, px, py, pinf, heads):
    def body(a, h):
        return step_T(a, px, py, pinf, h), None

    out, _ = jax.lax.scan(body, acc, heads)
    return out


# ------------------------------------------------------- pallas transposed
# array consts ride in as refs; *_ints tuples are static (closed over)
_CONST_KEYS = sorted(k for k in CONSTS if not k.endswith("_ints"))
_STATIC_CONSTS = {k: v for k, v in CONSTS.items() if k.endswith("_ints")}


@functools.lru_cache(maxsize=None)
def _step_T_call(n: int, tile: int):
    grid = (n // tile,)
    blk = pl.BlockSpec((L.NLIMBS, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    flg = pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM)

    def fixed(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, nd=nd: (0,) * nd, memory_space=pltpu.VMEM)

    cspecs = [fixed(np.asarray(CONSTS[k]).shape) for k in _CONST_KEYS]
    cvals = [jnp.asarray(CONSTS[k]) for k in _CONST_KEYS]

    def kernel(ax, ay, az, px, py, pinf, head, *rest):
        crefs, (ox, oy, oz) = rest[: len(_CONST_KEYS)], rest[len(_CONST_KEYS) :]
        consts = {**_STATIC_CONSTS, **{k: r[:] for k, r in zip(_CONST_KEYS, crefs)}}
        acc = CT.JacobianPointT(ax[:], ay[:], az[:])
        qx, qy = px[:], py[:]
        q_inf = pinf[:] != 0
        h = head[:] != 0
        merged, _flag = CT.point_add_mixed_incomplete(consts, acc, qx, qy, q_inf)
        one = jnp.broadcast_to(consts["one_col"], qx.shape).astype(jnp.uint32)
        qz = jnp.where(q_inf, jnp.zeros_like(qx), one)
        r = CT.select_point(h, CT.JacobianPointT(qx, qy, qz), merged)
        ox[:] = r.x
        oy[:] = r.y
        oz[:] = r.z

    def call(acc, px, py, pinf_i, head_i):
        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[blk] * 5 + [flg, flg] + cspecs,
            out_specs=[blk] * 3,
            out_shape=[jax.ShapeDtypeStruct((L.NLIMBS, n), jnp.uint32)] * 3,
        )(acc.x, acc.y, acc.z, px, py, pinf_i, head_i, *cvals)
        return CT.JacobianPointT(*out)

    return call


def chain_pallas_T(acc, px, py, pinf_i, heads_i):
    call = _step_T_call(N, TILE)

    def body(a, h):
        return call(a, px, py, pinf_i, h), None

    out, _ = jax.lax.scan(body, acc, heads_i)
    return out


def main():
    rng = np.random.RandomState(0)
    pts = [VESTA.mul(VESTA.generator, int(s)) for s in rng.randint(1, 1 << 62, size=256)]
    pts = (pts * ((N + 255) // 256))[:N]
    jac = affine_to_jacobian_host(SPEC, pts)
    px, py = jac.x, jac.y
    pinf = jnp.zeros(N, dtype=bool)
    heads = jnp.asarray(rng.rand(STEPS, N) < 0.02)

    acc0 = JacobianPoint(px[::-1].copy(), py[::-1].copy(), jnp.broadcast_to(jnp.asarray(SPEC.one_mont), (N, 16)).astype(jnp.uint32))

    which = sys.argv[1:] or ["jnp_row", "jnp_T", "pallas_T"]

    ref = None
    if "jnp_row" in which:
        ref = timed("jnp_row", jax.jit(chain_row), acc0, px, py, pinf, heads)

    pxT, pyT = px.T.copy(), py.T.copy()
    accT = CT.JacobianPointT(acc0.x.T.copy(), acc0.y.T.copy(), acc0.z.T.copy())
    pinfT = pinf[None, :]
    headsT = heads[:, None, :]

    if "jnp_T" in which:
        outT = timed("jnp_T", jax.jit(chain_T), accT, pxT, pyT, pinfT, headsT)
        if ref is not None:
            for a, b in zip(ref, outT):
                assert (np.asarray(a) == np.asarray(b).T).all(), "jnp_T mismatch"
            print("jnp_T bit-exact", flush=True)

    if "pallas_T" in which:
        outP = timed(
            "pallas_T",
            jax.jit(chain_pallas_T),
            accT,
            pxT,
            pyT,
            pinfT.astype(jnp.int32),
            headsT.astype(jnp.int32),
        )
        if ref is not None:
            for a, b in zip(ref, outP):
                assert (np.asarray(a) == np.asarray(b).T).all(), "pallas_T mismatch"
            print("pallas_T bit-exact", flush=True)


if __name__ == "__main__":
    main()


# ---------------------------------------------------- kernel-op microbench
def _op_chain_call(n: int, tile: int, reps: int, op: str):
    grid = (n // tile,)
    blk = pl.BlockSpec((L.NLIMBS, tile), lambda i: (0, i), memory_space=pltpu.VMEM)

    def fixed(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, nd=nd: (0,) * nd, memory_space=pltpu.VMEM)

    cspecs = [fixed(np.asarray(CONSTS[k]).shape) for k in _CONST_KEYS]
    cvals = [jnp.asarray(CONSTS[k]) for k in _CONST_KEYS]

    fori = os.environ.get("PROF_FORI", "") not in ("", "0")

    def _one(x, b, consts):
        if op == "mul":
            return T.mont_mul(consts, x, b)
        if op == "mul32":
            return T.mont_mul_i32(consts, x, b)
        if op == "mul32raw":
            t = T._mul_lanes_i32(x, b)
            return t[:16] & 0xFFFF
        if op == "redc32":
            t17 = jnp.concatenate([x, jnp.zeros_like(x[0:1])], axis=0)
            return T.redc_i32(consts, t17)
        if op == "add":
            return T.add(consts, x, b)
        if op == "sub":
            return T.sub(consts, x, b)
        if op == "raw":
            return (x + b) & 0xFFFF
        if op == "c16":
            return T._carry16(x + b, 16)
        if op == "noop":
            return x
        raise ValueError(op)

    def kernel(a_ref, b_ref, *rest):
        crefs, (o_ref,) = rest[: len(_CONST_KEYS)], rest[len(_CONST_KEYS) :]
        consts = {**_STATIC_CONSTS, **{k: r[:] for k, r in zip(_CONST_KEYS, crefs)}}
        x = a_ref[:]
        b = b_ref[:]
        if fori:
            o_ref[:] = jax.lax.fori_loop(0, reps, lambda i, x: _one(x, b, consts), x)
            return
        for _ in range(reps):
            if op == "mul":
                x = T.mont_mul(consts, x, b)
            elif op == "mul32":
                x = T.mont_mul_i32(consts, x, b)
            elif op == "mul32raw":
                t = T._mul_lanes_i32(x, b)
                x = t[:16] & 0xFFFF
            elif op == "redc32":
                t17 = jnp.concatenate([x, jnp.zeros_like(x[0:1])], axis=0)
                x = T.redc_i32(consts, t17)
            elif op == "add":
                x = T.add(consts, x, b)
            elif op == "sub":
                x = T.sub(consts, x, b)
            elif op == "raw":
                x = (x + b) & 0xFFFF
            elif op == "c16":
                x = T._carry16(x + b, 16)
            elif op == "csub":
                x17 = jnp.concatenate([x, jnp.zeros_like(x[0:1])], axis=0)
                x = T._cond_sub_p(consts, x17)
                x = (x + b) & 0xFFFF  # keep the chain data-dependent
            elif op == "mulraw":
                t = T._mul_lanes(consts, x, b)
                x = t[:16] & 0xFFFF
            elif op == "rawi32":
                x = ((x.astype(jnp.int32) + b.astype(jnp.int32)) & 0xFFFF).astype(jnp.uint32)
            elif op == "noop":
                x = x
        o_ref[:] = x

    def call(a, b):
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[blk, blk] + cspecs,
            out_specs=blk,
            out_shape=jax.ShapeDtypeStruct((L.NLIMBS, n), jnp.uint32),
        )(a, b, *cvals)

    return call


def kernel_micro():
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.randint(0, 1 << 16, size=(16, N)).astype(np.uint32))
    b = jnp.asarray((rng.randint(0, 1 << 15, size=(16, N))).astype(np.uint32))
    reps = int(os.environ.get("PROF_REPS", "32"))
    ops = os.environ.get("PROF_OPS", "mul,add,sub").split(",")
    for op in ops:
        call = _op_chain_call(N, TILE, reps, op)
        f = jax.jit(call)
        out = f(a, b)
        np.asarray(out)
        t0 = time.time()
        np.asarray(f(a, b))
        dt = time.time() - t0
        per = dt / (N * reps)
        print(f"pallas_{op} ({N}) x{reps} tile={TILE}: {dt*1e3:9.1f} ms  {per*1e9:7.1f} ns/op", flush=True)


if "kmicro" in sys.argv[1:]:
    kernel_micro()
