"""Multi-chip 4-step (Bailey) NTT with all_to_all butterfly exchange.

The framework's sequence-parallel component (SURVEY.md §5.7): a length-n
coefficient vector is sharded contiguously over D devices as an (D x C)
matrix (n = D*C, rows j1 = device, cols j2 local). Writing
j = j1*C + j2 and k = k1 + k2*D:

    X[k1 + k2 D] = NTT_C over j2 [ w^(j2 k1) * NTT_D over j1 [ a[j1, j2] ] ]

Three all_to_alls choreograph the layout:
  1. transpose so each device owns full columns  -> local NTT_D (tiny)
  2. twiddle by w^(j2 k1) (the sharded twiddle table rides in as an operand)
     and transpose back                         -> local NTT_C (the big one)
  3. final transpose from CRT order (k1 + k2 D) to natural order

Per-device compute is NTT(n/D) + O(n/D) — ideal scaling; communication is
3 all-to-alls of n/D elements over ICI. Bit-exact vs the host NTT.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..fields import limb as L
from ..fields.host import FP
from ..fields.limb import FP_SPEC, int_to_limbs
from ..ops import ntt as D_ntt
from .collectives import AXIS

_MESHES: dict = {}


def _twiddle_table(n: int, omega: int, d: int) -> np.ndarray:
    """(D, C, 16) Montgomery twiddles: tw[k1, j2] = omega^(j2*k1)."""
    c = n // d
    r = FP_SPEC.r_mod_p
    m = FP.modulus
    out = np.zeros((d, c, L.NLIMBS), dtype=np.uint32)
    for k1 in range(d):
        w = pow(omega, k1, m)
        acc = 1
        for j2 in range(c):
            out[k1, j2] = int_to_limbs(acc * r % m)
            acc = acc * w % m
    return out


@functools.lru_cache(maxsize=None)
def _compiled_distributed_ntt(modulus: int, n: int, omega: int, mesh_key):
    mesh = _MESHES[mesh_key]
    d = mesh.devices.size
    c = n // d
    assert c % d == 0, "n must be divisible by D^2 for the all_to_all layout"
    plan_d = D_ntt.plan_for(modulus, d, pow(omega, c, modulus))
    plan_c = D_ntt.plan_for(modulus, c, pow(omega, d, modulus))
    twiddles = jnp.asarray(_twiddle_table(n, omega, d))

    def local_fn(a, tw):
        # a: (C, 16) rows of this device (j1 = my index); tw: (D, C/D, 16)
        # --- step 0: transpose to full columns -----------------------------
        x = a.reshape(d, c // d, L.NLIMBS)
        x = jax.lax.all_to_all(x, AXIS, split_axis=0, concat_axis=0)
        # x: (D, C/D, 16) with axis0 = j1, axis1 = local j2
        # --- step 1: NTT_D along j1 ---------------------------------------
        x = jnp.moveaxis(x, 0, 1)  # (C/D, D, 16)
        x = D_ntt.ntt(plan_d, x)
        x = jnp.moveaxis(x, 1, 0)  # (D=k1, C/D=j2, 16)
        # --- step 2: twiddle + transpose back ------------------------------
        x = L.mont_mul(FP_SPEC, x, tw)
        x = jax.lax.all_to_all(x, AXIS, split_axis=0, concat_axis=0)
        # x: (D, C/D, 16): axis0 = source device (j2 chunk), my row k1
        x = x.reshape(c, L.NLIMBS)  # full row k1 = my index, j2 natural
        # --- step 3: NTT_C along j2 ---------------------------------------
        x = D_ntt.ntt(plan_c, x)
        # x[k2] for k = k1 + k2*D; final transpose to natural order
        x = x.reshape(d, c // d, L.NLIMBS)  # axis0 = k2 chunk owner
        x = jax.lax.all_to_all(x, AXIS, split_axis=0, concat_axis=0)
        # now axis0 = k1, axis1 = local k2; natural order interleaves
        # k = k1 + (k2_chunk_base + k2_local)*D: ascending k <=> (k2, k1) lex
        x = jnp.moveaxis(x, 0, 1).reshape(c, L.NLIMBS)
        return x

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(AXIS), P(None, AXIS)),
        out_specs=P(AXIS),
        check_rep=False,
    )
    return jax.jit(fn), twiddles


def distributed_ntt(mesh, n: int, omega: int, a_mont):
    """NTT of a Montgomery-form (n, 16) array sharded (or shardable) over
    the mesh axis; returns natural-order evaluations."""
    mesh_key = tuple(str(dev) for dev in mesh.devices.flat)
    _MESHES[mesh_key] = mesh
    f, twiddles = _compiled_distributed_ntt(FP.modulus, n, omega, mesh_key)
    # twiddles: (D, C, 16) with in_spec P(None, AXIS) — each device gets
    # tw[:, its j2 chunk], exactly what the post-transpose layout needs
    return f(a_mont, twiddles)


def _geom_vector(n: int, g: int, k: int = 1) -> np.ndarray:
    """(n, 16) Montgomery vector v[i] = k * g^i — pre/post scaling for the
    basis transforms (coset shift g^i, 1/n normalization, or both)."""
    m = FP.modulus
    r = FP_SPEC.r_mod_p
    out = np.zeros((n, L.NLIMBS), dtype=np.uint32)
    acc = k % m
    for i in range(n):
        out[i] = int_to_limbs(acc * r % m)
        acc = acc * g % m
    return out


@functools.lru_cache(maxsize=None)
def _compiled_sharded_transform(
    modulus: int, n: int, omega: int, pre_g: int, post_g: int, post_k: int, mesh_key
):
    """One jitted sharded program computing, for a batch of PLAIN-form
    columns: from_mont( post ∘ NTT_omega ∘ pre ∘ to_mont ) — the common
    shape of all four prover basis transforms (poly/transforms.py):

        lagrange_to_coeff: omega = w^-1,     pre = 1,    post = 1/n
        coeff_to_lagrange: omega = w,        pre = 1,    post = 1
        coeff_to_extended: omega = w_ext,    pre = g^i,  post = 1
        extended_to_coeff: omega = w_ext^-1, pre = 1,    post = g^-i / n

    The NTT is the 4-step/Bailey decomposition of _compiled_distributed_ntt
    (3 all_to_alls over the mesh axis); the batch rides a lax.map so peak
    HBM stays one column's working set per device."""
    mesh = _MESHES[mesh_key]
    d = mesh.devices.size
    c = n // d
    assert c % d == 0, "n must be divisible by D^2 for the all_to_all layout"
    plan_d = D_ntt.plan_for(modulus, d, pow(omega, c, modulus))
    plan_c = D_ntt.plan_for(modulus, c, pow(omega, d, modulus))
    twiddles = jnp.asarray(_twiddle_table(n, omega, d))
    pre = jnp.asarray(_geom_vector(n, pre_g))
    post = jnp.asarray(_geom_vector(n, post_g, post_k))

    def core(a, tw):
        # a: (C, 16) Montgomery rows of this device — the distributed-NTT body
        x = a.reshape(d, c // d, L.NLIMBS)
        x = jax.lax.all_to_all(x, AXIS, split_axis=0, concat_axis=0)
        x = jnp.moveaxis(x, 0, 1)
        x = D_ntt.ntt(plan_d, x)
        x = jnp.moveaxis(x, 1, 0)
        x = L.mont_mul(FP_SPEC, x, tw)
        x = jax.lax.all_to_all(x, AXIS, split_axis=0, concat_axis=0)
        x = x.reshape(c, L.NLIMBS)
        x = D_ntt.ntt(plan_c, x)
        x = x.reshape(d, c // d, L.NLIMBS)
        x = jax.lax.all_to_all(x, AXIS, split_axis=0, concat_axis=0)
        return jnp.moveaxis(x, 0, 1).reshape(c, L.NLIMBS)

    def local_fn(batch, tw, pre_l, post_l):
        def one(p):
            pm = L.mont_mul(FP_SPEC, L.to_mont(FP_SPEC, p), pre_l)
            x = core(pm, tw)
            return L.from_mont(FP_SPEC, L.mont_mul(FP_SPEC, x, post_l))

        return jax.lax.map(one, batch)

    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(None, AXIS), P(None, AXIS), P(AXIS), P(AXIS)),
        out_specs=P(None, AXIS),
        check_rep=False,
    )
    return jax.jit(fn), twiddles, pre, post


def sharded_transform_batch(
    mesh, n: int, omega: int, batch_plain, pre_g: int = 1, post_g: int = 1, post_k: int = 1
):
    """Apply the sharded basis transform to a (B, n, 16) PLAIN-form limb
    batch; returns the (B, n, 16) plain-form result. Bit-exact vs the
    single-device transforms (tests/test_parallel.py)."""
    mesh_key = tuple(str(dev) for dev in mesh.devices.flat)
    _MESHES[mesh_key] = mesh
    f, tw, pre, post = _compiled_sharded_transform(
        FP.modulus, n, omega, pre_g, post_g, post_k, mesh_key
    )
    return f(batch_plain, tw, pre, post)


def sharded_transform_supported(mesh, n: int) -> bool:
    """Shape gate: the 4-step layout needs n divisible by D^2."""
    d = mesh.devices.size
    return d > 1 and n % (d * d) == 0
