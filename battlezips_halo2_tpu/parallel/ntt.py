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
