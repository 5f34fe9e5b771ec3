"""Batched basis transforms on device: the prover's NTT workhorse.

All Lagrange<->coefficient<->extended-coset conversions for whole column
batches go through the TPU NTT kernel (ops/ntt.py) as ONE jitted program
each (Montgomery conversion and coset scaling included) — the host-int
lists are bulk-converted to uint32 limb arrays only at the edges.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import limb as L
from ..fields.host import FP
from ..fields.limb import FP_SPEC, ints_to_limbs, limbs_to_ints
from ..ops import ntt as D
from .domain import EvaluationDomain
from ..ops.dispatch import device_call


def _to_limb_batch(columns: list[list[int]]) -> np.ndarray:
    n_cols = len(columns)
    n = len(columns[0])
    flat = [v for col in columns for v in col]
    return ints_to_limbs(flat).reshape(n_cols, n, L.NLIMBS)


def _from_limb_batch(arr) -> list[list[int]]:
    plain = np.asarray(arr)
    n_cols, n = plain.shape[0], plain.shape[1]
    flat = limbs_to_ints(plain.reshape(n_cols * n, L.NLIMBS))
    return [flat[i * n : (i + 1) * n] for i in range(n_cols)]


@functools.lru_cache(maxsize=None)
def _jit_lagrange_to_coeff(modulus: int, n: int, omega: int):
    plan_inv = D.plan_for(modulus, n, pow(omega, -1, modulus))
    n_inv_mont = L.int_to_limbs(pow(n, -1, modulus) * FP_SPEC.r_mod_p % modulus)

    @jax.jit
    def f(a):
        # sequential over the poly batch: bounds peak HBM (chunk expansion)
        return jax.lax.map(
            lambda p: L.from_mont(FP_SPEC, D.intt(plan_inv, L.to_mont(FP_SPEC, p), n_inv_mont)), a
        )

    return f


@functools.lru_cache(maxsize=None)
def _jit_coeff_to_lagrange(modulus: int, n: int, omega: int):
    plan = D.plan_for(modulus, n, omega)

    @jax.jit
    def f(a):
        return jax.lax.map(lambda p: L.from_mont(FP_SPEC, D.ntt(plan, L.to_mont(FP_SPEC, p))), a)

    return f


@functools.lru_cache(maxsize=None)
def _jit_coeff_to_extended(modulus: int, ext: int, ext_omega: int, g: int):
    plan = D.plan_for(modulus, ext, ext_omega)
    scale = D.make_scale_vector(FP, g, ext, FP_SPEC)

    @jax.jit
    def f(a):
        def one(p):
            pm = L.to_mont(FP_SPEC, p)
            pm = L.mont_mul(FP_SPEC, pm, jnp.asarray(scale))
            return L.from_mont(FP_SPEC, D.ntt(plan, pm))

        return jax.lax.map(one, a)

    return f


@functools.lru_cache(maxsize=None)
def _jit_extended_to_coeff(modulus: int, ext: int, ext_omega: int, g_inv: int):
    plan_inv = D.plan_for(modulus, ext, pow(ext_omega, -1, modulus))
    n_inv_mont = L.int_to_limbs(pow(ext, -1, modulus) * FP_SPEC.r_mod_p % modulus)
    inv_scale = D.make_scale_vector(FP, g_inv, ext, FP_SPEC)

    @jax.jit
    def f(a):
        def one(p):
            pm = D.intt(plan_inv, L.to_mont(FP_SPEC, p), n_inv_mont)
            pm = L.mont_mul(FP_SPEC, pm, jnp.asarray(inv_scale))
            return L.from_mont(FP_SPEC, pm)

        return jax.lax.map(one, a)

    return f


def _maybe_sharded(columns, n, omega, pre_g=1, post_g=1, post_k=1, what="sharded NTT"):
    """Under an active mesh (parallel/context.py), run the batch through the
    4-step sharded transform (parallel/ntt.py) — the prover's NTTs then ride
    the mesh exactly like its commitments ride the sharded MSM. Returns None
    when no mesh is active or the 4-step layout doesn't fit (n < D^2)."""
    from ..parallel.context import get_mesh, mesh_is_active
    from ..parallel.ntt import sharded_transform_batch, sharded_transform_supported

    if not mesh_is_active():
        return None
    mesh = get_mesh()
    if not sharded_transform_supported(mesh, n):
        return None
    f = lambda batch: sharded_transform_batch(mesh, n, omega, batch, pre_g, post_g, post_k)
    return _from_limb_batch(device_call(f, _to_limb_batch(columns), what=what))


def _maybe_native(columns, n, omega, pre_g=1, post_g=1, post_k=1):
    """Latency tier (ops/engine.py): run the batch through the native C++
    NTT when the problem is below the routing threshold — at k=11/12 sizes
    the transform is sub-millisecond on host while a device dispatch pays
    ~1.5 s of relay latency. Returns None when routed to the device."""
    from ..ops.engine import use_host_engine

    if not use_host_engine(n):
        return None
    from .. import native

    which = native.which_for(FP.modulus)
    b = len(columns)
    data = np.zeros((b, n, 32), np.uint8)
    for i, col in enumerate(columns):
        data[i, : len(col)] = native.ints_to_bytes_arr(col)
    if pre_g != 1:
        native.scale_batch(which, data, pre_g, 1)
    native.ntt_batch(which, data, omega)
    if post_g != 1 or post_k != 1:
        native.scale_batch(which, data, post_g, post_k)
    from ..pcs.ipa import PolyInts

    return [
        PolyInts.wrap(native.bytes_arr_to_ints(data[i]), data[i]) for i in range(b)
    ]


def batch_lagrange_to_coeff(domain: EvaluationDomain, columns: list[list[int]]) -> list[list[int]]:
    if not columns:
        return []
    n_inv = pow(domain.n, -1, FP.modulus)
    omega_inv = pow(domain.omega, -1, FP.modulus)
    out = _maybe_sharded(columns, domain.n, omega_inv, post_k=n_inv, what="sharded batch iNTT")
    if out is None:
        out = _maybe_native(columns, domain.n, omega_inv, post_k=n_inv)
    if out is not None:
        return out
    f = _jit_lagrange_to_coeff(FP.modulus, domain.n, domain.omega)
    return _from_limb_batch(device_call(f, _to_limb_batch(columns), what="batch iNTT"))


def batch_coeff_to_lagrange(domain: EvaluationDomain, polys: list[list[int]]) -> list[list[int]]:
    if not polys:
        return []
    out = _maybe_sharded(polys, domain.n, domain.omega, what="sharded batch NTT")
    if out is None:
        out = _maybe_native(
            [list(p) + [0] * (domain.n - len(p)) for p in polys], domain.n, domain.omega
        )
    if out is not None:
        return out
    f = _jit_coeff_to_lagrange(FP.modulus, domain.n, domain.omega)
    return _from_limb_batch(device_call(f, _to_limb_batch(polys), what="batch NTT"))


def batch_coeff_to_extended(domain: EvaluationDomain, polys: list[list[int]]) -> list[list[int]]:
    if not polys:
        return []
    ext = domain.extended_n
    padded = [list(p) + [0] * (ext - len(p)) for p in polys]
    out = _maybe_sharded(
        padded, ext, domain.extended_omega, pre_g=domain.g_coset, what="sharded batch extended NTT"
    )
    if out is None:
        out = _maybe_native(padded, ext, domain.extended_omega, pre_g=domain.g_coset)
    if out is not None:
        return out
    f = _jit_coeff_to_extended(FP.modulus, ext, domain.extended_omega, domain.g_coset)
    return _from_limb_batch(device_call(f, _to_limb_batch(padded), what="batch extended NTT"))


def batch_extended_to_coeff(domain: EvaluationDomain, evals: list[list[int]]) -> list[list[int]]:
    if not evals:
        return []
    ext = domain.extended_n
    out = _maybe_sharded(
        evals,
        ext,
        pow(domain.extended_omega, -1, FP.modulus),
        post_g=domain.g_coset_inv,
        post_k=pow(ext, -1, FP.modulus),
        what="sharded batch extended iNTT",
    )
    if out is None:
        out = _maybe_native(
            evals,
            ext,
            pow(domain.extended_omega, -1, FP.modulus),
            post_g=domain.g_coset_inv,
            post_k=pow(ext, -1, FP.modulus),
        )
    if out is not None:
        return out
    f = _jit_extended_to_coeff(FP.modulus, ext, domain.extended_omega, domain.g_coset_inv)
    return _from_limb_batch(device_call(f, _to_limb_batch(evals), what="batch extended iNTT"))
