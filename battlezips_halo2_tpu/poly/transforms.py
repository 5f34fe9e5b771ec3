"""Batched basis transforms on device: the prover's NTT workhorse.

All Lagrange<->coefficient<->extended-coset conversions for whole column
batches go through the TPU NTT kernel (ops/ntt.py) in one call — the
host-int lists are bulk-converted to Montgomery limb arrays at the edges.
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


def _to_device_mont(columns: list[list[int]]):
    n_cols = len(columns)
    n = len(columns[0])
    flat = [v for col in columns for v in col]
    arr = ints_to_limbs(flat).reshape(n_cols, n, L.NLIMBS)
    return L.to_mont(FP_SPEC, jnp.asarray(arr))


def _from_device_mont(arr) -> list[list[int]]:
    plain = np.asarray(L.from_mont(FP_SPEC, arr))
    n_cols, n = plain.shape[0], plain.shape[1]
    flat = limbs_to_ints(plain.reshape(n_cols * n, L.NLIMBS))
    return [flat[i * n : (i + 1) * n] for i in range(n_cols)]


@functools.lru_cache(maxsize=None)
def _jit_ntt(modulus: int, n: int, omega: int):
    plan = D.plan_for(modulus, n, omega)
    return jax.jit(lambda a: D.ntt(plan, a))


@functools.lru_cache(maxsize=None)
def _jit_intt(modulus: int, n: int, omega: int):
    plan_inv = D.plan_for(modulus, n, pow(omega, -1, modulus))
    n_inv_mont = L.int_to_limbs(pow(n, -1, modulus) * FP_SPEC.r_mod_p % modulus)
    return jax.jit(lambda a: D.intt(plan_inv, a, n_inv_mont))


def batch_lagrange_to_coeff(domain: EvaluationDomain, columns: list[list[int]]) -> list[list[int]]:
    if not columns:
        return []
    f = _jit_intt(FP.modulus, domain.n, domain.omega)
    return _from_device_mont(f(_to_device_mont(columns)))


def batch_coeff_to_lagrange(domain: EvaluationDomain, polys: list[list[int]]) -> list[list[int]]:
    if not polys:
        return []
    f = _jit_ntt(FP.modulus, domain.n, domain.omega)
    return _from_device_mont(f(_to_device_mont(polys)))


@functools.lru_cache(maxsize=None)
def _coset_scale(modulus: int, g: int, n: int):
    return jnp.asarray(D.make_scale_vector(FP, g, n, FP_SPEC))


def batch_coeff_to_extended(domain: EvaluationDomain, polys: list[list[int]]) -> list[list[int]]:
    """Evaluate each coefficient poly on the extended coset {g * w_ext^i}."""
    if not polys:
        return []
    ext = domain.extended_n
    padded = [list(p) + [0] * (ext - len(p)) for p in polys]
    a = _to_device_mont(padded)
    scale = _coset_scale(FP.modulus, domain.g_coset, ext)
    a = L.mont_mul(FP_SPEC, a, scale[None, :, :])
    f = _jit_ntt(FP.modulus, ext, domain.extended_omega)
    return _from_device_mont(f(a))


def batch_extended_to_coeff(domain: EvaluationDomain, evals: list[list[int]]) -> list[list[int]]:
    if not evals:
        return []
    ext = domain.extended_n
    f = _jit_intt(FP.modulus, ext, domain.extended_omega)
    out = _from_device_mont(f(_to_device_mont(evals)))
    # unscale by coset powers
    m = FP.modulus
    g_inv = domain.g_coset_inv
    res = []
    for coeffs in out:
        acc = 1
        scaled = []
        for c in coeffs:
            scaled.append(c * acc % m)
            acc = acc * g_inv % m
        res.append(scaled)
    return res
