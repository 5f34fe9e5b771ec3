"""Radix-2 NTT/iNTT over Fp on device (JAX, limb representation).

TPU-native design (SURVEY.md §7.1 item 3): fully static shapes, log2(n)
unrolled butterfly stages, each stage one vectorized Montgomery multiply of
n/2 lanes (VPU-friendly (n, 16) uint32 layout), twiddles precomputed
host-side in Montgomery form and closed over as constants. Bit-exact against
poly/domain.py's host NTT.

The multi-chip 4-step variant (all_to_all butterfly exchange) lives in
parallel/ntt.py.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..fields import limb as L
from ..fields.host import FP, Field
from ..fields.limb import FieldSpec, int_to_limbs
from ..poly.domain import bit_reverse


class NttPlan:
    """Precomputed twiddle tables + bit-reverse permutation for one (n, omega)."""

    def __init__(self, spec: FieldSpec, n: int, omega: int):
        self.spec = spec
        self.n = n
        self.omega = omega
        field = spec.host
        logn = n.bit_length() - 1
        self.logn = logn
        self.rev_idx = np.array([bit_reverse(i, logn) for i in range(n)], dtype=np.int32)
        r = spec.r_mod_p
        self.stage_twiddles = []
        length = 2
        while length <= n:
            half = length // 2
            w_len = pow(omega, n // length, field.modulus)
            tw = []
            w = 1
            for _ in range(half):
                tw.append(int_to_limbs(w * r % field.modulus))  # Montgomery form
                w = w * w_len % field.modulus
            self.stage_twiddles.append(np.stack(tw))
            length *= 2


@functools.lru_cache(maxsize=None)
def plan_for(modulus: int, n: int, omega: int) -> NttPlan:
    spec = FieldSpec.make(modulus)
    return NttPlan(spec, n, omega)


def ntt(plan: NttPlan, a):
    """NTT of Montgomery-form limbs, shape (..., n, 16); natural order in
    and out."""
    spec = plan.spec
    n = plan.n
    batch = a.shape[:-2]
    a = jnp.take(a, jnp.asarray(plan.rev_idx), axis=-2)
    for stage, tw in enumerate(plan.stage_twiddles):
        half = tw.shape[0]
        length = half * 2
        groups = n // length
        a = a.reshape(batch + (groups, 2, half, L.NLIMBS))
        u = a[..., 0, :, :]
        v = L.mont_mul(spec, a[..., 1, :, :], jnp.asarray(tw))
        out0 = L.add(spec, u, v)
        out1 = L.sub(spec, u, v)
        a = jnp.stack([out0, out1], axis=-3).reshape(batch + (n, L.NLIMBS))
    return a


def intt(plan_inv: NttPlan, a, n_inv_mont):
    """Inverse NTT: run ntt with the inverse-omega plan, then scale by 1/n.
    ``n_inv_mont``: (16,) limb array of n^-1 in Montgomery form."""
    out = ntt(plan_inv, a)
    return L.mont_mul(plan_inv.spec, out, jnp.broadcast_to(jnp.asarray(n_inv_mont), out.shape))


def make_scale_vector(field: Field, g: int, n: int, spec: FieldSpec) -> np.ndarray:
    """Powers g^i, i < n, in Montgomery limb form (coset scaling)."""
    r = spec.r_mod_p
    out = []
    acc = 1
    for _ in range(n):
        out.append(int_to_limbs(acc * r % field.modulus))
        acc = acc * g % field.modulus
    return np.stack(out)
