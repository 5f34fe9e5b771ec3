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
    """Precomputed twiddle tables, butterfly gather indices and bit-reverse
    permutation for one (n, omega).

    Stages are executed as flat row-gathers over (n, 16) arrays — no
    reshapes with tiny middle dims (those force expensive TPU relayouts):
    ``u = a[idx_u]; v = a[idx_v]; a = concat(u + v*tw, u - v*tw)[idx_out]``.
    """

    def __init__(self, spec: FieldSpec, n: int, omega: int):
        self.spec = spec
        self.n = n
        self.omega = omega
        field = spec.host
        logn = n.bit_length() - 1
        self.logn = logn
        self.rev_idx = np.array([bit_reverse(i, logn) for i in range(n)], dtype=np.int32)
        r = spec.r_mod_p
        self.stage_twiddles = []  # (half, 16) per stage (kept for 4-step reuse)
        self.stage_tw_full = []  # (n/2, 16) per stage, tiled per group
        self.stage_idx_u = []
        self.stage_idx_v = []
        self.stage_idx_out = []
        length = 2
        while length <= n:
            half = length // 2
            groups = n // length
            w_len = pow(omega, n // length, field.modulus)
            tw = []
            w = 1
            for _ in range(half):
                tw.append(int_to_limbs(w * r % field.modulus))  # Montgomery form
                w = w * w_len % field.modulus
            tw = np.stack(tw)
            self.stage_twiddles.append(tw)
            self.stage_tw_full.append(np.tile(tw, (groups, 1)))
            # pair index (g, j): u at g*length + j, v at g*length + j + half
            g = np.repeat(np.arange(groups), half)
            j = np.tile(np.arange(half), groups)
            idx_u = (g * length + j).astype(np.int32)
            idx_v = (g * length + j + half).astype(np.int32)
            idx_out = np.zeros(n, dtype=np.int32)
            idx_out[idx_u] = np.arange(n // 2)  # s0 block of the concat
            idx_out[idx_v] = np.arange(n // 2) + n // 2  # s1 block
            self.stage_idx_u.append(idx_u)
            self.stage_idx_v.append(idx_v)
            self.stage_idx_out.append(idx_out)
            length *= 2


@functools.lru_cache(maxsize=None)
def plan_for(modulus: int, n: int, omega: int) -> NttPlan:
    spec = FieldSpec.make(modulus)
    return NttPlan(spec, n, omega)


class NttArgPlan:
    """Lean plan for the ARGUMENT-twiddle butterfly: bit-reverse indices
    plus per-stage DISTINCT twiddles only (half entries per stage, n total
    — no n/2-tiled tables, no gather index triples). At n >= 2^20 the
    baked-constant tables of NttPlan push the relay's remote-compile
    payload past its HTTP 413 limit (~1.3 GB of twiddles at 2^20), so the
    big-n path ships twiddles as traced arguments instead: uploaded once
    as device arrays, referenced by every chained rep."""

    def __init__(self, spec: FieldSpec, n: int, omega: int):
        self.spec = spec
        self.n = n
        self.omega = omega
        field = spec.host
        logn = n.bit_length() - 1
        self.logn = logn
        self.rev_idx = np.array([bit_reverse(i, logn) for i in range(n)], dtype=np.int32)
        r = spec.r_mod_p
        self.stage_twiddles = []  # (half, 16) Montgomery, distinct only
        length = 2
        while length <= n:
            half = length // 2
            w_len = pow(omega, n // length, field.modulus)
            tw = []
            w = 1
            for _ in range(half):
                tw.append(int_to_limbs(w * r % field.modulus))
                w = w * w_len % field.modulus
            self.stage_twiddles.append(np.stack(tw))
            length *= 2

    def device_twiddles(self):
        """Per-stage twiddles as device arrays (upload once, pass as jit
        ARGS — closure capture would bake them as constants again)."""
        if not hasattr(self, "_dev_tw"):
            self._dev_tw = [jnp.asarray(t) for t in self.stage_twiddles]
        return self._dev_tw


@functools.lru_cache(maxsize=None)
def arg_plan_for(modulus: int, n: int, omega: int) -> NttArgPlan:
    return NttArgPlan(FieldSpec.make(modulus), n, omega)


def ntt_arg_tw(spec: FieldSpec, logn: int, a, rev_idx, tw_stages):
    """Radix-2 DIT butterfly with twiddles as traced arguments.

    a: (..., n, 16) Montgomery, natural order in AND out — bit-exact equal
    to ``ntt(plan, a)`` (tests/test_ops.py). Stages use reshape-contiguous
    pair addressing (pairs at distance 2^s live in a (groups, 2, half)
    view) so no per-stage gather indices are needed; only the single
    bit-reverse gather remains."""
    n = 1 << logn
    x = jnp.take(a, rev_idx, axis=-2)
    batch = x.shape[:-2]
    for s in range(logn):
        half = 1 << s
        groups = n >> (s + 1)
        g = x.reshape(batch + (groups, 2, half, L.NLIMBS))
        u = g[..., 0, :, :]
        v = g[..., 1, :, :]
        vt = L.mont_mul(spec, v, jnp.broadcast_to(tw_stages[s], v.shape))
        x = jnp.stack([L.add(spec, u, vt), L.sub(spec, u, vt)], axis=-3).reshape(
            batch + (n, L.NLIMBS)
        )
    return x


import os

from ..config import config as _config

# measured crossover on TPU v5e (tools/exp_ntt_variants.py 2026-08-20,
# BENCH_NOTES.md round 4): the matmul 4-step beats the butterfly path from
# 2^16 (39.7 vs 46.9 ms) with a widening gap at 2^18 (171.5 vs 247.4 ms).
# auto routes it for n >= 2^16 — the measured crossover (ADVICE r4: the
# 2^14/2^15 points were never benched; re-lower only with data). Upper
# bound: fp_const_matmul's i32 diagonal accumulator requires the
# contraction dim <= 1024, i.e. n <= 2^21 in the 4-step split
# (ops/ntt_mm.py assert); "BZ_NTT_MM=on" forces
_NTT_MM_MIN_N = 1 << 16
_NTT_MM_MAX_N = 1 << 21
# transposed fused butterfly (pallas_kernels.butterfly_stage_T): in the
# (16, lanes) layout a stage needs NO gathers (groups are contiguous lane
# slices and the output interleave is a static stack), and the i32 fused
# mul microbenchmarks ~7x the XLA chunk path — but the sibling MSM fused
# path regressed end-to-end, so this stays OPT-IN (BZ_PALLAS_NTT_T=1)
# until the full-NTT number on the chip beats the jnp path.



def _ntt_T(plan: NttPlan, a, interpret: bool = False):
    """Transposed-layout NTT: one fused butterfly kernel per stage, no
    index gathers (see _PALLAS_NTT_T note). a: (..., n, 16) Montgomery."""
    from .pallas_kernels import butterfly_stage_T

    spec = plan.spec
    n = plan.n
    batch = a.shape[:-2]
    b_flat = 1
    for d in batch:
        b_flat *= d
    a = jnp.take(a, jnp.asarray(plan.rev_idx), axis=-2)
    x = jnp.swapaxes(a.reshape((max(1, b_flat), n, L.NLIMBS)), -1, -2)  # (B, 16, n)
    if not hasattr(plan, "_tw_T"):
        plan._tw_T = [np.ascontiguousarray(t.T) for t in plan.stage_tw_full]
    length = 2
    for stage in range(plan.logn):
        half = length // 2
        groups = n // length
        g = x.reshape(-1, L.NLIMBS, groups, length)
        u = g[..., :half].reshape(-1, L.NLIMBS, n // 2)
        v = g[..., half:].reshape(-1, L.NLIMBS, n // 2)
        tw = jnp.asarray(plan._tw_T[stage])
        out0, out1 = butterfly_stage_T(spec, u, v, tw, interpret=interpret)
        x = jnp.concatenate(
            [
                out0.reshape(-1, L.NLIMBS, groups, half),
                out1.reshape(-1, L.NLIMBS, groups, half),
            ],
            axis=-1,
        ).reshape(-1, L.NLIMBS, n)
        length *= 2
    return jnp.swapaxes(x, -1, -2).reshape(batch + (n, L.NLIMBS))


def ntt(plan: NttPlan, a):
    """NTT of Montgomery-form limbs, shape (..., n, 16); natural order in
    and out. On the TPU backend with n >= 512 each stage runs as one fused
    transposed Pallas butterfly (BZ_NO_PALLAS_NTT_T=1 opts out);
    BZ_PALLAS_NTT=1 selects the legacy row-layout kernel instead."""
    spec = plan.spec
    n = plan.n
    batch = a.shape[:-2]
    mm_mode = _config().ntt_mm
    if mm_mode == "on" or (
        mm_mode == "auto" and _NTT_MM_MIN_N <= n <= _NTT_MM_MAX_N and _pallas_ok()
    ):
        # matmul 4-step path: MXU-bound instead of gather/HBM-bound — the
        # default on TPU for sizes where it wins (tools/exp_ntt_variants.py)
        from .ntt_mm import mm_plan_for, ntt_mm

        return ntt_mm(mm_plan_for(spec.modulus, n, plan.omega), a)
    use_fused = _config().pallas_ntt and _pallas_ok()
    if _config().pallas_ntt_t and not use_fused and n >= 512 and _pallas_ok():
        return _ntt_T(plan, a)
    a = jnp.take(a, jnp.asarray(plan.rev_idx), axis=-2)
    for stage in range(plan.logn):
        idx_u = jnp.asarray(plan.stage_idx_u[stage])
        idx_v = jnp.asarray(plan.stage_idx_v[stage])
        idx_out = jnp.asarray(plan.stage_idx_out[stage])
        tw_full = jnp.asarray(plan.stage_tw_full[stage])
        u = jnp.take(a, idx_u, axis=-2)
        v = jnp.take(a, idx_v, axis=-2)
        if use_fused:
            from .pallas_kernels import butterfly_stage

            b_flat = 1
            for d in batch:
                b_flat *= d
            u2 = u.reshape(max(1, b_flat), n // 2, L.NLIMBS)
            v2 = v.reshape(max(1, b_flat), n // 2, L.NLIMBS)
            out0, out1 = butterfly_stage(spec, u2, v2, tw_full)
            out0 = out0.reshape(batch + (n // 2, L.NLIMBS))
            out1 = out1.reshape(batch + (n // 2, L.NLIMBS))
        else:
            vt = L.mont_mul(spec, v, tw_full)
            out0 = L.add(spec, u, vt)
            out1 = L.sub(spec, u, vt)
        a = jnp.take(jnp.concatenate([out0, out1], axis=-2), idx_out, axis=-2)
    return a


def _pallas_ok() -> bool:
    import jax

    return jax.default_backend() == "tpu"


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
