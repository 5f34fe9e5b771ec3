"""Transposed-layout (limb-major) device field arithmetic: (16, N) arrays.

The row layout in ``fields/limb.py`` keeps the 16 limbs in the MINOR
dimension, which the TPU pads to 128 lanes — every vector register holds
16/128 useful lanes. This module is the same Montgomery arithmetic with the
limb axis LEADING, so the minor dimension is the element axis: full
128-lane occupancy for the carry/borrow chains and a (K=1024-contraction)
MXU matmul for the schoolbook product. Intended for Pallas kernels (and
jnp use) on the MSM/NTT hot paths; validated bit-exactly against
``fields/limb.py`` (tests/test_pallas_kernels.py).

Layout: element value = Σ a[j, i] · 2^(16 j) — a (16, N) uint32 array of
16-bit limbs, little-endian along axis 0. All ops keep every intermediate
≥2-D (TPU vector constraint): per-limb rows are (1, N) slices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import limb as L
from .limb import MASK, NLIMBS, U32, FieldSpec

# ---------------------------------------------------------------- constants


def consts_t(spec: FieldSpec):
    """Constant arrays for the transposed kernels (numpy: safe to close
    over inside jit traces and pallas kernels alike).

    The Toeplitz REDC constants are permuted so the kernel body needs only
    contiguous concat/slice (Mosaic cannot lower interleaving stacks or
    strided slices): chunk input order is [all lo-halves | all hi-halves]
    (see _to_chunks8) and the p-Toeplitz output lanes come as
    [all even 8-lanes | all odd 8-lanes] so the 16-bit fold is two
    contiguous halves."""
    conv_full_j, _conv_low_j = L._conv_mats_jmajor()
    # chunk-order permutation for the N'-Toeplitz input (a8 arrives
    # deinterleaved: [lo limbs | hi limbs]); the p-Toeplitz input (m8) stays
    # in natural 8-bit-lane order, so only its OUTPUT lanes are permuted
    # (evens first, then odds) for the contiguous 16-bit fold
    chunk_perm = np.concatenate([np.arange(0, 32, 2), np.arange(1, 32, 2)])
    toep_n8_T = np.ascontiguousarray(spec.toep_n8.astype(np.float32).T)[:, chunk_perm]
    out_perm = np.concatenate([np.arange(0, 66, 2), np.arange(1, 66, 2)])
    toep_p8_T = np.ascontiguousarray(spec.toep_p8.astype(np.float32).T)[out_perm]
    # f32 outer-product accumulation matrices: pairwise 8-bit chunk products
    # p_{i,j} = a8[i]*b8[j] (exact f32, <= 255^2) land at 8-bit position
    # pos(i)+pos(j); split by parity into 16-bit lanes so each matmul lane
    # sums <= 32 * 255^2 < 2^24 (exact in f32 accumulation).
    # Row order matches the kernel's product construction: r = j*32 + i with
    # i, j in DEINTERLEAVED chunk order ([lo limbs | hi limbs]).
    pos = np.concatenate([np.arange(0, 32, 2), np.arange(1, 32, 2)])  # chunk -> 8-bit position
    conv_even = np.zeros((34, 1024), dtype=np.float32)
    conv_odd = np.zeros((34, 1024), dtype=np.float32)
    for j in range(32):
        for i in range(32):
            k = pos[i] + pos[j]
            r = j * 32 + i
            if k % 2 == 0:
                conv_even[k // 2, r] = 1.0
            else:
                conv_odd[k // 2, r] = 1.0
    return {
        # (34, 1024) bf16: transposed j-major accumulation matrix (u32-product
        # chunk path — kept for reference/fallback)
        "conv_full_T": np.ascontiguousarray(np.asarray(conv_full_j, dtype=np.float32).T).astype(
            jnp.bfloat16
        ),
        "conv_even_T": conv_even,
        "conv_odd_T": conv_odd,
        # (32, 32) / (66, 32) bf16 Toeplitz REDC constants, transposed+permuted
        "toep_n8_T": toep_n8_T.astype(jnp.bfloat16),
        "toep_p8_T": toep_p8_T.astype(jnp.bfloat16),
        "p_col": spec.p_limbs.reshape(NLIMBS, 1),  # (16, 1) uint32
        "pp1_col": L.int_to_limbs(spec.modulus + 1).reshape(NLIMBS, 1),  # (16,1) p+1
        "pcomp17_col": np.array(
            [((1 << 272) - spec.modulus) >> (16 * i) & 0xFFFF for i in range(17)],
            dtype=np.uint32,
        ).reshape(17, 1),  # (17, 1) 2^272 - p
        "np_col": np.asarray(spec.nprime_limbs).reshape(NLIMBS, 1),  # (16, 1) -p^-1 mod 2^256
        "one_col": spec.one_mont.reshape(NLIMBS, 1),  # (16, 1) uint32
        # STATIC Python-int limb tuples (keys ending in _ints are not
        # arrays: pallas harnesses must close over them, not pass as refs)
        "np_ints": tuple(int(x) for x in spec.nprime_limbs),
        "p_ints": tuple(int(x) for x in spec.p_limbs),
    }


# ---------------------------------------------------------------- helpers


def _shift_up(x, d: int):
    """Shift rows down by d along the limb axis (lane j <- lane j-d)."""
    return jnp.concatenate([jnp.zeros((d,) + x.shape[1:], x.dtype), x[:-d]], axis=0)


def _carry16(t, nout: int):
    """Carry-propagate (L, N) unnormalized u32 lanes (each < 2^31) along
    axis 0 into nout canonical 16-bit limbs (drops the final carry-out).

    Kogge-Stone carry-lookahead: a couple of full-width settle passes bound
    every lane's residual carry to one bit, then a log-depth
    generate/propagate scan resolves the ripple — ~30 FULL-(L, N) vector
    ops instead of 3*nout serial (1, N) ops (the serial chain's tiny-op
    issue overhead dominates everything on TPU)."""
    lanes = t.shape[0]
    if lanes < nout:
        t = jnp.concatenate([t, jnp.zeros((nout - lanes,) + t.shape[1:], t.dtype)], axis=0)
    else:
        t = t[:nout]
    # settle pass: lanes < 2^31 -> < 2^16 + 2^15 (carries now in {0,1})
    u = (t & MASK) + _shift_up(t >> 16, 1)
    # generate/propagate Kogge-Stone over the one-bit carries
    g = u >> 16  # in {0, 1}
    p = ((u & MASK) == MASK).astype(U32)
    d = 1
    while d < nout:
        gs = _shift_up(g, d)
        ps = _shift_up(p, d)
        g = g | (p & gs)
        p = p & ps
        d *= 2
    cin = _shift_up(g, 1)  # carry-in per lane
    return (u + cin) & MASK


def _cond_sub_p(cst, r17):
    """r - p if r >= p, branchless; r17: (17, N) canonical limbs < 2p.

    Implemented as r + (2^272 - p) with a Kogge-Stone carry resolve: the
    carry out of lane 16 (bit 16 of the final lane-16 sum) is exactly the
    r >= p predicate, and the masked sum is r - p mod 2^272."""
    pc = cst["pcomp17_col"]  # (17, 1) uint32: (2^272 - p) limbs
    t = r17.astype(U32) + pc  # lanes < 2^17
    u = (t & MASK) + _shift_up(t >> 16, 1)
    g = u >> 16
    p = ((u & MASK) == MASK).astype(U32)
    d = 1
    while d < 17:
        g = g | (p & _shift_up(g, d))
        p = p & _shift_up(p, d)
        d *= 2
    cin = _shift_up(g, 1)
    s = u + cin
    diff = s & MASK
    ge = (s[16:17] >> 16) | g[16:17]  # carry out of the top lane: r >= p
    return jnp.where(ge != 0, diff, r17.astype(U32))[:NLIMBS]


# ---------------------------------------------------------------- field ops


def add(cst, a, b):
    s = a.astype(U32) + b.astype(U32)  # lanes < 2^17
    return _cond_sub_p(cst, _carry16(s, 17))


def sub(cst, a, b):
    """a - b as a + p + twos_complement(b) mod 2^256 (no signed borrow
    chain): lanewise sums < 3*2^16, one Kogge-Stone carry resolve."""
    t = a.astype(U32) + (b.astype(U32) ^ MASK) + cst["pp1_col"].astype(U32)
    r16 = _carry16(t, NLIMBS)  # mod 2^256 == a - b + p, in (0, 2p)
    r17 = jnp.concatenate([r16, jnp.zeros_like(r16[0:1])], axis=0)
    return _cond_sub_p(cst, r17)


def neg(cst, a):
    return sub(cst, jnp.zeros_like(a), a)


def _to_bf16(x):
    return x.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)


def _to_chunks8_f32(t16):
    """(16, N) canonical limbs -> (32, N) f32 8-bit chunks, deinterleaved
    [lo | hi] order (values < 256, exact in f32)."""
    lo = t16 & 0xFF
    hi = t16 >> 8
    return jnp.concatenate([lo, hi], axis=0).astype(jnp.int32).astype(jnp.float32)


def _mul_lanes(cst, a, b):
    """Full product of (16, N) x (16, N) as (34, N) unnormalized u32 lanes.

    No u32 multiplies anywhere: both operands split to 8-bit chunks (exact
    f32), pairwise products formed in f32 on the VPU (<= 255^2, exact), and
    two {0,1}-matrix f32 matmuls (Precision.HIGHEST) accumulate them into
    parity-split 16-bit lanes (sums < 2^24, exact). Result lanes < 2^30."""
    a8 = _to_chunks8_f32(a)
    b8 = _to_chunks8_f32(b)
    # (1024, N) f32, row r = j*32 + i (deinterleaved chunk indices)
    prod = jnp.concatenate([a8 * b8[j : j + 1] for j in range(2 * NLIMBS)], axis=0)
    t_even = jnp.matmul(
        jnp.asarray(cst["conv_even_T"]),
        prod,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    t_odd = jnp.matmul(
        jnp.asarray(cst["conv_odd_T"]),
        prod,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return t_even.astype(jnp.int32).astype(U32) + (
        t_odd.astype(jnp.int32).astype(U32) << 8
    )  # (34, N), lanes < 2^30


def _to_chunks8(t16):
    """(16, N) canonical limbs -> (32, N) 8-bit chunks bf16, DEINTERLEAVED
    order [all lo halves | all hi halves] (contiguous concat — consumers'
    constant matrices are column-permuted to match; see consts_t)."""
    lo = t16 & 0xFF
    hi = t16 >> 8
    return _to_bf16(jnp.concatenate([lo, hi], axis=0))


def redc(cst, t_lanes):
    """Montgomery REDC of (L>=17, N) unnormalized lanes (T < p*R) via the
    constant-operand Toeplitz matmuls; returns (16, N) canonical < p."""
    t_low = _carry16(t_lanes[:NLIMBS], NLIMBS)
    a8 = _to_chunks8(t_low)  # (32, N)
    m = jnp.matmul(
        jnp.asarray(cst["toep_n8_T"]), a8, preferred_element_type=jnp.float32
    ).astype(jnp.int32).astype(U32)  # (32, N) 8-bit lanes < 2^21
    for _ in range(3):
        m = (m & 0xFF) + jnp.concatenate([jnp.zeros_like(m[0:1]), (m >> 8)[:-1]], axis=0)
    m8 = _to_bf16(m)
    mp8 = jnp.matmul(
        jnp.asarray(cst["toep_p8_T"]), m8, preferred_element_type=jnp.float32
    ).astype(jnp.int32).astype(U32)  # (66, N), rows = [even 8-lanes | odd 8-lanes]
    mp16 = mp8[:33] + (mp8[33:] << 8)  # (33, N) 16-bit lanes < 2^30
    width = 2 * NLIMBS + 2

    def pad_to(a, w):
        if a.shape[0] == w:
            return a
        return jnp.concatenate([a, jnp.zeros((w - a.shape[0],) + a.shape[1:], U32)], axis=0)

    t_pad = pad_to(t_lanes, width)
    m_pad = pad_to(mp16, width)
    s = _carry16(t_pad + m_pad, width)
    r17 = s[NLIMBS : NLIMBS + 17]  # (T + m'p)/R < 3p
    r = _cond_sub_p(cst, r17)
    r17b = jnp.concatenate([r, jnp.zeros_like(r[0:1])], axis=0)
    return _cond_sub_p(cst, r17b)


def mont_mul(cst, a, b):
    return redc(cst, _mul_lanes(cst, a, b))


# ------------------------------------------------- int32 schoolbook variant
#
# The f32/MXU formulation above pays for 8-bit chunk expansion (32x operand
# blowup) plus Precision.HIGHEST f32 matmuls. On the VPU, a u32 multiply of
# two canonical 16-bit limbs is EXACT (product < 2^32), so plain schoolbook
# with lo/hi split accumulation needs no chunk expansion at all: 16 shifted
# multiply-accumulate passes over (16, N) rows. Intended for Pallas kernels
# where every intermediate is VMEM-resident.


def _shifted_add(t, contrib, d: int):
    """t + (contrib shifted down by d sublanes), all static shapes.

    Written as concat + slice instead of .at[d:d+k].add: the scatter path
    captures empty index constants that Pallas (jax 0.9) rejects inside
    kernels, while sublane concats/slices lower cleanly in Mosaic."""
    lanes = t.shape[0]
    k = contrib.shape[0]
    if d > 0:
        contrib = jnp.concatenate(
            [jnp.zeros((d,) + contrib.shape[1:], contrib.dtype), contrib], axis=0
        )
    if d + k < lanes:
        contrib = jnp.concatenate(
            [contrib, jnp.zeros((lanes - d - k,) + contrib.shape[1:], contrib.dtype)], axis=0
        )
    return t + contrib[:lanes]


def _mul_lanes_i32(a, b):
    """Full product of (16, N) x (16, N) canonical limbs as (32, N)
    unnormalized u32 lanes (each <= 32 * (2^16 - 1) < 2^21): pure u32 VPU
    multiplies. A 512-bit product fits exactly 32 16-bit limbs."""
    n = a.shape[1]
    t = jnp.zeros((32, n), U32)
    for j in range(NLIMBS):
        p = a * b[j : j + 1]  # exact: < 2^32
        t = _shifted_add(t, p & MASK, j)
        t = _shifted_add(t, p >> 16, j + 1)
    return t


def _mul_low_i32(a, b):
    """Low 16 limbs of the product (mod 2^256), unnormalized u32 lanes."""
    n = a.shape[1]
    t = jnp.zeros((NLIMBS, n), U32)
    for j in range(NLIMBS):
        w = NLIMBS - j
        p = a[:w] * b[j : j + 1]
        t = _shifted_add(t, p & MASK, j)
        if w > 1:
            t = _shifted_add(t, (p >> 16)[: w - 1], j + 1)
    return t


def _mul_low_by_const_i32(a, const_ints):
    """Low 16 limbs of a * C for a STATIC 256-bit constant C given as 16
    Python-int limbs: scalar multiplies only (a (16,1)x(1,N) limb-vector
    product would need a both-dims broadcast, which Mosaic can't lower)."""
    n = a.shape[1]
    t = jnp.zeros((NLIMBS, n), U32)
    for i, ci in enumerate(const_ints):
        ci = int(ci)
        if ci == 0:
            continue
        w = NLIMBS - i
        p = a[:w] * U32(ci)  # exact: < 2^32
        t = _shifted_add(t, p & MASK, i)
        if w > 1:
            t = _shifted_add(t, (p >> 16)[: w - 1], i + 1)
    return t


def _mul_lanes_by_const_i32(a, const_ints, out_lanes: int):
    """a (16, N) times a STATIC constant (16 Python-int limbs) as
    (out_lanes, N) unnormalized u32 lanes."""
    n = a.shape[1]
    t = jnp.zeros((out_lanes, n), U32)
    for i, ci in enumerate(const_ints):
        ci = int(ci)
        if ci == 0:
            continue
        p = a * U32(ci)  # exact: < 2^32
        t = _shifted_add(t, p & MASK, i)
        t = _shifted_add(t, p >> 16, i + 1)
    return t


def redc_i32(cst, t_lanes):
    """Montgomery REDC of (L >= 16, N) unnormalized lanes (T < p*R, lanes
    < 2^26) via int32 schoolbook: m = T*n' mod R; (T + m*p) / R.

    Both REDC multiplies have a CONSTANT operand (n' and p), so they run as
    static scalar-multiply accumulations (np_ints/p_ints in the consts)."""
    lanes = t_lanes.shape[0]
    t_low = _carry16(t_lanes[:NLIMBS], NLIMBS)
    m = _carry16(_mul_low_by_const_i32(t_low, cst["np_ints"]), NLIMBS)
    width = 2 * NLIMBS + 2
    acc = jnp.concatenate(
        [t_lanes, jnp.zeros((width - lanes,) + t_lanes.shape[1:], U32)], axis=0
    ) if lanes < width else t_lanes[:width]
    acc = acc + _mul_lanes_by_const_i32(m, cst["p_ints"], width)
    s = _carry16(acc, width)
    r17 = s[NLIMBS : NLIMBS + 17]
    r = _cond_sub_p(cst, r17)
    r17b = jnp.concatenate([r, jnp.zeros_like(r[0:1])], axis=0)
    return _cond_sub_p(cst, r17b)


def mont_mul_i32(cst, a, b):
    return redc_i32(cst, _mul_lanes_i32(a, b))


def mont_mul_sel(cst, a, b):
    """Route to the i32 schoolbook when the consts carry use_i32=True (set
    by the fused Pallas kernels — pure-VPU multiplies, no chunk expansion);
    the f32/MXU path otherwise."""
    if cst.get("use_i32"):
        return mont_mul_i32(cst, a, b)
    return mont_mul(cst, a, b)


def is_zero(a):
    """(16, N) -> (1, N) bool."""
    return jnp.all(a == 0, axis=0, keepdims=True)


def select(cond, a, b):
    """cond: (1, N) bool; a, b: (16, N)."""
    return jnp.where(cond, a, b)
