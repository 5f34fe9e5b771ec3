"""Device-side (JAX) Pasta field arithmetic on 16×16-bit limb vectors.

TPU-native representation of Fp/Fq elements (SURVEY.md §7.1 item 1):

* An element is a ``(..., 16)`` ``uint32`` array of 16-bit limbs,
  little-endian, value = Σ limb[i]·2^(16i).
* Hot-path multiplication uses Montgomery form with R = 2^256: schoolbook
  product with lo/hi 16-bit splitting (all partial products and accumulators
  fit uint32 — ≤ 2^23 per lane), followed by word-by-word Montgomery
  reduction (REDC).  Everything is static-shaped, fully unrolled and
  vectorized over the leading batch dims, so XLA maps it onto the VPU with
  no dynamic control flow.
* Canonical (non-Montgomery) helpers convert to/from Python ints for the
  host-exact layer in ``fields/host.py``, which is the golden reference.

The 16-bit radix is chosen so that a single limb product (< 2^32) and sums
of ≤ 32 split halves (< 2^22) never overflow uint32 — TPUs have no 64-bit
integer multiply, so all carries are handled explicitly.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .host import FP, FQ, Field

NLIMBS = 16
LIMB_BITS = 16
MASK = (1 << LIMB_BITS) - 1
U32 = jnp.uint32


def _conv_tensor(out_lanes: int, shift: int) -> np.ndarray:
    """(16, 16, out_lanes) 0/1 tensor: M[i, j, i+j+shift] = 1.

    Turns the schoolbook anti-diagonal accumulation into a single einsum
    (one XLA dot), which compiles orders of magnitude faster than per-limb
    dynamic-update-slices and fuses well on TPU."""
    m = np.zeros((NLIMBS, NLIMBS, out_lanes), dtype=np.uint32)
    for i in range(NLIMBS):
        for j in range(NLIMBS):
            k = i + j + shift
            if k < out_lanes:
                m[i, j, k] = 1
    return m


_CONV_LO = _conv_tensor(2 * NLIMBS + 2, 0)
_CONV_HI = _conv_tensor(2 * NLIMBS + 2, 1)
_CONV_LO16 = _conv_tensor(NLIMBS, 0)
_CONV_HI16 = _conv_tensor(NLIMBS, 1)


def int_to_limbs(x: int) -> np.ndarray:
    """Python int -> (16,) uint32 canonical limb array."""
    return np.array([(x >> (LIMB_BITS * i)) & MASK for i in range(NLIMBS)], dtype=np.uint32)


def ints_to_limbs(xs) -> np.ndarray:
    """Sequence of ints -> (N, 16) uint32 limb array (bulk, via bytes)."""
    xs = list(xs)
    buf = b"".join(int(x).to_bytes(32, "little") for x in xs)
    return np.frombuffer(buf, dtype="<u2").reshape(len(xs), NLIMBS).astype(np.uint32)


def limbs_to_int(a) -> int:
    """(16,) limb array -> Python int."""
    a = np.asarray(a, dtype=np.uint64)
    return sum(int(a[i]) << (LIMB_BITS * i) for i in range(a.shape[-1]))


def limbs_to_ints(a) -> list[int]:
    """(N, 16) limb array -> list of ints (bulk, via bytes)."""
    a16 = np.ascontiguousarray(np.asarray(a)).astype("<u2")  # limbs < 2^16
    data = a16.tobytes()
    return [int.from_bytes(data[i * 32 : (i + 1) * 32], "little") for i in range(a16.shape[0])]


def _toeplitz8(value: int, out_lanes: int, in_chunks: int = 32) -> np.ndarray:
    """(in_chunks, out_lanes) bf16 Toeplitz matrix of `value`'s 8-bit chunks:
    M[i, j] = chunk_{j-i}(value). For a vector of canonical 8-bit chunks a,
    (a @ M)[j] = sum_{i+d=j} a_i * v_d — the full product in 8-bit lane
    space, each lane < in_chunks * 2^16 (exact in the MXU's f32 accumulator;
    8-bit chunk entries are exact in bf16). Multiplying by a CONSTANT this
    way skips the (.., 1024) chunk-pair expansion a variable*variable
    product needs."""
    m = np.zeros((in_chunks, out_lanes), dtype=np.float32)
    for i in range(in_chunks):
        for j in range(out_lanes):
            d = j - i
            if 0 <= d < 32:
                m[i, j] = (value >> (8 * d)) & 0xFF
    return m.astype(jnp.bfloat16)


@dataclass(frozen=True)
class FieldSpec:
    """Compile-time constants for one field, closed over by the kernels."""

    name: str
    modulus: int
    n0: int  # -modulus^{-1} mod 2^16
    nprime_limbs: np.ndarray  # (16,) -modulus^{-1} mod 2^256
    p_limbs: np.ndarray  # (16,)  uint32
    p17: np.ndarray  # (17,) uint32 (top lane 0), for compare-subtract
    r_mod_p: int  # R = 2^256 mod p  (Montgomery one)
    r2_limbs: np.ndarray  # R^2 mod p, for to_mont
    one_mont: np.ndarray  # R mod p limbs
    host: Field
    toep_n8: np.ndarray  # (32, 32) bf16 Toeplitz of -p^{-1} mod 2^256 (low half)
    toep_p8: np.ndarray  # (32, 66) bf16 Toeplitz of p (full product)

    @staticmethod
    @functools.lru_cache(maxsize=None)
    def make(modulus: int, name: str = "F") -> "FieldSpec":
        host = FP if modulus == FP.modulus else (FQ if modulus == FQ.modulus else Field(modulus, name=name))
        n0 = (-pow(modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        nprime = (-pow(modulus, -1, 1 << 256)) % (1 << 256)
        r = (1 << 256) % modulus
        r2 = (r * r) % modulus
        p_limbs = int_to_limbs(modulus)
        p17 = np.concatenate([p_limbs, np.zeros(1, np.uint32)])
        return FieldSpec(
            name=name,
            modulus=modulus,
            n0=n0,
            nprime_limbs=int_to_limbs(nprime),
            p_limbs=p_limbs,
            p17=p17,
            r_mod_p=r,
            r2_limbs=int_to_limbs(r2),
            one_mont=int_to_limbs(r),
            host=host,
            toep_n8=_toeplitz8(nprime, 32),
            toep_p8=_toeplitz8(modulus, 66),
        )


FP_SPEC = FieldSpec.make(FP.modulus, "Fp")
FQ_SPEC = FieldSpec.make(FQ.modulus, "Fq")


def _normalize17(t):
    """Propagate carries over 17 uint32 lanes -> canonical 17 limbs (< 2^16)."""
    out = []
    carry = jnp.zeros_like(t[..., 0])
    for j in range(17):
        v = t[..., j] + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    return jnp.stack(out, axis=-1)


def _cond_sub_p(spec: FieldSpec, r17, cst=None):
    """Branchless r - p if r >= p, on canonical 17-limb input < 2p."""
    p17 = _cst(spec, cst).p17_i32
    d = r17.astype(jnp.int32)
    outs = []
    borrow = jnp.zeros_like(d[..., 0])
    for j in range(17):
        e = d[..., j] - p17[j] - borrow
        borrow = (e < 0).astype(jnp.int32)
        outs.append(e + (borrow << LIMB_BITS))
    diff = jnp.stack(outs, axis=-1)
    ge = (borrow == 0)[..., None]
    res = jnp.where(ge, diff, d).astype(U32)
    return res[..., :NLIMBS]


def add(spec: FieldSpec, a, b, cst=None):
    """Field addition on canonical limbs (Montgomery or plain — it's linear)."""
    s = a.astype(U32) + b.astype(U32)
    t = jnp.concatenate([s, jnp.zeros_like(s[..., :1])], axis=-1)
    return _cond_sub_p(spec, _normalize17(t), cst)


def sub(spec: FieldSpec, a, b, cst=None):
    """Field subtraction: a - b = a + (p - b) followed by conditional reduce."""
    p = _cst(spec, cst).p_limbs.astype(jnp.int32)
    d = a.astype(jnp.int32) + p - b.astype(jnp.int32)
    outs = []
    carry = jnp.zeros_like(d[..., 0])
    for j in range(NLIMBS):
        v = d[..., j] + carry
        outs.append(v & MASK)
        carry = v >> LIMB_BITS  # arithmetic shift; v >= 0 here since a_j+p_j-b_j+carry > -2^16...
        # v can be negative only if carry from previous was negative; a_j + p_j - b_j >= -(2^16-1)
        # and p_j + carry >= -1 so clamp via floor-div semantics of >> on int32 (arithmetic) is correct.
    t = jnp.stack(outs, axis=-1).astype(U32)
    t17 = jnp.concatenate([t, carry[..., None].astype(U32)], axis=-1)
    return _cond_sub_p(spec, t17, cst)


def neg(spec: FieldSpec, a, cst=None):
    zero = jnp.zeros_like(a)
    # p - a, but a may be 0: sub handles it (result p -> cond_sub -> 0)
    return sub(spec, zero, a, cst)


_CONV_MAT = None  # built lazily: (1024, 34) bf16 and (1024, 16) bf16


def _conv_mats():
    """Accumulation matrices for the 8-bit-chunk MXU formulation.

    Each limb product (u32) is split into four 8-bit chunks c0..c3; chunk k
    contributes c_k * 2^(8k) at lane i+j, i.e. weight 1 or 256 at lane i+j
    (c0, c1) or i+j+1 (c2, c3). Chunks (< 256) and weights ({1, 256}) are
    exact in bf16 and lane sums (< 2^22) are exact in the MXU's f32
    accumulator — ONE native bf16 MXU pass, no precision workarounds."""
    global _CONV_MAT
    if _CONV_MAT is None:

        def build(lo_t, hi_t):
            lo = lo_t.reshape(NLIMBS * NLIMBS, -1).astype(np.float32)
            hi = hi_t.reshape(NLIMBS * NLIMBS, -1).astype(np.float32)
            return np.concatenate([lo, 256.0 * lo, hi, 256.0 * hi]).astype(jnp.bfloat16)

        _CONV_MAT = (build(_CONV_LO, _CONV_HI), build(_CONV_LO16, _CONV_HI16))
    return _CONV_MAT


_CONV_MAT_J = None


def _conv_mats_jmajor():
    """Same accumulation matrices with rows ordered j-major (r = j*16 + i):
    matches the reshape-free product layout used inside Pallas kernels
    (Mosaic cannot lower the rank-3 flatten of the i-major path)."""
    global _CONV_MAT_J
    if _CONV_MAT_J is None:

        def build(lo_t, hi_t):
            lo = np.transpose(lo_t, (1, 0, 2)).reshape(NLIMBS * NLIMBS, -1).astype(np.float32)
            hi = np.transpose(hi_t, (1, 0, 2)).reshape(NLIMBS * NLIMBS, -1).astype(np.float32)
            return np.concatenate([lo, 256.0 * lo, hi, 256.0 * hi]).astype(jnp.bfloat16)

        _CONV_MAT_J = (build(_CONV_LO, _CONV_HI), build(_CONV_LO16, _CONV_HI16))
    return _CONV_MAT_J


def _split_products_jmajor(a, b):
    """(..., 1024) bf16 chunk vector, reshape-free (j-major column order):
    column r = j*16 + i holds chunks of a_i * b_j."""
    a = a.astype(U32)
    b = b.astype(U32)
    parts = [a * b[..., j : j + 1] for j in range(NLIMBS)]
    prod = jnp.concatenate(parts, axis=-1)  # (..., 256)
    c0 = prod & 0xFF
    c1 = (prod >> 8) & 0xFF
    c2 = (prod >> 16) & 0xFF
    c3 = prod >> 24
    chunks = jnp.concatenate([c0, c1, c2, c3], axis=-1)
    return chunks.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)


from typing import NamedTuple


class LimbConsts(NamedTuple):
    """All array constants the limb kernels touch, as traced values.

    Pallas kernels cannot close over array constants, so every kernel-usable
    function threads these through (None -> materialized from the spec,
    which XLA folds into the graph as usual). ``in_kernel`` selects the
    Pallas-safe VPU product path (2-D ops only; Mosaic cannot lower the
    rank-3 reshapes/matmuls of the MXU formulation)."""

    conv_full: jnp.ndarray  # (1024, 34) bf16
    conv_low: jnp.ndarray  # (1024, 16) bf16
    p_limbs: jnp.ndarray  # (16,) uint32
    p17_i32: jnp.ndarray  # (17,) int32
    nprime: jnp.ndarray  # (16,) uint32
    one_mont: jnp.ndarray  # (16,) uint32
    in_kernel: bool = False
    toep_n8: jnp.ndarray | None = None  # (32, 32) bf16
    toep_p8: jnp.ndarray | None = None  # (32, 66) bf16


def spec_consts(spec: "FieldSpec") -> LimbConsts:
    full, low = _conv_mats()
    return LimbConsts(
        conv_full=jnp.asarray(full),
        conv_low=jnp.asarray(low),
        p_limbs=jnp.asarray(spec.p_limbs),
        p17_i32=jnp.asarray(spec.p17.astype(np.int32)),
        nprime=jnp.asarray(spec.nprime_limbs),
        one_mont=jnp.asarray(spec.one_mont),
        toep_n8=jnp.asarray(spec.toep_n8),
        toep_p8=jnp.asarray(spec.toep_p8),
    )


def _cst(spec, cst):
    return cst if cst is not None else spec_consts(spec)


def _split_products(a, b):
    """(..., 1024) bf16 vector of the four 8-bit chunks of all limb products
    (ordering matches _conv_mats: [c0 | c1 | c2 | c3])."""
    prod = a.astype(U32)[..., :, None] * b.astype(U32)[..., None, :]
    flat = prod.shape[:-2] + (NLIMBS * NLIMBS,)
    c0 = (prod & 0xFF).reshape(flat)
    c1 = ((prod >> 8) & 0xFF).reshape(flat)
    c2 = ((prod >> 16) & 0xFF).reshape(flat)
    c3 = (prod >> 24).reshape(flat)
    chunks = jnp.concatenate([c0, c1, c2, c3], axis=-1)
    # u32 -> i32 -> f32 -> bf16: Mosaic (Pallas) has no direct u32->bf16 cast
    return chunks.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)


def _exact_matmul(x, m):
    """bf16 x bf16 -> f32 matmul; exact for 8-bit chunk inputs."""
    return jnp.matmul(x, m, preferred_element_type=jnp.float32)


def _mul_lanes(a, b, conv_full, in_kernel: bool = False):
    """Full 16x16 schoolbook product as (..., 34) unnormalized uint32 lanes
    (each lane < 2^22): one u32 multiply + one bf16 MXU matmul. Inside
    Pallas kernels the reshape-free j-major layout is used (the consts then
    carry the j-major matrices)."""
    if in_kernel:
        t = _exact_matmul(_split_products_jmajor(a, b), conv_full)
        return t.astype(jnp.int32).astype(U32)
    t = _exact_matmul(_split_products(a, b), conv_full)
    return t.astype(jnp.int32).astype(U32)


def _mul_low16(a, b, conv_low, in_kernel: bool = False):
    """Low 16 limbs of a*b mod 2^256, canonical."""
    if in_kernel:
        t = _exact_matmul(_split_products_jmajor(a, b), conv_low).astype(jnp.int32).astype(U32)
    else:
        t = _exact_matmul(_split_products(a, b), conv_low).astype(jnp.int32).astype(U32)
    # carry-propagate 16 lanes, dropping the final carry (mod 2^256)
    out = []
    carry = jnp.zeros_like(t[..., 0])
    for j in range(NLIMBS):
        v = t[..., j] + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    return jnp.stack(out, axis=-1)


def _carry_lanes(t, nout: int):
    """Carry-propagate unnormalized lanes into nout canonical limbs."""
    out = []
    carry = jnp.zeros_like(t[..., 0])
    lanes = t.shape[-1]
    for j in range(nout):
        v = (t[..., j] if j < lanes else jnp.zeros_like(carry)) + carry
        out.append(v & MASK)
        carry = v >> LIMB_BITS
    return jnp.stack(out, axis=-1)


def _to_chunks8(t16):
    """(..., 16) canonical 16-bit limbs -> (..., 32) 8-bit chunks as bf16
    (exact: chunks < 256)."""
    lo = t16 & 0xFF
    hi = t16 >> 8
    inter = jnp.stack([lo, hi], axis=-1).reshape(t16.shape[:-1] + (2 * NLIMBS,))
    return inter.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)


def _redc_wide(spec: FieldSpec, t_lanes, cst=None):
    """Separated Montgomery reduction of a (..., >=33)-lane accumulator
    representing T < p*R:  m = (T mod R)*N' mod R;  r = (T + m*p)/R, then
    conditional subtracts.

    Both REDC multiplies have a CONSTANT operand (N' and p), so they run as
    single bf16 matmuls against precomputed 8-bit-chunk Toeplitz matrices —
    no (.., 1024) chunk-pair expansion, which cuts the HBM traffic of a
    Montgomery mul to roughly the variable*variable product alone. m is
    kept in near-canonical 8-bit lanes (three parallel carry-settle passes
    bound each lane by 256, still bf16-exact; the resulting redundant
    m' ≡ m mod 2^256 with m' < 2*2^256 costs one extra conditional
    subtract: r = (T + m'p)/R < 3p).

    The Pallas kernels keep the conv-matrix formulation (in_kernel=True):
    Mosaic lowers it today, and kernel VMEM residency already removes the
    traffic the Toeplitz path saves."""
    cst = _cst(spec, cst)
    if cst.in_kernel or cst.toep_n8 is None:
        t_low = _carry_lanes(t_lanes[..., :NLIMBS], NLIMBS)  # T mod 2^256 (canonical)
        m = _mul_low16(t_low, cst.nprime, cst.conv_low, cst.in_kernel)
        mp = _mul_lanes(m, cst.p_limbs, cst.conv_full, cst.in_kernel)  # (..., 34) lanes < 2^21
        lanes = t_lanes.shape[-1]
        if lanes < mp.shape[-1]:  # pad+add (a scatter would break Pallas lowering)
            pad = [(0, 0)] * (t_lanes.ndim - 1) + [(0, mp.shape[-1] - lanes)]
            t_lanes = jnp.pad(t_lanes, pad)
        s = mp + t_lanes  # lanes < 2^22
        s = _carry_lanes(s, 2 * NLIMBS + 2)
        r17 = s[..., NLIMBS : NLIMBS + 17]
        return _cond_sub_p(spec, r17, cst)

    t_low = _carry_lanes(t_lanes[..., :NLIMBS], NLIMBS)  # T mod 2^256 (canonical)
    a8 = _to_chunks8(t_low)
    # m in 8-bit lanes: (T mod R) * N' mod R via the N' Toeplitz (lanes < 2^21)
    m = _exact_matmul(a8, cst.toep_n8).astype(jnp.int32).astype(U32)
    # settle carries in parallel until every lane <= 256 (bf16-exact);
    # the top carry out of lane 31 is a multiple of 2^256 -> dropped
    shift_pad = [(0, 0)] * (m.ndim - 1) + [(1, 0)]
    for _ in range(3):
        m = (m & 0xFF) + jnp.pad((m >> 8)[..., :-1], shift_pad)
    m8 = m.astype(jnp.int32).astype(jnp.float32).astype(jnp.bfloat16)
    # m' * p as 8-bit lanes via the p Toeplitz (66 lanes, each < 2^22)
    mp8 = _exact_matmul(m8, cst.toep_p8).astype(jnp.int32).astype(U32)
    # fold to 16-bit lane space: lane l = mp8[2l] + 256*mp8[2l+1] (< 2^30)
    mp16 = mp8[..., 0::2] + (mp8[..., 1::2] << 8)  # (..., 33)
    lanes = t_lanes.shape[-1]
    width = 2 * NLIMBS + 2
    pad_t = [(0, 0)] * (t_lanes.ndim - 1) + [(0, width - lanes)]
    pad_m = [(0, 0)] * (mp16.ndim - 1) + [(0, width - mp16.shape[-1])]
    s = jnp.pad(t_lanes, pad_t) + jnp.pad(mp16, pad_m)
    s = _carry_lanes(s, width)
    r17 = s[..., NLIMBS : NLIMBS + 17]  # r = (T + m'p)/R < 3p
    r = _cond_sub_p(spec, r17, cst)  # < 2p (16 limbs: the kept branch < 2^256)
    r17b = jnp.concatenate([r, jnp.zeros_like(r[..., :1])], axis=-1)
    return _cond_sub_p(spec, r17b, cst)


def mont_mul(spec: FieldSpec, a, b, cst=None):
    """Montgomery product: REDC(a*b) = a*b*R^{-1} mod p.

    a, b: (..., 16) uint32 canonical limbs (values < p, in Montgomery form
    for field semantics; the kernel itself is representation-agnostic).
    """
    cst = _cst(spec, cst)
    return _redc_wide(spec, _mul_lanes(a, b, cst.conv_full, cst.in_kernel), cst)


def mont_sqr(spec: FieldSpec, a, cst=None):
    return mont_mul(spec, a, a, cst)


def to_mont(spec: FieldSpec, a):
    """Plain limbs -> Montgomery form (multiply by R^2, reduce)."""
    r2 = jnp.asarray(spec.r2_limbs)
    return mont_mul(spec, a, jnp.broadcast_to(r2, a.shape))


def from_mont(spec: FieldSpec, a, cst=None):
    """Montgomery form -> plain limbs (REDC against 1)."""
    a = a.astype(U32)
    batch_shape = a.shape[:-1]
    t = jnp.concatenate([a, jnp.zeros(batch_shape + (NLIMBS + 1,), dtype=U32)], axis=-1)
    return _redc_wide(spec, t, cst)


def is_zero(a):
    return jnp.all(a == 0, axis=-1)


def eq(a, b):
    return jnp.all(a == b, axis=-1)


def select(cond, a, b):
    """cond: (...) bool; a, b: (..., 16) limbs."""
    return jnp.where(cond[..., None], a, b)


def mont_pow(spec: FieldSpec, a, e: int):
    """a^e for a *static* integer exponent, in Montgomery form.

    Fully unrolled square-and-multiply — intended for offline/batch use
    (e.g. batched field inversion via Fermat); ~380 modmuls for a 255-bit
    exponent.
    """
    result = jnp.broadcast_to(jnp.asarray(spec.one_mont), a.shape).astype(U32)
    if e == 0:
        return result
    bits = bin(e)[2:]
    result = a  # leading bit is always 1
    for bit in bits[1:]:
        result = mont_sqr(spec, result)
        if bit == "1":
            result = mont_mul(spec, result, a)
    return result


def mont_inv(spec: FieldSpec, a):
    """Batched inversion via Fermat's little theorem (a^(p-2)); a in Mont form."""
    return mont_pow(spec, a, spec.modulus - 2)
