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

import jax.numpy as jnp
import numpy as np

from .host import FP, FQ, Field

NLIMBS = 16
LIMB_BITS = 16
MASK = (1 << LIMB_BITS) - 1
U32 = jnp.uint32

# index matrix for the schoolbook product scatter-add: IDX[i, j] = i + j
_IDX = np.add.outer(np.arange(NLIMBS), np.arange(NLIMBS))


def int_to_limbs(x: int) -> np.ndarray:
    """Python int -> (16,) uint32 canonical limb array."""
    return np.array([(x >> (LIMB_BITS * i)) & MASK for i in range(NLIMBS)], dtype=np.uint32)


def ints_to_limbs(xs) -> np.ndarray:
    """Sequence of ints -> (N, 16) uint32 limb array."""
    return np.stack([int_to_limbs(int(x)) for x in xs])


def limbs_to_int(a) -> int:
    """(16,) limb array -> Python int."""
    a = np.asarray(a, dtype=np.uint64)
    return sum(int(a[i]) << (LIMB_BITS * i) for i in range(a.shape[-1]))


def limbs_to_ints(a) -> list[int]:
    a = np.asarray(a)
    return [limbs_to_int(a[i]) for i in range(a.shape[0])]


@dataclass(frozen=True)
class FieldSpec:
    """Compile-time constants for one field, closed over by the kernels."""

    name: str
    modulus: int
    n0: int  # -modulus^{-1} mod 2^16
    p_limbs: np.ndarray  # (16,)  uint32
    p17: np.ndarray  # (17,) uint32 (top lane 0), for compare-subtract
    r_mod_p: int  # R = 2^256 mod p  (Montgomery one)
    r2_limbs: np.ndarray  # R^2 mod p, for to_mont
    one_mont: np.ndarray  # R mod p limbs
    host: Field

    @staticmethod
    @functools.lru_cache(maxsize=None)
    def make(modulus: int, name: str = "F") -> "FieldSpec":
        host = FP if modulus == FP.modulus else (FQ if modulus == FQ.modulus else Field(modulus, name=name))
        n0 = (-pow(modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        r = (1 << 256) % modulus
        r2 = (r * r) % modulus
        p_limbs = int_to_limbs(modulus)
        p17 = np.concatenate([p_limbs, np.zeros(1, np.uint32)])
        return FieldSpec(
            name=name,
            modulus=modulus,
            n0=n0,
            p_limbs=p_limbs,
            p17=p17,
            r_mod_p=r,
            r2_limbs=int_to_limbs(r2),
            one_mont=int_to_limbs(r),
            host=host,
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


def _cond_sub_p(spec: FieldSpec, r17):
    """Branchless r - p if r >= p, on canonical 17-limb input < 2p."""
    p17 = jnp.asarray(spec.p17.astype(np.int32))
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


def add(spec: FieldSpec, a, b):
    """Field addition on canonical limbs (Montgomery or plain — it's linear)."""
    s = a.astype(U32) + b.astype(U32)
    t = jnp.concatenate([s, jnp.zeros_like(s[..., :1])], axis=-1)
    return _cond_sub_p(spec, _normalize17(t))


def sub(spec: FieldSpec, a, b):
    """Field subtraction: a - b = a + (p - b) followed by conditional reduce."""
    p = jnp.asarray(spec.p_limbs.astype(np.int32))
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
    return _cond_sub_p(spec, t17)


def neg(spec: FieldSpec, a):
    zero = jnp.zeros_like(a)
    # p - a, but a may be 0: sub handles it (result p -> cond_sub -> 0)
    return sub(spec, zero, a)


def _redc(spec: FieldSpec, t):
    """Montgomery reduction of a (..., 34)-lane uint32 accumulator."""
    n0 = np.uint32(spec.n0)
    p = jnp.asarray(spec.p_limbs)
    for i in range(NLIMBS):
        m = ((t[..., i] & MASK) * n0) & MASK
        prod = m[..., None] * p  # (..., 16) uint32
        t = t.at[..., i : i + NLIMBS].add(prod & MASK)
        t = t.at[..., i + 1 : i + 1 + NLIMBS].add(prod >> LIMB_BITS)
        t = t.at[..., i + 1].add(t[..., i] >> LIMB_BITS)
    r17 = _normalize17(t[..., NLIMBS : NLIMBS + 17])
    return _cond_sub_p(spec, r17)


def mont_mul(spec: FieldSpec, a, b):
    """Montgomery product: REDC(a*b) = a*b*R^{-1} mod p.

    a, b: (..., 16) uint32 canonical limbs (values < p, in Montgomery form
    for field semantics; the kernel itself is representation-agnostic).
    """
    a = a.astype(U32)
    b = b.astype(U32)
    prod = a[..., :, None] * b[..., None, :]  # (..., 16, 16)
    lo = prod & MASK
    hi = prod >> LIMB_BITS
    batch_shape = prod.shape[:-2]
    t = jnp.zeros(batch_shape + (2 * NLIMBS + 2,), dtype=U32)
    t = t.at[..., _IDX].add(lo)
    t = t.at[..., _IDX + 1].add(hi)
    return _redc(spec, t)


def mont_sqr(spec: FieldSpec, a):
    return mont_mul(spec, a, a)


def to_mont(spec: FieldSpec, a):
    """Plain limbs -> Montgomery form (multiply by R^2, reduce)."""
    r2 = jnp.asarray(spec.r2_limbs)
    return mont_mul(spec, a, jnp.broadcast_to(r2, a.shape))


def from_mont(spec: FieldSpec, a):
    """Montgomery form -> plain limbs (REDC against 1)."""
    a = a.astype(U32)
    batch_shape = a.shape[:-1]
    t = jnp.zeros(batch_shape + (2 * NLIMBS + 2,), dtype=U32)
    t = t.at[..., :NLIMBS].add(a)
    return _redc(spec, t)


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
