"""NTT as MXU matrix multiplication (4-step / Bailey decomposition).

The reference's `best_fft` (halo2_proofs::arithmetic, SURVEY.md §2.2) is a
recursive radix-2 butterfly over rayon threads; `ops/ntt.py` is its
vectorized VPU translation (log n gather+mul stages, HBM-bound). This
module is the TPU-FIRST formulation: n = n1·n2, and each batch of small
DFTs becomes ONE multiplication by a constant n1×n1 (resp. n2×n2) twiddle
matrix over Fp — which is exactly what the MXU systolic array is for.

    X[k2 + n2·k1] = Σ_{i1} ω^{i1·k2} (ω^{n2})^{i1·k1} Σ_{i2} x[i1 + n1·i2] (ω^{n1})^{i2·k2}

    step 1  column NTTs: W2 @ M      (contract i2, n2×n2 constant matrix)
    step 2  twiddle:     ·ω^{i1·k2}  (elementwise Montgomery mul)
    step 3  row NTTs:    @ W1ᵀ       (contract i1, n1×n1 constant matrix)
    step 4  transpose    (k2,k1) → (k1,k2)

Fp matmul exactness on the MXU (no 64-bit ints, no exact wide muls):

* The constant matrix W is pre-multiplied by R = 2^256 (so Montgomery form
  passes through the linear map) and split into 32 8-bit chunk planes
  W8[u] — 8-bit values are exact in bf16.
* The variable operand splits into 8-bit chunks A8[v] likewise.
* Per chunk-pair (u, v): (n1×n1)·(n1×M) bf16 matmul, f32 accumulator —
  products ≤ 255² and ≤ 256 accumulation terms keep every partial sum
  < 2^24, exact in f32 (contractions > 256 are segmented and accumulated
  in i32).
* Chunk-pair planes regroup onto diagonals d = u+v (base-2^8 lanes), carry
  settle to 8-bit, pair to 16-bit limb lanes, fold lanes ≥ 24 with
  2^(16·l) mod p constants so the total drops under p·R, and the existing
  audited Montgomery reduction (`fields.limb._redc_wide`) produces
  canonical Montgomery limbs.

Bit-exact against `poly/domain.ntt_host` (tests/test_ntt_mm.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import limb as L
from ..fields.host import FP
from ..fields.limb import NLIMBS, U32, FieldSpec, int_to_limbs

# 8-bit chunks per 256-bit element
NCHUNK = 32
# f32 mantissa allows exact sums of <= 256 products of 8-bit values
SEG = 256


@functools.lru_cache(maxsize=None)
def _fold_consts(modulus: int, lo_lanes: int, hi_lanes: int):
    """(hi_lanes·2, fold8_lanes) u32 matrix folding canonical 16-bit lanes
    [lo_lanes, lo_lanes+hi_lanes) down into 8-bit lanes of Σ t_l·(2^{16l} mod p):
    row 2h   = 8-bit chunks of 2^{16(lo+h)} mod p (weight of t's low byte)
    row 2h+1 = the same chunks shifted one lane up (weight of t's high byte).
    Products are u8·u8 ≤ 2^16 summed over 2·hi_lanes rows — i32-safe."""
    nch = NCHUNK + 1  # one extra lane for the high-byte shift
    m = np.zeros((hi_lanes * 2, nch), dtype=np.int32)
    for h in range(hi_lanes):
        c = pow(2, 16 * (lo_lanes + h), modulus)
        for d in range(NCHUNK):
            ch = (c >> (8 * d)) & 0xFF
            m[2 * h, d] = ch
            m[2 * h + 1, d + 1] += ch  # t's high byte carries weight 2^8
    return m  # numpy: lru_cached values must not be traced jnp arrays


@functools.lru_cache(maxsize=None)
def _w8_planes(modulus: int, w_key: tuple, mont: bool = True):
    """Constant Fp matrix (rows of ints) -> (32, K', K) f32 chunk planes.
    ``mont=True`` pre-multiplies by R so Montgomery form is preserved.
    Bulk byte extraction (one bytes blob -> frombuffer), not a per-element
    loop — K' = K = 1024 means a million entries."""
    r = pow(2, 256, modulus) if mont else 1
    kp = len(w_key)
    k = len(w_key[0])
    blob = b"".join(
        (int(v) * r % modulus).to_bytes(32, "little") for row in w_key for v in row
    )
    chunks = np.frombuffer(blob, dtype=np.uint8).reshape(kp, k, NCHUNK)
    return np.ascontiguousarray(np.moveaxis(chunks, -1, 0)).astype(np.float32)


def _to_chunks8_cols(a):
    """(..., K, 16) u32 canonical limbs -> (..., K, 32) bf16 8-bit chunks."""
    a = a.astype(U32)
    lo = (a & 0xFF).astype(jnp.int32)
    hi = ((a >> 8) & 0xFF).astype(jnp.int32)
    # interleave: chunk 2l from limb l low byte, 2l+1 high byte
    ch = jnp.stack([lo, hi], axis=-1).reshape(a.shape[:-1] + (NCHUNK,))
    return ch.astype(jnp.float32).astype(jnp.bfloat16)


def _settle8(c, passes: int = 4):
    """Parallel carry settle in 8-bit lane space: after `passes` rounds every
    lane is <= 255 + (initial_max >> (8*passes)) — callers pick passes so the
    result is < 256 (canonical 8-bit chunks). Lane axis is LAST."""
    shift_pad = [(0, 0)] * (c.ndim - 1) + [(1, 0)]
    for _ in range(passes):
        c = (c & 0xFF) + jnp.pad((c >> 8)[..., :-1], shift_pad)
    return c


def fp_const_matmul(spec: FieldSpec, w_ints, a, mont: bool = True):
    """out[..., j, m, :] = Σ_i W[j,i]·a[..., i, m, :] over Fp, on the MXU.

    w_ints: (K', K) numpy object/int array of field elements (constant).
    a: (..., K, M, 16) u32 canonical limbs (Montgomery form if mont=True;
       the result is then also Montgomery).
    Returns (..., K', M, 16) canonical limbs.
    """
    w_key = tuple(tuple(int(x) for x in row) for row in w_ints)
    w8 = jnp.asarray(_w8_planes(spec.modulus, w_key, mont), dtype=jnp.bfloat16)  # (32, K', K)
    kp, k = w8.shape[1], w8.shape[2]
    batch = a.shape[:-3]
    m = a.shape[-2]
    assert a.shape[-3] == k and a.shape[-1] == NLIMBS
    # i32 diagonal-regroup bound: each of the <= 32 diagonal contributions
    # is an exact f32 sum of k products <= 255^2, so lanes reach
    # 32 * k * 255^2 — past k = 1024 that exceeds i32 and the accumulation
    # would wrap SILENTLY. 4-step plans keep n1, n2 <= 1024 up to n = 2^20;
    # larger forced runs must segment the regroup first (ADVICE r3).
    assert k <= 1024, (
        f"fp_const_matmul: contraction dim {k} > 1024 overflows the i32 "
        "diagonal accumulator (needs segmented regrouping)"
    )
    a8 = _to_chunks8_cols(a)  # (..., K, M, 32)
    # flatten: contraction on the left, (M·32 chunks) on the right
    a8f = a8.reshape((-1, k, m * NCHUNK)) if batch else a8.reshape((1, k, m * NCHUNK))
    b = a8f.shape[0]

    nseg = (k + SEG - 1) // SEG
    # out_chunk[b, d, j, m] accumulated in i32; diagonal d = u+v in [0, 63)
    out_chunk = jnp.zeros((b, 2 * NCHUNK - 1, kp, m), jnp.int32)
    for u in range(NCHUNK):
        acc = None
        for s in range(nseg):
            sl = slice(s * SEG, min((s + 1) * SEG, k))
            # (K', seg) @ (b, seg, M·32) -> (b, K', M·32) f32, exact
            part = jax.lax.dot_general(
                w8[u][:, sl],
                a8f[:, sl, :],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (K', b, M·32)
            part = part.astype(jnp.int32)
            acc = part if acc is None else acc + part
        # acc: (K', b, M·32) -> (b, K', M, 32v); add into diagonals d=u+v
        accv = jnp.moveaxis(acc, 1, 0).reshape(b, kp, m, NCHUNK)
        out_chunk = out_chunk.at[:, u : u + NCHUNK].add(jnp.moveaxis(accv, -1, 1))
    # lanes: values < nseg·2^24·? — bounded by k·255²·? : for k<=1024 the
    # i32 accumulation holds (1024·65025 < 2^26), and regrouping adds ≤ 32
    # diagonal contributions: < 2^31. Settle to canonical 8-bit chunks.
    pad = [(0, 0)] * 1 + [(0, 5)] + [(0, 0)] * 2  # room for settle carries
    c = jnp.pad(out_chunk, pad)  # (b, 68, K', M)
    c = jnp.moveaxis(c, 1, -1)  # (b, K', M, 68)
    c = _settle8(c, passes=4)  # canonical 8-bit lanes
    # pair to 16-bit lanes: (b, K', M, 34)
    t16 = (c[..., 0::2] + (c[..., 1::2] << 8)).astype(U32)
    lo_lanes = 24
    hi = t16[..., lo_lanes:]  # (..., 10) canonical u16
    hi_lanes = hi.shape[-1]
    foldm = jnp.asarray(_fold_consts(spec.modulus, lo_lanes, hi_lanes))  # (20, 33) i32
    hsplit = jnp.stack([hi & 0xFF, hi >> 8], axis=-1).reshape(hi.shape[:-1] + (2 * hi_lanes,))
    f8 = jnp.einsum(
        "...h,hd->...d", hsplit.astype(jnp.int32), foldm, preferred_element_type=jnp.int32
    )  # 8-bit lanes, values < 2·hi_lanes·2^16 ≤ 2^21
    f8 = _settle8(jnp.pad(f8, [(0, 0)] * (f8.ndim - 1) + [(0, 3)]), passes=3)
    f16 = (f8[..., 0::2] + (f8[..., 1::2] << 8)).astype(U32)  # (..., 18) canonical
    width = max(lo_lanes, f16.shape[-1])
    t = jnp.pad(t16[..., :lo_lanes], [(0, 0)] * (t16.ndim - 1) + [(0, width - lo_lanes)])
    f = jnp.pad(f16, [(0, 0)] * (f16.ndim - 1) + [(0, width - f16.shape[-1])])
    total = t + f  # lanes < 2^17, value < 2^384 + 10·2^16·p << p·R
    if width < 2 * NLIMBS + 1:
        total = jnp.pad(total, [(0, 0)] * (total.ndim - 1) + [(0, 2 * NLIMBS + 1 - width)])
    # REDC divides by R; W carried an extra R factor, so the result keeps
    # the operand's (Montgomery) representation.
    out = L._redc_wide(spec, total)  # (b, K', M, 16) canonical limbs
    return out.reshape(batch + (kp, m, NLIMBS)) if batch else out[0]


def _w_matrix(omega: int, size: int, modulus: int) -> np.ndarray:
    """(size, size) object array W[j, i] = omega^{j·i} mod p."""
    rows = []
    wj = 1
    for j in range(size):
        row = []
        v = 1
        for i in range(size):
            row.append(v)
            v = v * wj % modulus
        rows.append(row)
        wj = wj * omega % modulus
    return np.array(rows, dtype=object)


class NttMMPlan:
    """Constants for one (n, omega) 4-step matmul NTT: the two DFT matrices
    (chunk planes cached via fp_const_matmul) and the (n1, n2) twiddle grid
    in Montgomery form."""

    def __init__(self, spec: FieldSpec, n: int, omega: int):
        self.spec = spec
        self.n = n
        logn = n.bit_length() - 1
        self.log_n1 = (logn + 1) // 2
        self.n1 = 1 << self.log_n1
        self.n2 = n // self.n1
        p = spec.modulus
        self.w2 = _w_matrix(pow(omega, self.n1, p), self.n2, p)  # column NTTs
        self.w1 = _w_matrix(pow(omega, self.n2, p), self.n1, p)  # row NTTs
        r = spec.r_mod_p
        vals = []
        for k2 in range(self.n2):
            wk2 = pow(omega, k2, p)
            v = r  # omega^{i1·k2} in Montgomery form
            for i1 in range(self.n1):
                vals.append(v)
                v = v * wk2 % p
        from ..fields.limb import ints_to_limbs

        self.twiddle_mont = ints_to_limbs(vals).reshape(self.n2, self.n1, NLIMBS)


@functools.lru_cache(maxsize=None)
def mm_plan_for(modulus: int, n: int, omega: int) -> NttMMPlan:
    return NttMMPlan(FieldSpec.make(modulus), n, omega)


def ntt_mm(plan: NttMMPlan, a):
    """4-step matmul NTT. a: (..., n, 16) u32 Montgomery limbs, natural
    order in and out (same contract as ops.ntt.ntt)."""
    spec = plan.spec
    n1, n2 = plan.n1, plan.n2
    batch = a.shape[:-2]
    x = a.reshape(batch + (n2, n1, NLIMBS))  # M[i2, i1]: x[i1 + n1·i2]
    # step 1: column NTTs — contract i2 (axis -3) ✓ fp_const_matmul layout
    y = fp_const_matmul(spec, plan.w2, x)  # (.., k2, i1, 16)
    # step 2: twiddle ω^{i1·k2}
    y = L.mont_mul(spec, y, jnp.asarray(plan.twiddle_mont))
    # step 3: row NTTs — contract i1: transpose to (.., i1, k2, 16)
    yt = jnp.swapaxes(y, -3, -2)
    z = fp_const_matmul(spec, plan.w1, yt)  # (.., k1, k2, 16)
    # step 4: X[k2 + n2·k1] -> flatten (k1, k2) row-major
    return z.reshape(batch + (plan.n, NLIMBS))
