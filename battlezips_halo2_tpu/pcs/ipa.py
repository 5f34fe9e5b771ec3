"""Inner-product-argument polynomial commitment scheme over Vesta.

Framework analog of ``halo2_proofs::poly::commitment`` (SURVEY.md §2.2 "IPA
commitment scheme"): deterministic SRS, blinded Pedersen vector commitments
(every commitment is one device MSM), and the log-n inner-product opening
argument with Bulletproofs-style folding:

    round j:  L_j = <a_lo, G_hi> + [<a_lo, b_hi>] U + [l_j] W
              R_j = <a_hi, G_lo> + [<a_hi, b_lo>] U + [r_j] W
              a' = u a_lo + u^-1 a_hi ;  G' = u^-1 G_lo + u G_hi ;
              b' = u^-1 b_lo + u b_hi

    final check: [a0] G_fin + [a0 * b_fin] U' + [r_fin] W
                   == P + [v] U' + sum_j ([u_j^2] L_j + [u_j^-2] R_j)

SRS derivation follows halo2 0.2.0 (hash_to_curve("Halo2-Parameters") on
Vesta via the from-scratch SSWU in curves/hashtocurve.py); a documented
try-and-increment fallback derivation is kept for comparison.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
from dataclasses import dataclass
from functools import lru_cache
from pathlib import Path

from ..curves.host import VESTA, Curve, Point
from ..fields.host import FP, FQ
from ..ops.msm import msm
from ..plonk.transcript import TranscriptRead, TranscriptWrite

SRS_DOMAIN = b"battlezips-tpu:srs"


def _derive_point(curve: Curve, label: bytes, index: int) -> Point:
    """Deterministic nothing-up-my-sleeve point: try-and-increment over a
    blake2b counter stream."""
    ctr = 0
    base = curve.base
    while True:
        h = hashlib.blake2b(digest_size=64)
        h.update(SRS_DOMAIN + b":" + label)
        h.update(index.to_bytes(4, "little") + ctr.to_bytes(4, "little"))
        x = base.from_bytes_wide(h.digest())
        y2 = base.add(base.mul(x, base.mul(x, x)), 5)
        y = base.sqrt(y2)
        if y is not None:
            if y & 1:
                y = base.neg(y)
            return (x, y)
        ctr += 1


@dataclass
class Params:
    """SRS for circuits up to 2^k rows: G vector, U (inner-product base),
    W (blinding base).

    Default derivation follows halo2 0.2.0's ``Params::new``: every point is
    ``hash_to_curve("Halo2-Parameters")`` on Vesta — G_i from the u32 LE
    index bytes, W and U from b"w"/b"u" — using our from-scratch SSWU
    implementation (byte-validated against the reference's Pallas
    generators; the Vesta instantiation uses the identical derived
    convention). ``new_try_increment`` keeps the previous self-consistent
    derivation."""

    k: int
    g: list  # n Vesta points
    u: Point
    w: Point

    @staticmethod
    def new(k: int) -> "Params":
        from ..curves.hashtocurve import hash_to_curve

        hasher = hash_to_curve(VESTA, "Halo2-Parameters")
        n = 1 << k
        g = [hasher(i.to_bytes(4, "little")) for i in range(n)]
        w = hasher(b"w")
        u = hasher(b"u")
        return Params(k, g, u, w)

    @staticmethod
    def new_try_increment(k: int) -> "Params":
        n = 1 << k
        g = [_derive_point(VESTA, b"g", i) for i in range(n)]
        u = _derive_point(VESTA, b"u", 0)
        w = _derive_point(VESTA, b"w", 0)
        return Params(k, g, u, w)

    @property
    def n(self) -> int:
        return 1 << self.k

    # --- persistence (SURVEY.md §5.4: params/pk/vk artifact store) --------
    def save(self, path):
        data = {
            "k": self.k,
            "g": [VESTA.to_bytes(p).hex() for p in self.g],
            "u": VESTA.to_bytes(self.u).hex(),
            "w": VESTA.to_bytes(self.w).hex(),
        }
        Path(path).write_text(json.dumps(data))

    @staticmethod
    def load(path) -> "Params":
        data = json.loads(Path(path).read_text())
        return Params(
            k=data["k"],
            g=[VESTA.from_bytes(bytes.fromhex(h)) for h in data["g"]],
            u=VESTA.from_bytes(bytes.fromhex(data["u"])),
            w=VESTA.from_bytes(bytes.fromhex(data["w"])),
        )


@lru_cache(maxsize=4)
def cached_params(k: int) -> Params:
    cache = Path(__file__).resolve().parent.parent.parent / ".artifacts" / f"srs_h2c_{k}.json"
    if cache.exists():
        return Params.load(cache)
    params = Params.new(k)
    cache.parent.mkdir(exist_ok=True)
    params.save(cache)
    return params


def commit(params: Params, coeffs: list[int], blind: int) -> Point:
    """<coeffs, G> + [blind] W — one device MSM."""
    assert len(coeffs) <= params.n
    points = params.g[: len(coeffs)] + [params.w]
    scalars = list(coeffs) + [blind]
    return msm(VESTA, points, scalars)


def commit_many(params: Params, polys: list, blinds: list) -> list[Point]:
    """Commit a batch of polynomials in ONE vmapped device MSM over the
    shared [G | W] point set."""
    from ..ops.msm import msm_many

    assert len(polys) == len(blinds)
    if not polys:
        return []
    points = params.g + [params.w]
    scalars_list = [list(p) + [0] * (params.n - len(p)) + [b] for p, b in zip(polys, blinds)]
    return msm_many(VESTA, points, scalars_list)


def _inner(a: list[int], b: list[int]) -> int:
    acc = 0
    for x, y in zip(a, b):
        acc += x * y
    return acc % FP.modulus


def create_open_proof(
    params: Params,
    transcript: TranscriptWrite,
    coeffs: list[int],
    blind: int,
    x: int,
    rng,
):
    """Open the committed polynomial at x (value p(x) is already known to
    the verifier via the transcript)."""
    from ..ops.msm import msm_many

    m = FP.modulus
    n = params.n
    a = np.zeros(n, dtype=object)
    a[: len(coeffs)] = [c % m for c in coeffs]
    b = np.empty(n, dtype=object)
    acc = 1
    for i in range(n):
        b[i] = acc
        acc = acc * x % m

    xi = transcript.squeeze_challenge_nonzero()
    u_point = VESTA.mul(params.u, xi)

    # The folded G vector is never materialized: each folded entry is a
    # +-power-product combination of original G points, so every round's
    # L/R inner products are MSMs over the ORIGINAL G with composite
    # scalar vectors (c = accumulated u-powers, p = current fold position).
    # Row math is vectorized over numpy object arrays of exact ints.
    c_coeff = np.ones(n, dtype=object)
    pos = np.arange(n)

    r = blind % m
    length = n
    while length > 1:
        half = length // 2
        a_lo, a_hi = a[:half], a[half:length]
        b_lo, b_hi = b[:half], b[half:length]

        l_blind = FP.random(rng)
        r_blind = FP.random(rng)
        value_l = int(np.sum(a_lo * b_hi)) % m
        value_r = int(np.sum(a_hi * b_lo)) % m

        hi_mask = pos >= half
        v_l = np.where(hi_mask, c_coeff * a[np.where(hi_mask, pos - half, 0)] % m, 0)
        v_r = np.where(~hi_mask, c_coeff * a[np.where(~hi_mask, pos + half, 0)] % m, 0)
        base_l, base_r = msm_many(VESTA, params.g, [[int(v) for v in v_l], [int(v) for v in v_r]])
        L = VESTA.add(base_l, VESTA.add(VESTA.mul(u_point, value_l), VESTA.mul(params.w, l_blind)))
        R = VESTA.add(base_r, VESTA.add(VESTA.mul(u_point, value_r), VESTA.mul(params.w, r_blind)))
        transcript.write_point(L)
        transcript.write_point(R)
        u = transcript.squeeze_challenge_nonzero()
        u_inv = FP.inv(u)

        a = (u * a_lo + u_inv * a_hi) % m
        b = (u_inv * b_lo + u * b_hi) % m
        c_coeff = np.where(hi_mask, c_coeff * u % m, c_coeff * u_inv % m)
        pos = np.where(hi_mask, pos - half, pos)
        r = (r + u * u % m * l_blind + u_inv * u_inv % m * r_blind) % m
        length = half

    transcript.write_scalar(int(a[0]))
    transcript.write_scalar(r)


def verify_open_proof(
    params: Params,
    transcript: TranscriptRead,
    commitment: Point,
    x: int,
    value: int,
) -> bool:
    """Verify an opening; O(n) MSM for G_final plus O(log n) point ops."""
    n = params.n
    k = params.k
    xi = transcript.squeeze_challenge_nonzero()
    u_point = VESTA.mul(params.u, xi)

    ls, rs, us = [], [], []
    for _ in range(k):
        ls.append(transcript.read_point())
        rs.append(transcript.read_point())
        us.append(transcript.squeeze_challenge_nonzero())
    a0 = transcript.read_scalar()
    r_final = transcript.read_scalar()

    # b_final = prod_j (u_j^-1 + u_j * x^(half_j)), half_j = n / 2^(j+1)
    b_final = 1
    half = n // 2
    for u in us:
        term = (FP.inv(u) + u * pow(x, half, FP.modulus)) % FP.modulus
        b_final = b_final * term % FP.modulus
        half //= 2

    # s vector: s_i = prod_j u_j^(+1 if bit else -1) — one vectorized
    # object-array select+multiply per round instead of n*k Python ops
    s = np.ones(n, dtype=object)
    idx = np.arange(n)
    half = n // 2
    for u in us:
        u_inv = FP.inv(u)
        choice = np.where(
            (idx & half).astype(bool),
            np.full(n, u, dtype=object),
            np.full(n, u_inv, dtype=object),
        )
        s = s * choice % FP.modulus
        half //= 2

    # expected: [a0] G_fin + [a0*b_fin] U' + [r_fin] W
    #        == P + [v] U' + sum ([u^2] L + [u^-2] R)
    lhs_scalars = [int(v) for v in a0 * s % FP.modulus] + [a0 * b_final % FP.modulus, r_final]
    lhs = msm(VESTA, params.g + [u_point, params.w], lhs_scalars)

    rhs_pts = [commitment, u_point]
    rhs_scalars = [1, value % FP.modulus]
    for L, R, u in zip(ls, rs, us):
        rhs_pts += [L, R]
        u_inv = FP.inv(u)
        rhs_scalars += [u * u % FP.modulus, u_inv * u_inv % FP.modulus]
    rhs = msm(VESTA, rhs_pts, rhs_scalars)
    return lhs == rhs
