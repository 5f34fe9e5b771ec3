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

SRS derivation is our own deterministic try-and-increment hash (domain
"battlezips-tpu:srs:*"); byte-parity with halo2's hash_to_curve-derived
Params is tracked as a follow-up (SURVEY.md §7.3 item 1).
"""

from __future__ import annotations

import hashlib
import json
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
    W (blinding base)."""

    k: int
    g: list  # n Vesta points
    u: Point
    w: Point

    @staticmethod
    def new(k: int) -> "Params":
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
    cache = Path(__file__).resolve().parent.parent.parent / ".artifacts" / f"srs_{k}.json"
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


def commit_lagrange(params: Params, values: list[int], blind: int) -> Point:
    """Commit to values in the Lagrange basis — identical MSM shape since G
    is basis-agnostic for binding; the PLONK layer converts beforehand. Kept
    for API parity."""
    return commit(params, values, blind)


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
    n = params.n
    a = [c % FP.modulus for c in coeffs] + [0] * (n - len(coeffs))
    b = []
    acc = 1
    for _ in range(n):
        b.append(acc)
        acc = acc * x % FP.modulus
    g: list[Point] = list(params.g)

    xi = transcript.squeeze_challenge_nonzero()
    u_point = VESTA.mul(params.u, xi)

    r = blind % FP.modulus
    length = n
    while length > 1:
        half = length // 2
        a_lo, a_hi = a[:half], a[half:length]
        b_lo, b_hi = b[:half], b[half:length]
        g_lo, g_hi = g[:half], g[half:length]

        l_blind = FP.random(rng)
        r_blind = FP.random(rng)
        value_l = _inner(a_lo, b_hi)
        value_r = _inner(a_hi, b_lo)
        L = msm(VESTA, g_hi + [u_point, params.w], a_lo + [value_l, l_blind])
        R = msm(VESTA, g_lo + [u_point, params.w], a_hi + [value_r, r_blind])
        transcript.write_point(L)
        transcript.write_point(R)
        u = transcript.squeeze_challenge_nonzero()
        u_inv = FP.inv(u)

        a = [(u * lo + u_inv * hi) % FP.modulus for lo, hi in zip(a_lo, a_hi)]
        b = [(u_inv * lo + u * hi) % FP.modulus for lo, hi in zip(b_lo, b_hi)]
        g = [VESTA.add(VESTA.mul(glo, u_inv), VESTA.mul(ghi, u)) for glo, ghi in zip(g_lo, g_hi)]
        r = (r + u * u % FP.modulus * l_blind + u_inv * u_inv % FP.modulus * r_blind) % FP.modulus
        length = half

    transcript.write_scalar(a[0])
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

    # s vector: s_i = prod_j u_j^(+1 if bit else -1)
    s = [1] * n
    half = n // 2
    for u in us:
        u_inv = FP.inv(u)
        for i in range(n):
            s[i] = s[i] * (u if (i & half) else u_inv) % FP.modulus
        half //= 2

    # expected: [a0] G_fin + [a0*b_fin] U' + [r_fin] W
    #        == P + [v] U' + sum ([u^2] L + [u^-2] R)
    lhs_scalars = [a0 * si % FP.modulus for si in s] + [a0 * b_final % FP.modulus, r_final]
    lhs = msm(VESTA, params.g + [u_point, params.w], lhs_scalars)

    rhs_pts = [commitment, u_point]
    rhs_scalars = [1, value % FP.modulus]
    for L, R, u in zip(ls, rs, us):
        rhs_pts += [L, R]
        u_inv = FP.inv(u)
        rhs_scalars += [u * u % FP.modulus, u_inv * u_inv % FP.modulus]
    rhs = msm(VESTA, rhs_pts, rhs_scalars)
    return lhs == rhs
