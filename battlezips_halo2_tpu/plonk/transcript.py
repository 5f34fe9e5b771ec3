"""Blake2b Fiat-Shamir transcript.

Framework analog of ``halo2_proofs::transcript::{Blake2bWrite, Blake2bRead,
Challenge255}`` (SURVEY.md §2.2 "Transcript"): a blake2b-512 state with
personalization "Halo2-Transcript", domain-prefix bytes for challenges (0),
points (1) and scalars (2), and 64-byte wide-reduced challenges. Points
absorb as (x, y) 32-byte LE reprs and serialize compressed (32 bytes);
scalars absorb and serialize as 32-byte LE reprs.
"""

from __future__ import annotations

import hashlib

from ..curves.host import Curve, Point
from ..fields.host import FP

PERSONALIZATION = b"Halo2-Transcript"
PREFIX_CHALLENGE = b"\x00"
PREFIX_POINT = b"\x01"
PREFIX_SCALAR = b"\x02"


class TranscriptError(ValueError):
    """Malformed proof bytes: truncation, non-canonical scalar reprs,
    off-curve or identity point encodings, trailing bytes. The analog of
    halo2's Err(Error::Transcript) — verify_proof maps EXACTLY this type
    to False, so an unrelated internal ValueError still surfaces as a bug
    instead of reading as an invalid proof (ADVICE r3)."""


class Transcript:
    """Shared absorb/squeeze core. Challenges live in Fp (the scalar field
    of the Vesta commitment curve)."""

    def __init__(self, curve: Curve):
        self.curve = curve
        self.state = hashlib.blake2b(digest_size=64, person=PERSONALIZATION)

    def common_point(self, point: Point):
        if point is None:
            raise ValueError("cannot absorb the identity point")
        self.state.update(PREFIX_POINT)
        self.state.update(self.curve.base.to_repr(point[0]))
        self.state.update(self.curve.base.to_repr(point[1]))

    def common_scalar(self, scalar: int):
        self.state.update(PREFIX_SCALAR)
        self.state.update(FP.to_repr(scalar % FP.modulus))

    def squeeze_challenge(self) -> int:
        """halo2 0.2.0 semantics (transcript.rs squeeze_challenge): absorb
        the challenge prefix byte, then finalize a CLONE of the state — the
        digest is NOT fed back into the running state (successive squeezes
        differ only by their prefix bytes)."""
        self.state.update(PREFIX_CHALLENGE)
        digest = self.state.copy().digest()
        return FP.from_bytes_wide(digest)

    def squeeze_challenge_nonzero(self) -> int:
        c = self.squeeze_challenge()
        while c == 0:  # cryptographically unreachable; loop for totality
            c = self.squeeze_challenge()
        return c


class TranscriptWrite(Transcript):
    def __init__(self, curve: Curve):
        super().__init__(curve)
        self.proof = bytearray()

    def write_point(self, point: Point):
        self.common_point(point)
        self.proof += self.curve.to_bytes(point)

    def write_scalar(self, scalar: int):
        self.common_scalar(scalar)
        self.proof += FP.to_repr(scalar % FP.modulus)

    def finalize(self) -> bytes:
        return bytes(self.proof)


class TranscriptRead(Transcript):
    def __init__(self, curve: Curve, proof: bytes):
        super().__init__(curve)
        self.proof = proof
        self.cursor = 0

    def _take(self, n: int) -> bytes:
        if self.cursor + n > len(self.proof):
            raise TranscriptError("proof too short")
        out = self.proof[self.cursor : self.cursor + n]
        self.cursor += n
        return out

    def read_point(self) -> Point:
        # decode failures (off-curve x, bad sign bit) and the identity
        # absorb are malformed-PROOF conditions — narrow them to
        # TranscriptError so the verifier's fail-closed catch stays scoped
        # to the decode layer
        try:
            point = self.curve.from_bytes(self._take(32))
            self.common_point(point)
        except ValueError as e:
            raise TranscriptError(str(e)) from e
        return point

    def read_scalar(self) -> int:
        try:
            scalar = FP.from_repr(self._take(32))
        except ValueError as e:
            raise TranscriptError(str(e)) from e
        self.common_scalar(scalar)
        return scalar

    def assert_consumed(self):
        if self.cursor != len(self.proof):
            raise TranscriptError(f"{len(self.proof) - self.cursor} unread proof bytes")
