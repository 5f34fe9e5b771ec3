"""Off-circuit Pedersen commitment on Pallas.

Semantic mirror of the reference's ``src/utils/pedersen.rs:17-27``:
``commit(m, r) = [m]V + [r]R`` where V, R are the hash-to-curve outputs for
personalization "battlezips:hash2curve" and messages "v"/"r", and the
base-field message m is lifted to the scalar field by byte-repr
reinterpretation (valid since p < q... both orders, canonical reprs always
decode; pedersen.rs:24 follows the Orchard spec's lift).

Generator provenance: the production constants load from the pinned
reference-extracted table (utils/constants/reference_tables.json — the
parity oracle). The INDEPENDENT from-scratch SSWU derivation lives in
``derived_generators()`` below (curves/hashtocurve.py), which asserts byte
equality against the pinned constants; tests/test_hashtocurve.py runs that
cross-check on every suite run (it costs ~1 s, so it is not repeated at
import time).
"""

from __future__ import annotations

from .constants import (
    BOARD_COMMIT_R_GENERATOR,
    BOARD_COMMIT_V_GENERATOR,
    BOARD_COMMITMENT_PERSONALIZATION,
    BOARD_COMMITMENT_R_BYTES,
    BOARD_COMMITMENT_V_BYTES,
)
from ..curves.host import PALLAS, Point
from ..fields.host import FP, FQ


def derived_generators():
    """Generators from the SSWU hash (must equal the pinned table bytes)."""
    from ..curves.hashtocurve import hash_to_curve

    hasher = hash_to_curve(PALLAS, BOARD_COMMITMENT_PERSONALIZATION)
    v = hasher(BOARD_COMMITMENT_V_BYTES)
    r = hasher(BOARD_COMMITMENT_R_BYTES)
    assert v == BOARD_COMMIT_V_GENERATOR and r == BOARD_COMMIT_R_GENERATOR
    return v, r


def lift_to_scalar(message_fp: int) -> int:
    """Reinterpret a canonical Fp repr as an Fq element (pedersen.rs:24)."""
    return FQ.from_repr(FP.to_repr(message_fp))


def pedersen_commit(message: int, trapdoor: int) -> Point:
    """Commit to an Fp message with an Fq trapdoor: [m]V + [r]R."""
    m = lift_to_scalar(message % FP.modulus)
    v = PALLAS.mul(BOARD_COMMIT_V_GENERATOR, m)
    r = PALLAS.mul(BOARD_COMMIT_R_GENERATOR, trapdoor % FQ.modulus)
    return PALLAS.add(v, r)
