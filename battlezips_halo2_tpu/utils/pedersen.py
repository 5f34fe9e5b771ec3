"""Off-circuit Pedersen commitment on Pallas.

Semantic mirror of the reference's ``src/utils/pedersen.rs:17-27``:
``commit(m, r) = [m]V + [r]R`` where V, R are the hash-to-curve outputs for
personalization "battlezips:hash2curve" and messages "v"/"r", and the
base-field message m is lifted to the scalar field by byte-repr
reinterpretation (valid since p < q... both orders, canonical reprs always
decode; pedersen.rs:24 follows the Orchard spec's lift).

Until the hash-to-curve derivation lands, the generators are loaded from the
reference's own fixed-base tables (board_commit_{v,r}.rs GENERATOR bytes) —
public constants used as golden vectors.
"""

from __future__ import annotations

from .constants import BOARD_COMMIT_R_GENERATOR, BOARD_COMMIT_V_GENERATOR
from ..curves.host import PALLAS, Point
from ..fields.host import FP, FQ


def lift_to_scalar(message_fp: int) -> int:
    """Reinterpret a canonical Fp repr as an Fq element (pedersen.rs:24)."""
    return FQ.from_repr(FP.to_repr(message_fp))


def pedersen_commit(message: int, trapdoor: int) -> Point:
    """Commit to an Fp message with an Fq trapdoor: [m]V + [r]R."""
    m = lift_to_scalar(message % FP.modulus)
    v = PALLAS.mul(BOARD_COMMIT_V_GENERATOR, m)
    r = PALLAS.mul(BOARD_COMMIT_R_GENERATOR, trapdoor % FQ.modulus)
    return PALLAS.add(v, r)
