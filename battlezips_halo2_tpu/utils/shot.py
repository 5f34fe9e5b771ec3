"""Shot serialization (reference: src/utils/shot.rs:12-19).

``serialize([x0..], [y0..])`` returns a 100-bit value with bit ``y*10 + x``
set per shot. Honest players pass exactly one shot; multiple shots exist
only to drive the negative tests (invalid_multi_shot etc.).
"""

from __future__ import annotations

from .binary import BinaryValue


def serialize(xs, ys) -> BinaryValue:
    v = BinaryValue.empty()
    for x, y in zip(xs, ys):
        v = v.with_bit(int(y) * 10 + int(x), True)
    return v
