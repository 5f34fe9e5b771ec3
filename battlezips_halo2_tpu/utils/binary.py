"""256-bit little-endian bitfield wrapper (BinaryValue / U256).

Semantic mirror of the reference's ``src/utils/binary.rs`` (BinaryValue over
``BitArray<[u8; 32], Lsb0>``, binary.rs:16-108), re-designed for Python: the
bitfield is a plain int (bit i of the int == bit i of the LE bit array), which
makes every conversion a shift/mask instead of a byte-level loop.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..fields.host import FP

BOARD_SIZE = 100  # reference: src/utils/board.rs:12


@dataclass(frozen=True)
class BinaryValue:
    """A 256-bit LE bitfield; ``value`` is an int in [0, 2^256)."""

    value: int = 0

    def __post_init__(self):
        if not 0 <= self.value < (1 << 256):
            raise ValueError("BinaryValue out of 256-bit range")

    # --- constructors (binary.rs:24-50) ----------------------------------
    @staticmethod
    def empty() -> "BinaryValue":
        return BinaryValue(0)

    @staticmethod
    def from_repr(data: bytes) -> "BinaryValue":
        assert len(data) == 32
        return BinaryValue(int.from_bytes(data, "little"))

    @staticmethod
    def from_fp(v: int) -> "BinaryValue":
        """From a canonical Fp element (binary.rs:35-38)."""
        return BinaryValue(v % FP.modulus)

    @staticmethod
    def from_u8(v: int) -> "BinaryValue":
        assert 0 <= v < 256
        return BinaryValue(v)

    @staticmethod
    def from_bits(bits) -> "BinaryValue":
        acc = 0
        for i, b in enumerate(bits):
            acc |= (1 if b else 0) << i
        return BinaryValue(acc)

    # --- accessors (binary.rs:52-88) -------------------------------------
    def to_repr(self) -> bytes:
        return self.value.to_bytes(32, "little")

    def to_fp(self) -> int:
        """As a canonical Fp element; raises if >= p (Fp::from_repr unwrap)."""
        if self.value >= FP.modulus:
            raise ValueError("BinaryValue is not a canonical Fp element")
        return self.value

    def lower_u128(self) -> int:
        """Low 128 bits (binary.rs:62-72)."""
        return self.value & ((1 << 128) - 1)

    def bit(self, i: int) -> bool:
        return bool((self.value >> i) & 1)

    def bitfield(self, s: int) -> list[int]:
        """First ``s`` bits as 0/1 field elements (binary.rs:81-88)."""
        return [(self.value >> i) & 1 for i in range(s)]

    # --- mutation-style helpers (frozen: return new values) ---------------
    def with_bit(self, i: int, on: bool) -> "BinaryValue":
        if on:
            return BinaryValue(self.value | (1 << i))
        return BinaryValue(self.value & ~(1 << i))

    def zip(self, to: "BinaryValue") -> "BinaryValue":
        """OR-merge the first 100 bits; fails on overlap (binary.rs:97-108)."""
        mask = (1 << BOARD_SIZE) - 1
        a, b = self.value & mask, to.value & mask
        if a & b:
            i = (a & b).bit_length() - 1  # highest overlapping bit (any is fatal)
            raise ValueError(f"Cannot zip together bit #{i}")
        return BinaryValue(a | b)

    def popcount(self, s: int = BOARD_SIZE) -> int:
        return bin(self.value & ((1 << s) - 1)).count("1")
