"""Ship placement model + malicious witness generators.

Semantic mirror of the reference's ``src/utils/ship.rs``: ship types with
lengths 5/4/3/3/2 (ship.rs:24-33), (x, y, z) placement where ``z`` means
vertical (ship.rs:87-92), the vertical-transpose serialization rule
(ship.rs:147-161), and the five malicious witness generators used by the
negative test-suite (ship.rs:220-331).
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum

from .binary import BOARD_SIZE, BinaryValue


class ShipType(Enum):
    CARRIER = 0
    BATTLESHIP = 1
    CRUISER = 2
    SUBMARINE = 3
    DESTROYER = 4

    @property
    def length(self) -> int:
        # ship.rs:55-62
        return {0: 5, 1: 4, 2: 3, 3: 3, 4: 2}[self.value]

    @property
    def full_name(self) -> str:
        return {
            0: "Aircraft Carrier",
            1: "Battleship",
            2: "Cruiser",
            3: "Submarine",
            4: "Destroyer",
        }[self.value]


def get_ship_length(i: int) -> int:
    """Ship length by placement-tuple index (ship.rs:19-31)."""
    return {0: 5, 1: 4, 2: 3, 3: 3, 4: 2}.get(i, 0)


class WitnessOption(Enum):
    """Witness-generation modes, including adversarial fault injection
    (ship.rs:316-331). Rational players only ever use DEFAULT."""

    DEFAULT = "default"
    DUAL_PLACEMENT = "dual_placement"
    NONCONSECUTIVE = "nonconsecutive"
    EXTRA_BIT = "extra_bit"
    OVERSIZED = "oversized"
    UNDERSIZED = "undersized"


DEFAULT_WITNESS_OPTIONS = (WitnessOption.DEFAULT,) * 5  # ship.rs:333-339


@dataclass(frozen=True)
class Ship:
    ship_type: ShipType
    x: int  # [0, 9]
    y: int  # [0, 9]
    z: bool  # False: extends horizontally (+x); True: vertically (+y)

    def coordinates(self, transpose: bool) -> list[int]:
        """Serialized cell indices; vertical ships store ``x*10 + y`` when
        transposed (ship.rs:147-161)."""
        out = []
        for i in range(self.ship_type.length):
            x_i = self.x if self.z else self.x + i
            y_i = self.y + i if self.z else self.y
            x = x_i * 10 if (transpose and self.z) else x_i
            y = y_i if (transpose and self.z) else y_i * 10
            out.append(x + y)
        return out

    def bits(self, transpose: bool) -> BinaryValue:
        """100-bit board mask of this placement (ship.rs:169-176)."""
        v = BinaryValue.empty()
        for c in self.coordinates(transpose):
            v = v.with_bit(c, True)
        return v

    # --- witness generation (ship.rs:189-311) -----------------------------
    def witness(self, option: WitnessOption = WitnessOption.DEFAULT) -> list[BinaryValue]:
        """[H, V] placement pair where the unused orientation is zero; the
        non-default options tamper with the honest witness for negative
        tests (ship.rs:189-212)."""
        return {
            WitnessOption.DEFAULT: self._default_witness,
            WitnessOption.DUAL_PLACEMENT: self._dual_placement,
            WitnessOption.NONCONSECUTIVE: self._nonconsecutive,
            WitnessOption.EXTRA_BIT: self._extra_bit,
            WitnessOption.OVERSIZED: self._oversized,
            WitnessOption.UNDERSIZED: self._undersized,
        }[option]()

    def _default_witness(self) -> list[BinaryValue]:
        placement = self.bits(True)
        if self.z:
            return [BinaryValue.empty(), placement]
        return [placement, BinaryValue.empty()]

    def _dual_placement(self) -> list[BinaryValue]:
        """Move the first bit into the opposite orientation (ship.rs:220-240)."""
        placement = self._default_witness()
        index = self.coordinates(True)[0]
        src, dst = (1, 0) if self.z else (0, 1)
        placement[dst] = placement[dst].with_bit(index, True)
        placement[src] = placement[src].with_bit(index, False)
        return placement

    def _nonconsecutive(self) -> list[BinaryValue]:
        """Shift the last bit forward one cell (ship.rs:242-262)."""
        placement = self._default_witness()
        index = self.coordinates(True)[self.ship_type.length - 1]
        t = 1 if self.z else 0
        placement[t] = placement[t].with_bit(index, False).with_bit(index + 1, True)
        return placement

    def _extra_bit(self) -> list[BinaryValue]:
        """Set bit 0 in addition to the honest run (ship.rs:264-277)."""
        placement = self._default_witness()
        t = 1 if self.z else 0
        placement[t] = placement[t].with_bit(0, True)
        return placement

    def _oversized(self) -> list[BinaryValue]:
        """Append one consecutive extra bit (ship.rs:279-293)."""
        placement = self._default_witness()
        index = self.coordinates(True)[self.ship_type.length - 1]
        t = 1 if self.z else 0
        placement[t] = placement[t].with_bit(index + 1, True)
        return placement

    def _undersized(self) -> list[BinaryValue]:
        """Drop the last bit (ship.rs:295-311)."""
        placement = self._default_witness()
        index = self.coordinates(True)[self.ship_type.length - 1]
        t = 1 if self.z else 0
        placement[t] = placement[t].with_bit(index, False)
        return placement

    # --- rendering (ship.rs:112-136) --------------------------------------
    def render(self) -> str:
        bits = self.bits(True)
        lines = []
        for row in range(10):
            cells = " ".join(str(int(bits.bit(row * 10 + col))) for col in range(10))
            lines.append(f"{row} | {cells}")
        h, v = ("Y", "X") if self.z else ("X", "Y")
        lines.append(f" ({v})")
        lines.reverse()
        lines.append(f"   -------------------- ({h})")
        lines.append("    0 1 2 3 4 5 6 7 8 9")
        return "\n".join(lines)

    def print(self):
        print(self.render())
