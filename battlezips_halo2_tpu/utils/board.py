"""Board: full game-board state and witness formatting.

Semantic mirror of the reference's ``src/utils/board.rs``: merges ship
placements into one 100-bit field, transposing vertical placements via
``v_index = j % 10 * 10 + j // 10`` (board.rs:84-94), and formats the 10
H/V witness values in [H5, V5, H4, V4, H3a, V3a, H3b, V3b, H2, V2] order
(board.rs:107-120).
"""

from __future__ import annotations

from .binary import BOARD_SIZE, BinaryValue
from .deck import Deck
from .ship import DEFAULT_WITNESS_OPTIONS, Ship, WitnessOption


class Board:
    def __init__(self, ships: Deck | None = None):
        self.ships = ships if ships is not None else Deck()

    @staticmethod
    def from_deck(deck: Deck) -> "Board":
        board = Board()
        for ship in deck.iterator():
            if ship is not None:
                board.place(ship)
        return board

    def place(self, ship: Ship):
        """Add a ship; refuses double-placement of a type (board.rs:60-68)."""
        if self.ships[ship.ship_type] is not None:
            raise ValueError("Ship type has already been placed!")
        self.ships.add(ship)

    def state(self, options=DEFAULT_WITNESS_OPTIONS) -> BinaryValue:
        """Merged (transposed) board bitfield (board.rs:77-98)."""
        state = 0
        for ship, option in zip(self.ships.iterator(), options):
            if ship is None:
                continue
            h, v = ship.witness(option)
            for j in range(BOARD_SIZE):
                if h.bit(j):
                    state |= 1 << j
                if v.bit(j):
                    state |= 1 << (j % 10 * 10 + j // 10)
        return BinaryValue(state)

    def witness(self, options=DEFAULT_WITNESS_OPTIONS) -> list[BinaryValue]:
        """10 H/V placement values in fixed order (board.rs:107-120)."""
        out: list[BinaryValue] = []
        for ship, option in zip(self.ships.iterator(), options):
            if ship is None:
                out += [BinaryValue.empty(), BinaryValue.empty()]
            else:
                out += ship.witness(option)
        return out

    def render(self) -> str:
        """ASCII board (board.rs:125-147)."""
        state = self.state()
        lines = []
        for row in range(10):
            cells = " ".join(str(int(state.bit(row * 10 + col))) for col in range(10))
            lines.append(f"{row} | {cells}")
        lines.append(" (Y)")
        lines.reverse()
        lines.append("   -------------------- (X)")
        lines.append("    0 1 2 3 4 5 6 7 8 9")
        return "\n".join(lines)

    def print(self):
        print(self.render())
