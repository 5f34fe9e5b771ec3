"""Deck: the set of (up to) five placed ships.

Semantic mirror of the reference's ``src/utils/deck.rs`` — five optional
ships, iterated in fixed carrier→destroyer order (deck.rs:78-86), indexable
by ShipType (deck.rs:107-130).
"""

from __future__ import annotations

from .ship import Ship, ShipType


class Deck:
    def __init__(self):
        self._ships: dict[ShipType, Ship | None] = {t: None for t in ShipType}

    @staticmethod
    def default() -> "Deck":
        """Five valid, predictably placed ships (deck.rs:33-46)."""
        d = Deck()
        d.add(Ship(ShipType.CARRIER, 0, 0, False))
        d.add(Ship(ShipType.BATTLESHIP, 0, 1, False))
        d.add(Ship(ShipType.CRUISER, 0, 2, False))
        d.add(Ship(ShipType.SUBMARINE, 0, 3, False))
        d.add(Ship(ShipType.DESTROYER, 0, 4, False))
        return d

    @staticmethod
    def from_placements(ships) -> "Deck":
        """Build from 5 optional (x, y, z) tuples in enum order (deck.rs:53-71)."""
        d = Deck()
        for ship_type, placement in zip(ShipType, ships):
            if placement is not None:
                x, y, z = placement
                d.add(Ship(ship_type, x, y, bool(z)))
        return d

    def iterator(self) -> list[Ship | None]:
        """Fixed carrier→destroyer order (deck.rs:78-86)."""
        return [self._ships[t] for t in ShipType]

    def add(self, ship: Ship):
        self._ships[ship.ship_type] = ship

    def remove(self, ship_type: ShipType):
        self._ships[ship_type] = None

    def __getitem__(self, ship_type: ShipType) -> Ship | None:
        return self._ships[ship_type]

    def __setitem__(self, ship_type: ShipType, ship: Ship | None):
        self._ships[ship_type] = ship
