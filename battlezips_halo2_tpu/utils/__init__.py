"""Battleship domain layer (reference: src/utils/, SURVEY.md §2.1)."""

from .binary import BOARD_SIZE, BinaryValue
from .board import Board
from .deck import Deck
from .pedersen import pedersen_commit
from .ship import DEFAULT_WITNESS_OPTIONS, Ship, ShipType, WitnessOption
from .shot import serialize

__all__ = [
    "BOARD_SIZE",
    "BinaryValue",
    "Board",
    "Deck",
    "Ship",
    "ShipType",
    "WitnessOption",
    "DEFAULT_WITNESS_OPTIONS",
    "serialize",
    "pedersen_commit",
]
