"""Alias package: the framework's "models" are its circuits.

The proving framework's model family = the application circuits
(BoardCircuit, ShotCircuit). This package re-exports them under the
conventional models/ name; the canonical home is circuits/.
"""

from ..circuits import (
    BoardChip,
    BoardCircuit,
    BoardConfig,
    ShotChip,
    ShotCircuit,
    ShotConfig,
)

__all__ = ["BoardChip", "BoardCircuit", "BoardConfig", "ShotChip", "ShotCircuit", "ShotConfig"]
