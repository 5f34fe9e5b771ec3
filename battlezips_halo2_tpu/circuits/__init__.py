"""Application circuits: BoardCircuit (k=12) and ShotCircuit (k=11)."""

from .board import BoardChip, BoardCircuit, BoardConfig, commitment_label
from .shot import ShotChip, ShotCircuit, ShotConfig, compute_shot_trace

__all__ = [
    "BoardChip",
    "BoardCircuit",
    "BoardConfig",
    "commitment_label",
    "ShotChip",
    "ShotCircuit",
    "ShotConfig",
    "compute_shot_trace",
]
