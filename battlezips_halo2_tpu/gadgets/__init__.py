"""Circuit gadgets: bitify, placement, transpose, range-check, ECC, Pedersen
(SURVEY.md §7.1 item 8)."""

from .bitify import BitifyConfig, Bits2NumChip, Num2BitsChip
from .ecc import EccChip, EccConfig
from .fixed_bases import FixedBase, board_commit_r, board_commit_v, decompose_scalar
from .pedersen import PedersenCommitmentChip, PedersenCommitmentConfig
from .placement import PlacementChip, PlacementConfig, compute_placement_trace
from .range_check import LookupRangeCheck, LookupRangeCheckConfig
from .transpose import TransposeChip, TransposeConfig

__all__ = [
    "BitifyConfig",
    "Bits2NumChip",
    "Num2BitsChip",
    "EccChip",
    "EccConfig",
    "FixedBase",
    "board_commit_r",
    "board_commit_v",
    "decompose_scalar",
    "PedersenCommitmentChip",
    "PedersenCommitmentConfig",
    "PlacementChip",
    "PlacementConfig",
    "compute_placement_trace",
    "LookupRangeCheck",
    "LookupRangeCheckConfig",
    "TransposeChip",
    "TransposeConfig",
]
