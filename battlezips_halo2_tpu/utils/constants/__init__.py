"""Protocol constants (reference: src/utils/constants.rs) and golden tables.

The fixed-base window tables (reference: src/utils/constants/fixed_bases/)
are loaded from ``reference_tables.json``, extracted verbatim from the
reference's published constant tables by ``tools/extract_reference_vectors.py``.
They double as parity oracles for our own table generation
(gadgets/ecc tables must regenerate them byte-for-byte).
"""

from __future__ import annotations

import json
from functools import lru_cache
from pathlib import Path

# 3-bit windows for a 255-bit scalar (constants.rs:4)
NUM_WINDOWS = 85
FIXED_BASE_WINDOW_SIZE = 3
H = 8  # 2^window_size
# domain separator for hash-to-curve (constants.rs:6)
BOARD_COMMITMENT_PERSONALIZATION = "battlezips:hash2curve"
# lookup range-check table size (constants.rs:10)
LOOKUP_SIZE = 10
# hash-to-curve messages for the two generators (constants.rs:13-16)
BOARD_COMMITMENT_V_BYTES = b"v"
BOARD_COMMITMENT_R_BYTES = b"r"

_TABLES_PATH = Path(__file__).parent / "reference_tables.json"


@lru_cache(maxsize=1)
def reference_tables() -> dict:
    return json.loads(_TABLES_PATH.read_text())


def _generator(name: str):
    from ...curves.host import PALLAS

    d = reference_tables()[name]
    return PALLAS.from_xy_bytes(bytes.fromhex(d["generator_x"]), bytes.fromhex(d["generator_y"]))


def _load(name: str):
    d = reference_tables()[name]
    return {
        "generator": _generator(name),
        "z": list(d["z"]),
        "u": [[bytes.fromhex(b) for b in window] for window in d["u"]],
    }


BOARD_COMMIT_V_GENERATOR = _generator("board_commit_v")
BOARD_COMMIT_R_GENERATOR = _generator("board_commit_r")


def board_commit_v_table() -> dict:
    return _load("board_commit_v")


def board_commit_r_table() -> dict:
    return _load("board_commit_r")
