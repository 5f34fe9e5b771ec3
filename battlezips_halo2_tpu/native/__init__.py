"""Native host runtime bindings (csrc/pasta.cpp via ctypes).

Loads (building on first use if needed) the C++ library implementing
4x64-limb Montgomery Pasta arithmetic, Jacobian curve ops, Pippenger MSM and
batch inversion for the host side of the framework. Pure-Python fallbacks in
fields/host.py and curves/host.py remain authoritative for correctness; this
is the performance path for witness precompute and CPU MSM.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

_SRC = Path(__file__).resolve().parent.parent.parent / "csrc" / "pasta.cpp"
_LIB = Path(__file__).resolve().parent / "_pasta.so"

_lib = None
_tried = False

FIELD_FP = 0  # Pallas base / Vesta scalar
FIELD_FQ = 1  # Vesta base / Pallas scalar

_FP_MODULUS = 0x40000000000000000000000000000000224698FC094CF91B992D30ED00000001
_FQ_MODULUS = 0x40000000000000000000000000000000224698FC0994A8DD8C46EB2100000001


def which_for(modulus: int) -> int:
    """Map a base-field modulus to the FieldCtx selector (guards against
    the FP/FQ mixup: Vesta POINTS live over FQ)."""
    if modulus == _FP_MODULUS:
        return FIELD_FP
    if modulus == _FQ_MODULUS:
        return FIELD_FQ
    raise ValueError(f"not a Pasta modulus: {hex(modulus)}")


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC", str(_SRC), "-o", str(_LIB)],
            check=True,
            capture_output=True,
            timeout=300,
        )
        return True
    except Exception:
        return False


def load():
    """Returns the ctypes library or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
        lib.pasta_mul_batch.argtypes = [ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64]
        lib.pasta_inv_batch.argtypes = [ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64]
        lib.pasta_msm.argtypes = [ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64]
        lib.pasta_find_z.argtypes = [ctypes.c_int, ctypes.c_char_p, ctypes.c_int64]
        lib.pasta_find_z.restype = ctypes.c_int64
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return load() is not None


def mul_batch(which: int, xs: list[int], ys: list[int], modulus: int) -> list[int]:
    lib = load()
    assert lib is not None
    n = len(xs)
    a = b"".join(x.to_bytes(32, "little") for x in xs)
    b = b"".join(y.to_bytes(32, "little") for y in ys)
    out = ctypes.create_string_buffer(32 * n)
    lib.pasta_mul_batch(which, a, b, out, n)
    return [int.from_bytes(out.raw[32 * i : 32 * (i + 1)], "little") for i in range(n)]


def inv_batch(which: int, xs: list[int]) -> list[int]:
    lib = load()
    assert lib is not None
    n = len(xs)
    a = b"".join(x.to_bytes(32, "little") for x in xs)
    out = ctypes.create_string_buffer(32 * n)
    lib.pasta_inv_batch(which, a, out, n)
    return [int.from_bytes(out.raw[32 * i : 32 * (i + 1)], "little") for i in range(n)]


def find_z(which: int, ys: list[int], z_max: int = 1 << 24) -> int | None:
    """Smallest z >= 0 with every y+z a square and every -y+z a non-residue
    (fixed-base canonicity witness, gadgets/fixed_bases.py). OpenMP-parallel
    Euler-criterion scan; ~1000x the pure-Python search."""
    lib = load()
    assert lib is not None
    assert len(ys) == 8
    buf = b"".join(int(y).to_bytes(32, "little") for y in ys)
    z = lib.pasta_find_z(which, buf, z_max)
    return None if z < 0 else int(z)


def msm(which: int, points, scalars) -> tuple | None:
    """points: affine (x, y) int tuples or None; scalars: ints (plain)."""
    lib = load()
    assert lib is not None
    n = len(points)
    pbuf = b"".join(
        (b"\x00" * 64) if p is None else (p[0].to_bytes(32, "little") + p[1].to_bytes(32, "little"))
        for p in points
    )
    sbuf = b"".join(int(s).to_bytes(32, "little") for s in scalars)
    out = ctypes.create_string_buffer(64)
    lib.pasta_msm(which, pbuf, sbuf, out, n)
    x = int.from_bytes(out.raw[:32], "little")
    y = int.from_bytes(out.raw[32:], "little")
    if x == 0 and y == 0:
        return None
    return (x, y)
