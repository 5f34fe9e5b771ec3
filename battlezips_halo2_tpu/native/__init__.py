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
    _lib = _try_load()
    if _lib is None:
        # a stale/copied _pasta.so can pass the mtime check yet miss newer
        # symbols (AttributeError on argtypes assignment) — rebuild once and
        # retry before degrading to the Python path (ADVICE r4)
        if _build():
            _lib = _try_load()
    return _lib


def _try_load():
    try:
        lib = ctypes.CDLL(str(_LIB))
        lib.pasta_mul_batch.argtypes = [ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64]
        lib.pasta_inv_batch.argtypes = [ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64]
        lib.pasta_msm.argtypes = [ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64]
        lib.pasta_find_z.argtypes = [ctypes.c_int, ctypes.c_char_p, ctypes.c_int64]
        lib.pasta_find_z.restype = ctypes.c_int64
        lib.pasta_ntt_batch.argtypes = [ctypes.c_int, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_char_p]
        lib.pasta_scale_batch.argtypes = [ctypes.c_int, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_char_p, ctypes.c_char_p]
        lib.pasta_vm_exec.argtypes = [
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.pasta_mul_vec.argtypes = [ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        lib.pasta_axpy.argtypes = [ctypes.c_int, ctypes.c_void_p, ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        lib.pasta_horner.argtypes = [ctypes.c_int, ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_char_p]
        lib.pasta_inner.argtypes = [ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p]
        lib.pasta_div_linear.argtypes = [ctypes.c_int, ctypes.c_void_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_char_p]
        lib.pasta_point_decompress.argtypes = [
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.pasta_point_decompress.restype = ctypes.c_int64
        lib.pasta_ipa_s.argtypes = [
            ctypes.c_int, ctypes.c_char_p, ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ]
        lib.pasta_grand_product.argtypes = [
            ctypes.c_int, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.pasta_window_fold.argtypes = [
            ctypes.c_int, ctypes.c_char_p, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ]
        return lib
    except (OSError, AttributeError):
        return None


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


def ints_to_bytes_arr(xs) -> "object":
    """List of ints -> (len, 32) uint8 array of LE canonical reprs."""
    import numpy as np

    buf = b"".join(int(x).to_bytes(32, "little") for x in xs)
    return np.frombuffer(buf, dtype=np.uint8).reshape(len(xs), 32).copy()


def bytes_arr_to_ints(arr) -> list[int]:
    """(N, 32) uint8 array -> list of ints."""
    import numpy as np

    data = np.ascontiguousarray(arr).tobytes()
    return [int.from_bytes(data[i * 32 : (i + 1) * 32], "little") for i in range(arr.shape[0])]


def _buf_ptr(arr):
    import numpy as np

    assert arr.dtype == np.uint8 and arr.flags["C_CONTIGUOUS"]
    return arr.ctypes.data_as(ctypes.c_void_p)


def ntt_batch(which: int, data, omega: int) -> None:
    """In-place forward NTT of a (b, n, 32) uint8 canonical-bytes batch
    using the order-n root `omega` (native C++ radix-2; poly/transforms.py
    latency tier). Inverse = ntt_batch(omega^-1) + scale_batch(1, n^-1)."""
    lib = load()
    assert lib is not None
    b, n = data.shape[0], data.shape[1]
    lib.pasta_ntt_batch(which, _buf_ptr(data), b, n, int(omega).to_bytes(32, "little"))


def scale_batch(which: int, data, g: int, mult: int) -> None:
    """In-place data[j][i] *= mult * g^i over a (b, n, 32) canonical-bytes
    batch (coset power scaling / iNTT normalization)."""
    lib = load()
    assert lib is not None
    b, n = data.shape[0], data.shape[1]
    lib.pasta_scale_batch(
        which, _buf_ptr(data), b, n,
        int(g).to_bytes(32, "little"), int(mult).to_bytes(32, "little"),
    )


def vm_exec(which: int, prog, regs):
    """Run the gate-eval bytecode (ops/gate_eval.py instruction format) over
    a (n_regs, ext, 32) canonical-bytes register file; returns register 0
    (the y-fold aggregate) as an (ext, 32) uint8 array."""
    import numpy as np

    lib = load()
    assert lib is not None
    prog = np.ascontiguousarray(prog, dtype=np.int32)
    n_regs, ext = regs.shape[0], regs.shape[1]
    out = np.empty((ext, 32), dtype=np.uint8)
    lib.pasta_vm_exec(
        which, prog.ctypes.data_as(ctypes.c_void_p), prog.shape[0],
        _buf_ptr(regs), n_regs, ext, _buf_ptr(out),
    )
    return out


def mul_vec(which: int, a, b):
    """Elementwise field product of two (n, 32) canonical-bytes arrays."""
    import numpy as np

    lib = load()
    assert lib is not None
    a = np.ascontiguousarray(a)
    b = np.ascontiguousarray(b)
    n = a.shape[0]
    out = np.empty((n, 32), dtype=np.uint8)
    lib.pasta_mul_vec(which, _buf_ptr(a), _buf_ptr(b), _buf_ptr(out), n)
    return out


def inv_vec(which: int, a):
    """Batch field inversion of an (n, 32) canonical-bytes array."""
    import numpy as np

    lib = load()
    n = a.shape[0]
    out = ctypes.create_string_buffer(32 * n)
    lib.pasta_inv_batch(which, np.ascontiguousarray(a).tobytes(), out, n)
    return np.frombuffer(out.raw, dtype=np.uint8).reshape(n, 32).copy()


def axpy(which: int, a, s: int, b):
    """out = a * s + b over (n, 32) canonical-bytes arrays (scalar s)."""
    import numpy as np

    lib = load()
    a = np.ascontiguousarray(a)
    b = np.ascontiguousarray(b)
    n = a.shape[0]
    out = np.empty((n, 32), dtype=np.uint8)
    lib.pasta_axpy(which, _buf_ptr(a), int(s).to_bytes(32, "little"), _buf_ptr(b), _buf_ptr(out), n)
    return out


def horner(which: int, coeffs, x: int) -> int:
    """Evaluate a (n, 32) canonical-bytes polynomial at x."""
    lib = load()
    out = ctypes.create_string_buffer(32)
    lib.pasta_horner(which, _buf_ptr(coeffs), coeffs.shape[0], int(x).to_bytes(32, "little"), out)
    return int.from_bytes(out.raw, "little")


def inner(which: int, a, b) -> int:
    """<a, b> over (n, 32) canonical-bytes arrays."""
    import numpy as np

    lib = load()
    a = np.ascontiguousarray(a)
    b = np.ascontiguousarray(b)
    out = ctypes.create_string_buffer(32)
    lib.pasta_inner(which, _buf_ptr(a), _buf_ptr(b), a.shape[0], out)
    return int.from_bytes(out.raw, "little")


def div_linear(which: int, poly, point: int) -> int:
    """In-place synthetic division of a (n, 32) canonical-bytes polynomial
    by (X - point); returns the remainder (caller asserts exactness)."""
    lib = load()
    rem = ctypes.create_string_buffer(32)
    lib.pasta_div_linear(which, _buf_ptr(poly), poly.shape[0], int(point).to_bytes(32, "little"), rem)
    return int.from_bytes(rem.raw, "little")


def point_decompress(which: int, data) -> tuple:
    """Batch compressed-point decode. data: (n, 32) uint8 (or bytes of
    length 32n). Returns (xy: (n, 64) uint8 canonical affine, status:
    (n,) uint8 with 0=point 1=identity 2=malformed, first_bad: int|-1).
    Mirrors curves/host.py Curve.from_bytes bit-for-bit (tests)."""
    import numpy as np

    lib = load()
    assert lib is not None
    if isinstance(data, (bytes, bytearray)):
        data = np.frombuffer(bytes(data), dtype=np.uint8).reshape(-1, 32)
    data = np.ascontiguousarray(data)
    n = data.shape[0]
    out = np.empty((n, 64), dtype=np.uint8)
    status = np.empty(n, dtype=np.uint8)
    bad = lib.pasta_point_decompress(
        which, _buf_ptr(data), _buf_ptr(out), _buf_ptr(status), n
    )
    return out, status, int(bad)


def ipa_s_vector(which: int, us: list[int], a0: int, n: int) -> "object":
    """(n, 32) canonical-bytes s-vector of the IPA verifier:
    s_i = a0 * prod_{j: bit (k-1-j) of i} u_j."""
    import numpy as np

    lib = load()
    assert lib is not None
    k = len(us)
    assert n == 1 << k
    ub = b"".join(int(u).to_bytes(32, "little") for u in us)
    out = np.empty((n, 32), dtype=np.uint8)
    lib.pasta_ipa_s(which, ub, int(a0).to_bytes(32, "little"), _buf_ptr(out), n, k)
    return out


def grand_product(which: int, nums, dens, carry: int):
    """z[0]=carry, z[i+1]=z[i]*nums[i]/dens[i] with one batch inversion.
    nums/dens: (usable, 32) canonical-bytes arrays -> (usable+1, 32)."""
    import numpy as np

    lib = load()
    assert lib is not None
    nums = np.ascontiguousarray(nums)
    dens = np.ascontiguousarray(dens)
    usable = nums.shape[0]
    out = np.empty((usable + 1, 32), dtype=np.uint8)
    lib.pasta_grand_product(
        which, _buf_ptr(nums), _buf_ptr(dens),
        int(carry).to_bytes(32, "little"), _buf_ptr(out), usable,
    )
    return out


def window_fold_batch(which: int, points_flat, b: int, n_windows: int, c_bits: int) -> list:
    """Batched Horner window fold: points_flat = b*n_windows affine (x, y)
    tuples / None in window order (LSB window first per result). Returns b
    affine points (None = identity). OpenMP over the batch — replaces
    ~c*W Python-int point ops PER COLUMN in the batched commit paths."""
    import numpy as np

    lib = load()
    assert lib is not None
    pbuf = points_buffer(points_flat)
    out = ctypes.create_string_buffer(64 * b)
    lib.pasta_window_fold(which, pbuf, out, b, n_windows, c_bits)
    results = []
    for i in range(b):
        x = int.from_bytes(out.raw[64 * i : 64 * i + 32], "little")
        y = int.from_bytes(out.raw[64 * i + 32 : 64 * i + 64], "little")
        results.append(None if x == 0 and y == 0 else (x, y))
    return results


def msm_buf_scalars(which: int, pbuf: bytes, sarr) -> tuple | None:
    """MSM over a prebuilt point buffer with scalars as an (n, 32)
    canonical-bytes array — zero per-scalar Python marshalling."""
    import numpy as np

    lib = load()
    n = len(pbuf) // 64
    sarr = np.ascontiguousarray(sarr)
    assert sarr.shape[0] == n
    out = ctypes.create_string_buffer(64)
    lib.pasta_msm(which, pbuf, sarr.ctypes.data_as(ctypes.c_char_p), out, n)
    x = int.from_bytes(out.raw[:32], "little")
    y = int.from_bytes(out.raw[32:], "little")
    if x == 0 and y == 0:
        return None
    return (x, y)


def msm_buf(which: int, pbuf: bytes, scalars) -> tuple | None:
    """MSM over a PREBUILT point buffer (64 bytes per affine point) — the
    per-call point marshalling dominates native MSM time for the prover's
    repeated commits against the same SRS, so callers cache pbuf."""
    lib = load()
    assert lib is not None
    n = len(pbuf) // 64
    sbuf = b"".join(int(s).to_bytes(32, "little") for s in scalars)
    assert len(scalars) == n
    out = ctypes.create_string_buffer(64)
    lib.pasta_msm(which, pbuf, sbuf, out, n)
    x = int.from_bytes(out.raw[:32], "little")
    y = int.from_bytes(out.raw[32:], "little")
    if x == 0 and y == 0:
        return None
    return (x, y)


def points_buffer(points) -> bytes:
    """Affine (x, y) tuples / None -> the 64-byte-per-point MSM buffer."""
    return b"".join(
        (b"\x00" * 64) if p is None else (p[0].to_bytes(32, "little") + p[1].to_bytes(32, "little"))
        for p in points
    )


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
