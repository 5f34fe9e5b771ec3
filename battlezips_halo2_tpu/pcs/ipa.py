"""Inner-product-argument polynomial commitment scheme over Vesta.

Framework analog of ``halo2_proofs::poly::commitment`` (SURVEY.md §2.2 "IPA
commitment scheme"): deterministic SRS, blinded Pedersen vector commitments
(every commitment is one device MSM), and the log-n inner-product opening
argument in halo2 0.2.0's exact shape (synthetic-blinding S commitment,
xi/z challenges, asymmetric folds -- see create_open_proof /
verify_open_proof docstrings for the round equations).

Commitments ride the TPU (batched device MSMs, mesh-sharded under an
active parallel/context mesh); the Fiat-Shamir-SEQUENTIAL inner-product
rounds ride the native C++ host Pippenger (prefer_host): each round would
otherwise pay a full relay round trip.

SRS derivation follows halo2 0.2.0 (hash_to_curve("Halo2-Parameters") on
Vesta via the from-scratch SSWU in curves/hashtocurve.py); a documented
try-and-increment fallback derivation is kept for comparison.
"""

from __future__ import annotations

import hashlib
import json

import numpy as np
from dataclasses import dataclass
from functools import lru_cache
from pathlib import Path

from ..curves.host import VESTA, Curve, Point
from ..fields.host import FP, FQ
from ..ops.msm import msm
from ..plonk.transcript import TranscriptRead, TranscriptWrite

SRS_DOMAIN = b"battlezips-tpu:srs"


class PolyInts(list):
    """Coefficient list that also carries its (n, 32) canonical-bytes array
    so downstream native consumers (quotient batch build, Horner evals)
    skip the per-coefficient int->bytes marshalling. Semantically a plain
    list; the ``bytes_arr`` attribute is an optimization side channel.

    Invariant (ADVICE r4): any in-place mutation DROPS ``bytes_arr`` so a
    consumer can never compute from stale bytes — getattr returns None and
    the caller re-marshals from the ints. Slicing degrades to a plain list
    (attribute simply absent), which is equally safe."""

    __slots__ = ("bytes_arr",)

    @staticmethod
    def wrap(ints, bytes_arr):
        p = PolyInts(ints)
        p.bytes_arr = bytes_arr
        return p

    def _drop(self):
        try:
            del self.bytes_arr
        except AttributeError:
            pass

    def __setitem__(self, *a):
        self._drop()
        return list.__setitem__(self, *a)

    def __delitem__(self, *a):
        self._drop()
        return list.__delitem__(self, *a)

    def __iadd__(self, other):
        self._drop()
        return list.__iadd__(self, other)

    def __imul__(self, other):
        self._drop()
        return list.__imul__(self, other)

    def append(self, *a):
        self._drop()
        return list.append(self, *a)

    def extend(self, *a):
        self._drop()
        return list.extend(self, *a)

    def insert(self, *a):
        self._drop()
        return list.insert(self, *a)

    def pop(self, *a):
        self._drop()
        return list.pop(self, *a)

    def remove(self, *a):
        self._drop()
        return list.remove(self, *a)

    def sort(self, **kw):
        self._drop()
        return list.sort(self, **kw)

    def reverse(self):
        self._drop()
        return list.reverse(self)

    def clear(self):
        self._drop()
        return list.clear(self)


def _derive_point(curve: Curve, label: bytes, index: int) -> Point:
    """Deterministic nothing-up-my-sleeve point: try-and-increment over a
    blake2b counter stream."""
    ctr = 0
    base = curve.base
    while True:
        h = hashlib.blake2b(digest_size=64)
        h.update(SRS_DOMAIN + b":" + label)
        h.update(index.to_bytes(4, "little") + ctr.to_bytes(4, "little"))
        x = base.from_bytes_wide(h.digest())
        y2 = base.add(base.mul(x, base.mul(x, x)), 5)
        y = base.sqrt(y2)
        if y is not None:
            if y & 1:
                y = base.neg(y)
            return (x, y)
        ctr += 1


@dataclass
class Params:
    """SRS for circuits up to 2^k rows: G vector, U (inner-product base),
    W (blinding base).

    Default derivation follows halo2 0.2.0's ``Params::new``: every point is
    ``hash_to_curve("Halo2-Parameters")`` on Vesta — G_i from the u32 LE
    index bytes, W and U from b"w"/b"u" — using our from-scratch SSWU
    implementation (byte-validated against the reference's Pallas
    generators; the Vesta instantiation uses the identical derived
    convention). ``new_try_increment`` keeps the previous self-consistent
    derivation."""

    k: int
    g: list  # n Vesta points
    u: Point
    w: Point

    @staticmethod
    def new(k: int) -> "Params":
        from ..curves.hashtocurve import hash_to_curve

        hasher = hash_to_curve(VESTA, "Halo2-Parameters")
        n = 1 << k
        g = [hasher(i.to_bytes(4, "little")) for i in range(n)]
        w = hasher(b"w")
        u = hasher(b"u")
        return Params(k, g, u, w)

    @staticmethod
    def new_try_increment(k: int) -> "Params":
        n = 1 << k
        g = [_derive_point(VESTA, b"g", i) for i in range(n)]
        u = _derive_point(VESTA, b"u", 0)
        w = _derive_point(VESTA, b"w", 0)
        return Params(k, g, u, w)

    @property
    def n(self) -> int:
        return 1 << self.k

    # --- persistence (SURVEY.md §5.4: params/pk/vk artifact store) --------
    def save(self, path):
        data = {
            "k": self.k,
            "g": [VESTA.to_bytes(p).hex() for p in self.g],
            "u": VESTA.to_bytes(self.u).hex(),
            "w": VESTA.to_bytes(self.w).hex(),
        }
        Path(path).write_text(json.dumps(data))

    @staticmethod
    def load(path) -> "Params":
        data = json.loads(Path(path).read_text())
        return Params(
            k=data["k"],
            g=[VESTA.from_bytes(bytes.fromhex(h)) for h in data["g"]],
            u=VESTA.from_bytes(bytes.fromhex(data["u"])),
            w=VESTA.from_bytes(bytes.fromhex(data["w"])),
        )


@lru_cache(maxsize=4)
def cached_params(k: int) -> Params:
    cache = Path(__file__).resolve().parent.parent.parent / ".artifacts" / f"srs_h2c_{k}.json"
    if cache.exists():
        return Params.load(cache)
    params = Params.new(k)
    cache.parent.mkdir(exist_ok=True)
    params.save(cache)
    return params


def _params_pbuf(params: Params) -> bytes:
    """Cached native-MSM point buffer for [G | W] — marshalling 2^k affine
    points to bytes dominates a native commit, and the SRS never changes."""
    pbuf = getattr(params, "_native_pbuf", None)
    if pbuf is None:
        from .. import native

        pbuf = native.points_buffer(params.g + [params.w])
        params._native_pbuf = pbuf
    return pbuf


def _host_commit_many(params: Params, polys: list, blinds: list) -> list[Point]:
    """Latency-tier commits: native C++ Pippenger over the cached [G | W]
    buffer — ~1 ms per commitment at k=12, no relay round trip."""
    from .. import native

    which = native.which_for(VESTA.base.modulus)
    pbuf = _params_pbuf(params)
    m = FP.modulus
    return [
        native.msm_buf(
            which, pbuf, [v % m for v in poly] + [0] * (params.n - len(poly)) + [blind % m]
        )
        for poly, blind in zip(polys, blinds)
    ]


def commit(params: Params, coeffs: list[int], blind: int) -> Point:
    """<coeffs, G> + [blind] W — one device MSM. With an active mesh
    (parallel/context.py) the MSM is TP-sharded over the mesh axis; below
    the latency threshold (ops/engine.py) it rides the native host
    Pippenger instead of paying a relay dispatch."""
    assert len(coeffs) <= params.n
    from ..parallel.context import get_mesh, mesh_is_active

    if mesh_is_active():
        from ..parallel.msm import sharded_msm_many

        scalars = list(coeffs) + [0] * (params.n - len(coeffs)) + [blind]
        return sharded_msm_many(VESTA, params.g + [params.w], [scalars], get_mesh())[0]
    from ..ops.engine import use_host_engine

    if use_host_engine(params.n):
        return _host_commit_many(params, [coeffs], [blind])[0]
    points = params.g[: len(coeffs)] + [params.w]
    scalars = list(coeffs) + [blind]
    return msm(VESTA, points, scalars)


def commit_lagrange_many(
    params: Params,
    domain,
    values_list: list,
    blinds: list,
    engine: str | None = None,
    chunk: int | None = None,
):
    """Fused Lagrange->coeff->commit: iNTT, digit extraction and the
    Pippenger window sums run in ONE device dispatch per chunk (the former
    two-dispatch path paid a coeff download + digit upload round-trip per
    prover phase, plus host digit extraction). Returns (coeff_polys,
    commitments). The blinding [b]W rides the host-native path (one fixed
    point) and is added into the folded result — bit-identical to
    commit_many (point addition is exact and order-free).

    Falls back to batch_lagrange_to_coeff + commit_many under an active
    mesh (the sharded MSM owns that path) and off-TPU (the fused device
    graph hits the pathological XLA-CPU compile). BZ_FORCE_FUSED_COMMIT=1
    forces the fused branch on any backend — the default-tier bit-identity
    test runs it on CPU at tiny k (tests/test_fused_commit.py).

    ``engine`` overrides the use_host_engine routing per call ("host" =
    native C++, "device" = fused device graph); ``chunk`` overrides the
    fused path's columns-per-dispatch (the batch prover commits hundreds
    of k<=12 columns in one dispatch to amortize relay latency)."""
    from ..config import config as _config
    from ..parallel.context import mesh_is_active
    from ..ops.msm import (
        _compiled_commit_batch,
        auto_window,
        device_backend_is_tpu,
        host_msm,
        host_window_fold,
    )
    from ..ops.dispatch import device_call
    from ..curves.limb import affine_to_jacobian_host, jacobian_to_affine_host
    from ..fields.limb import FieldSpec
    from ..fields import limb as L

    assert len(values_list) == len(blinds)
    if not values_list:
        return [], []
    from ..ops.engine import use_host_engine

    if engine is None:
        engine_host = use_host_engine(domain.n) and not _config().force_fused_commit
    else:
        assert engine in ("host", "device")
        engine_host = engine == "host"
    if engine_host and not mesh_is_active():
        # latency tier, fully in canonical-bytes form: native iNTT feeds the
        # native Pippenger directly — no per-coefficient Python between the
        # transform and the commit (the int materialization happens once,
        # for the coefficient polys the rest of the prover consumes)
        import numpy as np

        from .. import native

        which_fp = native.which_for(FP.modulus)
        which_pt = native.which_for(VESTA.base.modulus)
        n = domain.n
        b = len(values_list)
        data = np.zeros((b, n, 32), np.uint8)
        for i, col in enumerate(values_list):
            data[i] = native.ints_to_bytes_arr([v % FP.modulus for v in col])
        native.ntt_batch(which_fp, data, pow(domain.omega, -1, FP.modulus))
        native.scale_batch(which_fp, data, 1, pow(n, -1, FP.modulus))
        pbuf = _params_pbuf(params)
        points = []
        sc = np.empty((n + 1, 32), np.uint8)
        for i in range(b):
            sc[:n] = data[i]
            sc[n] = np.frombuffer(
                (blinds[i] % FP.modulus).to_bytes(32, "little"), dtype=np.uint8
            )
            points.append(native.msm_buf_scalars(which_pt, pbuf, sc))
        polys = [
            PolyInts.wrap(native.bytes_arr_to_ints(data[i]), data[i]) for i in range(b)
        ]
        return polys, points
    if mesh_is_active() or (
        engine != "device"
        and not device_backend_is_tpu()
        and not _config().force_fused_commit
    ):
        from ..poly.transforms import batch_lagrange_to_coeff

        # both stages route by tier: the iNTT through _maybe_native /
        # _maybe_sharded, the commits through commit_many's host branch
        polys = batch_lagrange_to_coeff(domain, values_list)
        return polys, commit_many(params, polys, blinds)

    import jax.numpy as jnp
    import numpy as np

    n = domain.n
    assert all(len(v) == n for v in values_list)
    c, _ = auto_window(n)
    # the fused path uses UNSIGNED digits packed with the point index into
    # one int32 sort key (ops/msm.py), so c + idx_bits must fit in 31 bits;
    # auto_window's pick can exceed that from n = 2^19 (ADVICE r3) — cap it
    # (costs a few % more rows) instead of crashing at trace time
    idx_bits = max(1, (n - 1).bit_length())
    c = min(c, 31 - idx_bits)
    spec = FieldSpec.make(VESTA.base.modulus)
    jac = affine_to_jacobian_host(spec, params.g)
    qx, qy = jnp.asarray(jac.x), jnp.asarray(jac.y)
    qinf = jnp.zeros(n, dtype=bool)

    polys: list = []
    points: list = []
    if chunk is None:
        chunk = 8 if n <= (1 << 12) else 4  # worker-watchdog bound (BENCH_NOTES)
    for start in range(0, len(values_list), chunk):
        group = values_list[start : start + chunk]
        b_target = max(1, 1 << (len(group) - 1).bit_length())
        vals = np.stack(
            [
                np.asarray(L.ints_to_limbs([int(x) % FP.modulus for x in v]))
                for v in group
            ]
            + [np.zeros((n, 16), np.uint32)] * (b_target - len(group))
        ).astype(np.uint16)  # canonical limbs < 2^16: halves the upload
        f = _compiled_commit_batch(
            VESTA.base.modulus, FP.modulus, n, c, b_target, domain.omega
        )
        coeffs, ws, colls = device_call(
            f, qx, qy, qinf, jnp.asarray(vals), what="fused lagrange commit"
        )
        coeffs = np.asarray(coeffs)
        colls = np.asarray(colls)
        w_count = ws.x.shape[1]
        flat = type(jac)(
            np.asarray(ws.x).reshape(-1, 16),
            np.asarray(ws.y).reshape(-1, 16),
            np.asarray(ws.z).reshape(-1, 16),
        )
        aff = jacobian_to_affine_host(spec, flat)
        from ..ops.msm import fold_window_sums

        bases = fold_window_sums(VESTA, aff, len(group), w_count, c)
        for gi in range(len(group)):
            poly = L.limbs_to_ints(coeffs[gi])
            polys.append(poly)
            if bool(colls[gi].any()):
                # incomplete-add collision (astronomically rare with
                # random commit scalars): recompute this one on host
                base = host_msm(VESTA, params.g, poly)
            else:
                base = bases[gi]
            blinded = host_msm(VESTA, [params.w], [blinds[start + gi]])
            points.append(VESTA.add(base, blinded))
    return polys, points


def lagrange_basis_commitment(params: Params, domain, row: int) -> Point:
    """G_lag_row = commit(L_row) — the SRS re-expressed in the Lagrange
    basis, one row at a time. L_row(X) = (1/n)·Σ_i ω^{-row·i} X^i, so the
    point is a single dense MSM, computed once and cached per (params,
    row). Lets the VERIFIER commit a sparse instance column as a couple of
    point scalar-muls instead of an iNTT + dense n-point MSM (the board
    instance has 2 values; that MSM was ~30 ms of its ~70 ms budget)."""
    cache = getattr(params, "_lagrange_basis_commits", None)
    if cache is None:
        cache = params._lagrange_basis_commits = {}
    if row not in cache:
        m = FP.modulus
        w_inv = pow(domain.omega, -(row % domain.n), m)
        n_inv = pow(domain.n, -1, m)
        scalars = []
        acc = n_inv
        for _ in range(domain.n):
            scalars.append(acc)
            acc = acc * w_inv % m
        from ..ops.msm import host_msm

        cache[row] = host_msm(VESTA, params.g, scalars)
    return cache[row]


def commit_lagrange_sparse(params: Params, domain, values: list) -> Point:
    """Commitment of a Lagrange-basis column with blind 0, as
    Σ_{i: v_i≠0} [v_i]·G_lag_i. Bit-identical to
    commit(lagrange_to_coeff(values), 0) — it is the SAME group element —
    but O(nnz) scalar-muls. Callers gate on a small nonzero count."""
    m = FP.modulus
    points, scalars = [], []
    for i, v in enumerate(values):
        v = v % m
        if v:
            points.append(lagrange_basis_commitment(params, domain, i))
            scalars.append(v)
    if not points:
        return None
    return msm(VESTA, points, scalars, prefer_host=True)


def commit_many(
    params: Params,
    polys: list,
    blinds: list,
    engine: str | None = None,
    chunk: int | None = None,
) -> list[Point]:
    """Commit a batch of polynomials in ONE vmapped device MSM over the
    shared [G | W] point set; TP-sharded under an active mesh. ``engine``
    / ``chunk`` as in commit_lagrange_many."""
    from ..ops.msm import msm_many

    assert len(polys) == len(blinds)
    if not polys:
        return []
    from ..parallel.context import get_mesh, mesh_is_active

    if mesh_is_active():
        from ..parallel.msm import sharded_msm_many

        points = params.g + [params.w]
        scalars_list = [list(p) + [0] * (params.n - len(p)) + [b] for p, b in zip(polys, blinds)]
        return sharded_msm_many(VESTA, points, scalars_list, get_mesh())
    from ..ops.engine import use_host_engine

    if engine is None:
        engine_host = use_host_engine(params.n)
    else:
        assert engine in ("host", "device")
        engine_host = engine == "host"
    if engine_host:
        return _host_commit_many(params, polys, blinds)
    if engine == "device":
        # coefficient-form fused device commit: in-graph digit extraction
        # (msm_many's host scalars_to_signed_digits cost seconds of Python
        # per batched-session phase) + uint16 IO. Same exact points.
        return _device_commit_coeff_many(params, polys, blinds, chunk or 4)
    points = params.g + [params.w]
    scalars_list = [list(p) + [0] * (params.n - len(p)) + [b] for p, b in zip(polys, blinds)]
    return msm_many(VESTA, points, scalars_list, chunk=chunk)


def _device_commit_coeff_many(params: Params, polys: list, blinds: list, chunk: int) -> list[Point]:
    """commit_many's device tier: the fused commit graph with
    from_lagrange=False — coefficient polys in, window sums out; the host
    folds windows and adds [blind]W (bit-identical to every other commit
    path: point arithmetic is exact)."""
    import jax.numpy as jnp
    import numpy as np

    from ..curves.limb import affine_to_jacobian_host, jacobian_to_affine_host
    from ..fields import limb as L
    from ..fields.limb import FieldSpec
    from ..ops.dispatch import device_call
    from ..ops.msm import (
        _compiled_commit_batch,
        auto_window,
        host_msm,
        host_window_fold,
    )
    from ..poly.domain import EvaluationDomain

    n = params.n
    c, _ = auto_window(n)
    idx_bits = max(1, (n - 1).bit_length())
    c = min(c, 31 - idx_bits)
    spec = FieldSpec.make(VESTA.base.modulus)
    jac = affine_to_jacobian_host(spec, params.g)
    qx, qy = jnp.asarray(jac.x), jnp.asarray(jac.y)
    qinf = jnp.zeros(n, dtype=bool)
    # any valid omega works — the graph skips the iNTT entirely; use the
    # canonical domain root so the compile cache key is stable
    omega = EvaluationDomain(params.k, 2).omega

    points: list = []
    for start in range(0, len(polys), chunk):
        group = polys[start : start + chunk]
        b_target = max(1, 1 << (len(group) - 1).bit_length())
        vals = np.stack(
            [
                np.asarray(
                    L.ints_to_limbs(
                        [int(x) % FP.modulus for x in p] + [0] * (n - len(p))
                    )
                )
                for p in group
            ]
            + [np.zeros((n, 16), np.uint32)] * (b_target - len(group))
        ).astype(np.uint16)
        f = _compiled_commit_batch(
            VESTA.base.modulus, FP.modulus, n, c, b_target, omega, from_lagrange=False
        )
        _, ws, colls = device_call(
            f, qx, qy, qinf, jnp.asarray(vals), what="fused coeff commit"
        )
        colls = np.asarray(colls)
        w_count = ws.x.shape[1]
        flat = type(jac)(
            np.asarray(ws.x).reshape(-1, 16),
            np.asarray(ws.y).reshape(-1, 16),
            np.asarray(ws.z).reshape(-1, 16),
        )
        aff = jacobian_to_affine_host(spec, flat)
        from ..ops.msm import fold_window_sums

        bases = fold_window_sums(VESTA, aff, len(group), w_count, c)
        for gi in range(len(group)):
            if bool(colls[gi].any()):
                base = host_msm(VESTA, params.g, list(group[gi]))
            else:
                base = bases[gi]
            blinded = host_msm(VESTA, [params.w], [blinds[start + gi]])
            points.append(VESTA.add(base, blinded))
    return points


def _inner(a: list[int], b: list[int]) -> int:
    acc = 0
    for x, y in zip(a, b):
        acc += x * y
    return acc % FP.modulus


def _create_open_proof_native(
    params: Params,
    transcript: TranscriptWrite,
    coeffs_arr,
    blind: int,
    x: int,
    rng,
):
    """Latency-tier IPA opening: the same round structure as
    create_open_proof below with the polynomial / b-vector / G-coefficient
    state held as (n, 32) canonical-bytes arrays and every vector op in the
    native runtime — the log-n Fiat-Shamir rounds cost ~1 ms each instead
    of ~40 ms of object-array Python. Bit-identical by construction."""
    import numpy as np

    from .. import native

    m = FP.modulus
    n = params.n
    which = native.which_for(m)
    which_pt = native.which_for(VESTA.base.modulus)
    gbuf = getattr(params, "_native_gbuf", None)
    if gbuf is None:
        gbuf = native.points_buffer(params.g)
        params._native_gbuf = gbuf

    def row_int(arr, i):
        return int.from_bytes(arr[i].tobytes(), "little")

    def set_row(arr, i, v):
        arr[i] = np.frombuffer((v % m).to_bytes(32, "little"), dtype=np.uint8)

    p_prime = np.zeros((n, 32), np.uint8)
    p_prime[: coeffs_arr.shape[0]] = coeffs_arr[:n]
    # b = (1, x, x^2, ...): scale a vector of ones by powers of x
    b = np.zeros((1, n, 32), np.uint8)
    b[:, :, 0] = 1
    native.scale_batch(which, b, x, 1)
    b = b[0]

    s_ints = [FP.random(rng) for _ in range(n)]
    s_arr = native.ints_to_bytes_arr(s_ints)
    s_at_x = native.horner(which, s_arr, x)
    set_row(s_arr, 0, s_ints[0] - s_at_x)
    s_blind = FP.random(rng)
    sc = np.empty((n + 1, 32), np.uint8)
    sc[:n] = s_arr
    set_row(sc, n, s_blind)
    transcript.write_point(native.msm_buf_scalars(which_pt, _params_pbuf(params), sc))

    xi = transcript.squeeze_challenge()
    z = transcript.squeeze_challenge()

    p_prime = native.axpy(which, s_arr, xi, p_prime)  # xi*S + P
    v = native.inner(which, p_prime, b)  # p'(x)
    set_row(p_prime, 0, row_int(p_prime, 0) - v)
    f = (blind + xi * s_blind) % m

    c_coeff = np.zeros((n, 32), np.uint8)
    c_coeff[:, 0] = 1
    zeros = np.zeros((n, 32), np.uint8)
    pos = np.arange(n)

    length = n
    while length > 1:
        half = length // 2
        p_lo, p_hi = p_prime[:half], p_prime[half:length]
        b_lo, b_hi = b[:half], b[half:length]

        l_rand = FP.random(rng)
        r_rand = FP.random(rng)
        value_l = native.inner(which, p_hi, b_lo)
        value_r = native.inner(which, p_lo, b_hi)

        hi_mask = pos >= half
        gather_l = p_prime[np.where(~hi_mask, pos + half, 0)]
        gather_r = p_prime[np.where(hi_mask, pos - half, 0)]
        v_l = native.mul_vec(which, c_coeff, gather_l)
        v_r = native.mul_vec(which, c_coeff, gather_r)
        v_l[hi_mask] = 0
        v_r[~hi_mask] = 0
        base_l = native.msm_buf_scalars(which_pt, gbuf, v_l)
        base_r = native.msm_buf_scalars(which_pt, gbuf, v_r)
        L = msm(VESTA, [base_l, params.u, params.w], [1, value_l * z % m, l_rand], prefer_host=True)
        R = msm(VESTA, [base_r, params.u, params.w], [1, value_r * z % m, r_rand], prefer_host=True)
        transcript.write_point(L)
        transcript.write_point(R)
        u = transcript.squeeze_challenge_nonzero()
        u_inv = FP.inv(u)

        p_prime = native.axpy(which, p_hi, u_inv, p_lo)
        b = native.axpy(which, b_hi, u, b_lo)
        scaled = native.axpy(which, c_coeff, u, zeros)
        c_coeff = np.where(hi_mask[:, None], scaled, c_coeff)
        pos = np.where(hi_mask, pos - half, pos)
        f = (f + u_inv * l_rand + u * r_rand) % m
        length = half

    transcript.write_scalar(row_int(p_prime, 0))
    transcript.write_scalar(f)


def create_open_proof(
    params: Params,
    transcript: TranscriptWrite,
    coeffs: list[int],
    blind: int,
    x: int,
    rng,
):
    """Open the committed polynomial at x (value p(x) is already known to
    the verifier via the transcript).

    halo2 0.2.0 structure (poly/commitment/prover.rs create_proof):

    1. commit a random polynomial S with a root at x (written), squeeze ξ
       (binds P to S) and z (guards the U term);
    2. fold P' = ξ·S + P with its constant term shifted so P'(x) = 0;
    3. k rounds:  L_j = <p'_hi, G'_lo> + [z·<p'_hi, b_lo>]U + [l_rand]W,
                  R_j = <p'_lo, G'_hi> + [z·<p'_lo, b_hi>]U + [r_rand]W,
       squeeze u_j, fold p' <- p'_lo + u_j^-1·p'_hi, b <- b_lo + u_j·b_hi,
       G' <- G'_lo + u_j·G'_hi (so C' = C + [u_j^-1]L + [u_j]R);
    4. write a = p'_final and the synthetic blind
       f = blind' + Σ (u_j^-1·l_rand_j + u_j·r_rand_j).

    The folded G' vector is never materialized: each folded entry is a
    u-power product of original G points, so every round's L/R point parts
    are MSMs over the ORIGINAL G with composite scalar vectors (c =
    accumulated u-powers, pos = current fold position) — same bytes, device
    MSMs instead of host point folds."""
    m = FP.modulus
    n = params.n
    from ..ops.msm import msm_many

    p_prime = np.zeros(n, dtype=object)
    p_prime[: len(coeffs)] = [c % m for c in coeffs]
    b = np.empty(n, dtype=object)
    acc = 1
    for i in range(n):
        b[i] = acc
        acc = acc * x % m

    # --- synthetic random polynomial with a root at x ----------------------
    s_poly = [FP.random(rng) for _ in range(n)]
    s_at_x = 0
    for c in reversed(s_poly):
        s_at_x = (s_at_x * x + c) % m
    s_poly[0] = (s_poly[0] - s_at_x) % m
    s_blind = FP.random(rng)
    transcript.write_point(commit(params, s_poly, s_blind))

    xi = transcript.squeeze_challenge()
    z = transcript.squeeze_challenge()

    s_arr = np.empty(n, dtype=object)
    s_arr[:] = s_poly
    p_prime = (xi * s_arr + p_prime) % m
    v = int(np.sum(p_prime * b)) % m  # p'(x) before the shift
    p_prime[0] = (p_prime[0] - v) % m
    f = (blind + xi * s_blind) % m

    c_coeff = np.ones(n, dtype=object)
    pos = np.arange(n)

    # the per-round L/R MSMs ride the native Pippenger over a CACHED G
    # buffer when available — rebuilding the 64-byte-per-point buffer every
    # round is the dominant marshalling cost of the log-n fold
    from .. import native as _native

    _gbuf = None
    if _native.available():
        _gbuf = getattr(params, "_native_gbuf", None)
        if _gbuf is None:
            _gbuf = _native.points_buffer(params.g)
            params._native_gbuf = _gbuf
        _which = _native.which_for(VESTA.base.modulus)

    length = n
    while length > 1:
        half = length // 2
        p_lo, p_hi = p_prime[:half], p_prime[half:length]
        b_lo, b_hi = b[:half], b[half:length]

        l_rand = FP.random(rng)
        r_rand = FP.random(rng)
        value_l = int(np.sum(p_hi * b_lo)) % m
        value_r = int(np.sum(p_lo * b_hi)) % m

        # composite scalars over the ORIGINAL G: an original index i sits at
        # fold position pos_i with coefficient c_i, so
        #   <p'_hi, G'_lo> = Σ_{pos_i <  half} c_i · p'[pos_i + half] · G_i
        #   <p'_lo, G'_hi> = Σ_{pos_i >= half} c_i · p'[pos_i - half] · G_i
        hi_mask = pos >= half
        v_l = np.where(~hi_mask, c_coeff * p_prime[np.where(~hi_mask, pos + half, 0)] % m, 0)
        v_r = np.where(hi_mask, c_coeff * p_prime[np.where(hi_mask, pos - half, 0)] % m, 0)
        # Fiat-Shamir forces these log-n rounds to be SEQUENTIAL, so each
        # L/R pays full dispatch latency — the native host Pippenger
        # (prefer_host) computes them in ~ms with zero relay round trips
        if _gbuf is not None:
            base_l = _native.msm_buf(_which, _gbuf, [int(t) for t in v_l])
            base_r = _native.msm_buf(_which, _gbuf, [int(t) for t in v_r])
        else:
            base_l, base_r = msm_many(
                VESTA, params.g, [[int(t) for t in v_l], [int(t) for t in v_r]], prefer_host=True
            )
        L = msm(VESTA, [base_l, params.u, params.w], [1, value_l * z % m, l_rand], prefer_host=True)
        R = msm(VESTA, [base_r, params.u, params.w], [1, value_r * z % m, r_rand], prefer_host=True)
        transcript.write_point(L)
        transcript.write_point(R)
        u = transcript.squeeze_challenge_nonzero()
        u_inv = FP.inv(u)

        p_prime = (p_lo + u_inv * p_hi) % m
        b = (b_lo + u * b_hi) % m
        # G' <- G'_lo + u·G'_hi: high-half entries pick up a factor u and
        # move down; low-half entries are unchanged
        c_coeff = np.where(hi_mask, c_coeff * u % m, c_coeff)
        pos = np.where(hi_mask, pos - half, pos)
        f = (f + u_inv * l_rand + u * r_rand) % m
        length = half

    transcript.write_scalar(int(p_prime[0]))
    transcript.write_scalar(f)


def verify_open_proof(
    params: Params,
    transcript: TranscriptRead,
    commitment: Point,
    x: int,
    value: int,
) -> bool:
    """Verify an opening; O(n) MSM for G_final plus O(log n) point ops.

    halo2 0.2.0 structure (poly/commitment/verifier.rs): read S, squeeze
    ξ and z, read k (L, R, u_j) rounds, then check

        [a]G_fin + [a·b_fin·z]U + [f]W
            == P - [v]G_0 + [ξ]S + Σ_j ([u_j^-1]L_j + [u_j]R_j)

    with b_fin = Π_j (1 + u_j·x^(n/2^(j+1))) and s_i = Π_{j: bit} u_j
    (the G' fold multiplies high halves by u_j and leaves low halves)."""
    m = FP.modulus
    n = params.n
    k = params.k
    s_commitment = transcript.read_point()
    xi = transcript.squeeze_challenge()
    z = transcript.squeeze_challenge()

    ls, rs, us = [], [], []
    for _ in range(k):
        ls.append(transcript.read_point())
        rs.append(transcript.read_point())
        us.append(transcript.squeeze_challenge_nonzero())
    a0 = transcript.read_scalar()
    f_final = transcript.read_scalar()

    # b_final = prod_j (1 + u_j * x^(half_j)), half_j = n / 2^(j+1)
    b_final = 1
    half = n // 2
    for u in us:
        b_final = b_final * ((1 + u * pow(x, half, m)) % m) % m
        half //= 2

    # s vector: s_i = prod_{j: bit (k-1-j) of i set} u_j, scaled by a0.
    # Native build (k doubling passes, n-1 field muls in C++) feeds the
    # final MSM as a bytes array with zero per-scalar marshalling; the
    # object-array branch remains the cross-check fallback.
    from .. import native as _native

    if _native.available():
        which_s = _native.which_for(FP.modulus)
        s_arr = _native.ipa_s_vector(which_s, us, a0, n)
        sc = np.empty((n + 2, 32), np.uint8)
        sc[:n] = s_arr
        sc[n] = np.frombuffer(
            (a0 * b_final % m * z % m).to_bytes(32, "little"), dtype=np.uint8
        )
        sc[n + 1] = np.frombuffer((f_final % m).to_bytes(32, "little"), dtype=np.uint8)
        guw = getattr(params, "_native_guw_buf", None)
        if guw is None:
            guw = _native.points_buffer(params.g + [params.u, params.w])
            params._native_guw_buf = guw
        which_pt = _native.which_for(VESTA.base.modulus)
        lhs = _native.msm_buf_scalars(which_pt, guw, sc)
    else:
        s = np.ones(n, dtype=object)
        idx = np.arange(n)
        half = n // 2
        for u in us:
            choice = np.where(
                (idx & half).astype(bool), np.full(n, u, dtype=object), np.ones(n, dtype=object)
            )
            s = s * choice % m
            half //= 2

        lhs_scalars = [int(v) for v in a0 * s % m] + [a0 * b_final % m * z % m, f_final]
        lhs = msm(VESTA, params.g + [params.u, params.w], lhs_scalars, prefer_host=True)

    rhs_pts = [commitment, params.g[0], s_commitment]
    rhs_scalars = [1, (-value) % m, xi]
    for L, R, u in zip(ls, rs, us):
        rhs_pts += [L, R]
        rhs_scalars += [FP.inv(u), u]
    rhs = msm(VESTA, rhs_pts, rhs_scalars, prefer_host=True)
    return lhs == rhs
