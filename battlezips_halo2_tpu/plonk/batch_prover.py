"""Batch-amortized prover: B same-circuit proofs, phase-synchronous.

The reference prover (halo2_proofs create_proof, consumed at
src/circuits/board.rs:913-921) proves one circuit per call; a game session
(BASELINE config 5: 64 shot + 8 board proofs) therefore pays the full
Fiat-Shamir pipeline latency per proof. On the TPU the pipeline cost is
dominated not by compute but by ~1.5 s of relay dispatch latency per
MB-scale executable execution (BENCH_NOTES round-4 anatomy) across ~10
Fiat-Shamir-sequential phases — ~29 s per proof however small the circuit.

This module restructures a batch of B proofs PHASE-SYNCHRONOUSLY: every
proof advances through the same Fiat-Shamir phase together, and each
phase's polynomial work for all B proofs runs as ONE batched device
dispatch (commits via the fused Lagrange-commit graph over hundreds of
columns, quotients via ops/gate_eval.BatchQuotientEvaluator). Host work
(witness synthesis, transcript squeezes, grand products) interleaves
per proof. The dispatch tax drops from ~10·1.5 s per PROOF to ~7·1.5 s
per BATCH.

Correctness contract: each proof's transcript, rng-draw order and field
ops are IDENTICAL to plonk/prover.create_proof — proof bytes are
bit-identical to the sequential prover given the same per-proof rngs
(tests/test_batch_prover.py asserts equality).

Transcripts are independent across proofs (each binds its own instance),
so batching changes no protocol semantics: only the *scheduling* of
device work differs.

Engine routing (``engine`` param / BZ_BATCH_ENGINE):
* ``device`` — batched device dispatches for commits + quotient; the
  Fiat-Shamir-sequential tail (evaluations, multiopen, IPA rounds) stays
  on the native host runtime (one L/R round trip per IPA round would
  re-introduce ~11 dispatches). Hybrid by design: both engines execute
  identical exact arithmetic, so the split is invisible in the bytes.
* ``host`` — the native C++ engine end-to-end (the latency tier), still
  phase-batched so the per-column native calls amortize marshalling.
* ``auto`` — device when a real accelerator backend is attached, host
  otherwise.
"""

from __future__ import annotations

import time

import numpy as np

from ..config import config as _config
from ..curves.host import VESTA
from ..fields.host import FP
from ..pcs.ipa import Params, PolyInts, commit_lagrange_many, commit_many
from ..pcs.multiopen import Query, multiopen_prove
from ..poly.domain import eval_poly_coeffs
from .arguments import ProofSchedule, evaluate_expression, permute_lookup_inputs
from .assignment import Assignment, Layouter
from .circuit import ConstraintSystem
from .expression import ColumnType
from .keys import DELTA, ProvingKey
from .prover import _configure_cached, _grand_product_prefix, _obj_array
from .transcript import TranscriptWrite

P = FP.modulus


def _batch_engine(explicit: str | None) -> str:
    if explicit is not None:
        assert explicit in ("auto", "device", "host")
        engine = explicit
    else:
        engine = _config().batch_engine
    if engine == "auto":
        from ..ops.msm import device_backend_is_tpu

        engine = "device" if device_backend_is_tpu() else "host"
    if engine == "host":
        from .. import native

        assert native.available(), (
            "batch engine 'host' needs the native runtime (csrc/pasta.cpp); "
            "build failed or g++ unavailable"
        )
    return engine


def _wrap_native(poly):
    """Attach the canonical-bytes side channel so the native tail (Horner
    evals, multiopen folds) skips per-coefficient marshalling."""
    if isinstance(poly, PolyInts) and getattr(poly, "bytes_arr", None) is not None:
        return poly
    from .. import native

    if not native.available():
        return poly
    ints = [v % P for v in poly]
    return PolyInts.wrap(ints, native.ints_to_bytes_arr(ints))


def _get_batch_quotient_evaluator(vk, schedule):
    ev = getattr(vk, "_batch_quotient_evaluator", None)
    if ev is None:
        from .prover import _evaluator_lock

        with _evaluator_lock:
            ev = getattr(vk, "_batch_quotient_evaluator", None)
            if ev is None:
                from ..ops.gate_eval import BatchQuotientEvaluator

                ev = BatchQuotientEvaluator(vk, schedule)
                vk._batch_quotient_evaluator = ev
    return ev


class _ProofState:
    """Per-proof mutable state threaded through the phases."""


def create_proofs_batched(
    params: Params,
    pk: ProvingKey,
    circuits: list,
    instances_list: list,
    rngs: list,
    engine: str | None = None,
) -> list[bytes]:
    """Prove ``circuits[i]`` with public input ``instances_list[i]`` and
    blinding randomness ``rngs[i]``; all circuits share ``pk``. Returns the
    proof bytes in order — each bit-identical to
    ``create_proof(params, pk, circuits[i], instances_list[i], rngs[i])``.
    """
    assert len(circuits) == len(instances_list) == len(rngs)
    if not circuits:
        return []
    engine = _batch_engine(engine)
    vk = pk.vk
    cs: ConstraintSystem = vk.cs
    domain = vk.domain
    n = params.n
    usable = cs.usable_rows(n)
    schedule = ProofSchedule.build(cs)
    trace = _config().trace_prover
    t0 = time.time()

    def mark(name):
        nonlocal t0
        if trace:
            now = time.time()
            print(f"[batch-prover] {name}: {now - t0:.2f}s", flush=True)
            t0 = now
        else:
            t0 = time.time()

    # engine overrides for the batched commit calls: the device tier packs
    # many columns per dispatch; the host tier is the native C++ Pippenger
    commit_engine = engine
    commit_chunk = _config().batch_chunk if engine == "device" else None

    states = [_ProofState() for _ in circuits]
    fixed_values = pk.fixed_values
    fixed_polys = pk.fixed_polys

    # --- phase 0: transcripts + instance columns ---------------------------
    all_instance_cols: list = []
    for s, instances in zip(states, instances_list):
        s.transcript = TranscriptWrite(VESTA)
        s.transcript.common_scalar(vk.digest)
        s.instance_values = []
        for ci in range(cs.num_instance):
            vals = list(instances[ci]) if ci < len(instances) else []
            assert len(vals) <= usable
            s.instance_values.append([v % P for v in vals] + [0] * (n - len(vals)))
        all_instance_cols.extend(s.instance_values)
    for s, rng in zip(states, rngs):
        s.rng = rng

    if all_instance_cols:
        polys, points = commit_lagrange_many(
            params,
            domain,
            all_instance_cols,
            [0] * len(all_instance_cols),
            engine=commit_engine,
            chunk=commit_chunk,
        )
        off = 0
        for s in states:
            k = len(s.instance_values)
            s.instance_polys = [_wrap_native(p) for p in polys[off : off + k]]
            for point in points[off : off + k]:
                s.transcript.common_point(point)
            off += k
    else:
        for s in states:
            s.instance_polys = []
    mark("instance commit")

    # --- phase 1: witness synthesis + advice commits -----------------------
    circuit_config = _configure_cached(cs, circuits[0])
    all_advice_cols: list = []
    all_advice_blinds: list = []
    for s, circuit in zip(states, circuits):
        assignment = Assignment(cs, n)
        layouter = Layouter(assignment)
        circuit.synthesize(circuit_config, layouter)
        layouter.finalize()
        s.advice_values = []
        for col in assignment.advice:
            vals = [0 if v is None else v % P for v in col]
            for row in range(usable, n):
                vals[row] = FP.random(s.rng)
            s.advice_values.append(vals)
        s.advice_blinds = [FP.random(s.rng) for _ in s.advice_values]
        all_advice_cols.extend(s.advice_values)
        all_advice_blinds.extend(s.advice_blinds)
    mark("witness synthesis")

    polys, points = commit_lagrange_many(
        params, domain, all_advice_cols, all_advice_blinds,
        engine=commit_engine, chunk=commit_chunk,
    )
    off = 0
    for s in states:
        k = len(s.advice_values)
        s.advice_polys = [_wrap_native(p) for p in polys[off : off + k]]
        for point in points[off : off + k]:
            s.transcript.write_point(point)
        off += k
        s.theta = s.transcript.squeeze_challenge()
    mark("advice commit")

    # --- phase 2: lookups compress + permute -------------------------------
    all_lookup_cols: list = []
    all_lookup_blinds: list = []
    for s in states:
        def lagrange_matrix(column, s=s):
            if column.kind == ColumnType.ADVICE:
                return _obj_array(s.advice_values[column.index])
            if column.kind == ColumnType.FIXED:
                return _obj_array(fixed_values[column.index])
            return _obj_array(s.instance_values[column.index])

        s.lookups = []
        for lk in cs.lookups:
            def eval_lagrange_expr(expr, lm=lagrange_matrix):
                return evaluate_expression(
                    cs,
                    expr,
                    cell_fn=lambda col, rot: np.roll(lm(col), -rot),
                    selector_as_fixed_fn=lambda idx: _obj_array(fixed_values[idx]),
                )

            a_comp = np.zeros(n, dtype=object)
            s_comp = np.zeros(n, dtype=object)
            for i_expr, t_expr in lk.mapping:
                a_comp = (a_comp * s.theta + eval_lagrange_expr(i_expr)) % P
                s_comp = (s_comp * s.theta + eval_lagrange_expr(t_expr)) % P
            a_act = [int(v) for v in a_comp[:usable]]
            s_act = [int(v) for v in s_comp[:usable]]
            a_perm, s_perm = permute_lookup_inputs(a_act, s_act)
            tail = [FP.random(s.rng) for _ in range(n - usable)]
            tail2 = [FP.random(s.rng) for _ in range(n - usable)]
            s.lookups.append(
                {
                    "a_compressed": [int(v) for v in a_comp],
                    "s_compressed": [int(v) for v in s_comp],
                    "a_perm": a_perm + tail,
                    "s_perm": s_perm + tail2,
                }
            )
        if s.lookups:
            blinds = [FP.random(s.rng) for _ in range(2 * len(s.lookups))]
            all_lookup_cols.extend(
                v for lk in s.lookups for v in (lk["a_perm"], lk["s_perm"])
            )
            all_lookup_blinds.extend(blinds)
    mark("lookup permute")

    if all_lookup_cols:
        flat, points = commit_lagrange_many(
            params, domain, all_lookup_cols, all_lookup_blinds,
            engine=commit_engine, chunk=commit_chunk,
        )
        off = 0
        for s in states:
            s.lookup_perm_polys = []
            for i in range(len(s.lookups)):
                a_poly = _wrap_native(flat[off + 2 * i])
                s_poly = _wrap_native(flat[off + 2 * i + 1])
                s.transcript.write_point(points[off + 2 * i])
                s.transcript.write_point(points[off + 2 * i + 1])
                s.lookup_perm_polys.append(
                    (
                        a_poly,
                        all_lookup_blinds[off + 2 * i],
                        s_poly,
                        all_lookup_blinds[off + 2 * i + 1],
                    )
                )
            off += 2 * len(s.lookups)
            s.beta = s.transcript.squeeze_challenge()
            s.gamma = s.transcript.squeeze_challenge()
    else:
        for s in states:
            s.lookup_perm_polys = []
            s.beta = s.transcript.squeeze_challenge()
            s.gamma = s.transcript.squeeze_challenge()
    mark("lookup commit")

    # --- phase 3: grand products + random poly -----------------------------
    perm = vk.permutation
    chunk_len = schedule.chunk_len
    chunk_cols = [perm.columns[i : i + chunk_len] for i in range(0, len(perm.columns), chunk_len)]
    chunk_sigmas = [perm.sigmas[i : i + chunk_len] for i in range(0, len(perm.sigmas), chunk_len)]
    omega = domain.omega
    w_pows = np.empty(usable, dtype=object)
    acc_w = 1
    for i in range(usable):
        w_pows[i] = acc_w
        acc_w = acc_w * omega % P

    all_z_cols: list = []
    all_z_blinds: list = []
    all_random_polys: list = []
    all_random_blinds: list = []
    for s in states:
        s.perm_z_values = []
        carry = 1
        for cols, sigmas in zip(chunk_cols, chunk_sigmas):
            col_offsets = [perm.columns.index(c) for c in cols]
            nums = np.ones(usable, dtype=object)
            dens = np.ones(usable, dtype=object)
            for c_idx, col in enumerate(cols):
                if col.kind == ColumnType.ADVICE:
                    vals = s.advice_values[col.index]
                elif col.kind == ColumnType.FIXED:
                    vals = fixed_values[col.index]
                else:
                    vals = s.instance_values[col.index]
                v = _obj_array(vals[:usable])
                j = col_offsets[c_idx]
                delta_beta = s.beta * pow(DELTA, j, P) % P
                sig = _obj_array(sigmas[c_idx][:usable])
                nums = nums * ((v + delta_beta * w_pows + s.gamma) % P) % P
                dens = dens * ((v + s.beta * sig + s.gamma) % P) % P
            z = [0] * n
            z[: usable + 1] = _grand_product_prefix(nums, dens, carry)
            carry = z[usable]
            for row in range(usable + 1, n):
                z[row] = FP.random(s.rng)
            s.perm_z_values.append(z)
        s.perm_z_blinds = [FP.random(s.rng) for _ in s.perm_z_values]

        s._lookup_z_values = []
        for lk in s.lookups:
            a_c = _obj_array(lk["a_compressed"][:usable])
            s_c = _obj_array(lk["s_compressed"][:usable])
            a_p = _obj_array(lk["a_perm"][:usable])
            s_p = _obj_array(lk["s_perm"][:usable])
            nums = (a_c + s.beta) * (s_c + s.gamma) % P
            dens = (a_p + s.beta) * (s_p + s.gamma) % P
            z = [0] * n
            z[: usable + 1] = _grand_product_prefix(nums, dens, 1)
            for row in range(usable + 1, n):
                z[row] = FP.random(s.rng)
            lk["z_values"] = z
            s._lookup_z_values.append(z)
        s._lookup_z_blinds = [FP.random(s.rng) for _ in s._lookup_z_values]

        s.random_poly = [FP.random(s.rng) for _ in range(n)]
        s.random_blind = FP.random(s.rng)

        all_z_cols.extend(s.perm_z_values)
        all_z_blinds.extend(s.perm_z_blinds)
        all_z_cols.extend(s._lookup_z_values)
        all_z_blinds.extend(s._lookup_z_blinds)
        all_random_polys.append(s.random_poly)
        all_random_blinds.append(s.random_blind)
    mark("grand products")

    z_polys, z_points = (
        commit_lagrange_many(
            params, domain, all_z_cols, all_z_blinds,
            engine=commit_engine, chunk=commit_chunk,
        )
        if all_z_cols
        else ([], [])
    )
    random_points = commit_many(
        params, all_random_polys, all_random_blinds,
        engine=commit_engine, chunk=commit_chunk,
    )
    off = 0
    for si, s in enumerate(states):
        k_perm = len(s.perm_z_values)
        s.perm_z_polys = [_wrap_native(p) for p in z_polys[off : off + k_perm]]
        for point in z_points[off : off + k_perm]:
            s.transcript.write_point(point)
        off += k_perm
        k_lk = len(s._lookup_z_values)
        s.lookup_z_polys = []
        for i in range(k_lk):
            s.transcript.write_point(z_points[off + i])
            s.lookup_z_polys.append(
                (_wrap_native(z_polys[off + i]), s._lookup_z_blinds[i])
            )
        off += k_lk
        s.transcript.write_point(random_points[si])
        s.y = s.transcript.squeeze_challenge()
    mark("z commit")

    # --- phase 4: quotients -------------------------------------------------
    def polys_by_key(s):
        out = {}
        for i, poly in enumerate(s.advice_polys):
            out[("advice", i)] = poly
        for i, poly in enumerate(fixed_polys):
            out[("fixed", i)] = poly
        for i, poly in enumerate(s.instance_polys):
            out[("instance", i)] = poly
        for i, poly in enumerate(s.perm_z_polys):
            out[("perm_z", i)] = poly
        for i, poly in enumerate(perm.sigma_polys):
            out[("sigma", i)] = poly
        for i, (a_poly, _, s_poly, _) in enumerate(s.lookup_perm_polys):
            out[("lk_a", i)] = a_poly
            out[("lk_s", i)] = s_poly
        for i, (z_poly, _) in enumerate(s.lookup_z_polys):
            out[("lk_z", i)] = z_poly
        return out

    if engine == "device":
        evaluator = _get_batch_quotient_evaluator(vk, schedule)
        qchunk = _config().batch_quotient_chunk
        h_all = []
        for start in range(0, len(states), qchunk):
            group = states[start : start + qchunk]
            h_all.extend(
                evaluator(
                    [polys_by_key(s) for s in group],
                    [(s.theta, s.beta, s.gamma, s.y) for s in group],
                )
            )
        for s, h in zip(states, h_all):
            s.h_coeffs = h
    else:
        from .prover import _get_native_quotient_evaluator

        evaluator = _get_native_quotient_evaluator(vk, schedule)
        for s in states:
            s.h_coeffs = evaluator(polys_by_key(s), (s.theta, s.beta, s.gamma, s.y))
    mark("quotient")

    num_pieces = domain.extended_n // n
    all_h_pieces: list = []
    all_h_blinds: list = []
    for s in states:
        s.h_pieces = [s.h_coeffs[i * n : (i + 1) * n] for i in range(num_pieces)]
        s.h_blinds = [FP.random(s.rng) for _ in s.h_pieces]
        all_h_pieces.extend(s.h_pieces)
        all_h_blinds.extend(s.h_blinds)
    h_points = commit_many(
        params, all_h_pieces, all_h_blinds, engine=commit_engine, chunk=commit_chunk
    )
    off = 0
    for s in states:
        for point in h_points[off : off + num_pieces]:
            s.transcript.write_point(point)
        off += num_pieces
        s.x = s.transcript.squeeze_challenge()
    mark("h commit")

    # --- phase 5+6: evaluations + multiopen + IPA (per proof, native) ------
    # fixed/sigma polys are pk constants shared by every proof: wrap them
    # ONCE so the tail's Horner evals ride the native bytes path. Grouping
    # in multiopen is by object identity, so the shared wrapped objects
    # reproduce the sequential prover's grouping exactly.
    fixed_wrapped = getattr(pk, "_fixed_wrapped", None)
    if fixed_wrapped is None:
        fixed_wrapped = [_wrap_native(p) for p in fixed_polys]
        pk._fixed_wrapped = fixed_wrapped
    sigma_wrapped = getattr(pk, "_sigma_wrapped", None)
    if sigma_wrapped is None:
        sigma_wrapped = [_wrap_native(p) for p in perm.sigma_polys]
        pk._sigma_wrapped = sigma_wrapped

    def tail(s):
        _proof_tail(params, vk, schedule, s, usable, fixed_wrapped, sigma_wrapped)
        return s.transcript.finalize()

    workers = _config().batch_tail_workers
    if workers > 1 and len(states) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=workers) as pool:
            proofs = list(pool.map(tail, states))
    else:
        proofs = [tail(s) for s in states]
    mark("evals+multiopen+ipa")
    return proofs


def _proof_tail(params, vk, schedule, s: _ProofState, usable: int, fixed_wrapped, sigma_wrapped):
    """Evaluations at x + multiopen + IPA for one proof — the code mirrors
    plonk/prover.py create_proof line for line (bit-identity contract)."""
    domain = vk.domain
    n = params.n
    x = s.x
    transcript = s.transcript

    def rot_point(rot):
        return domain.rotate_point(x, rot)

    instance_evals = {}
    for col, rot in schedule.instance_queries:
        instance_evals[(col, rot)] = eval_poly_coeffs(s.instance_polys[col], rot_point(rot))
        transcript.write_scalar(instance_evals[(col, rot)])
    advice_evals = {}
    for col, rot in schedule.advice_queries:
        advice_evals[(col, rot)] = eval_poly_coeffs(s.advice_polys[col], rot_point(rot))
        transcript.write_scalar(advice_evals[(col, rot)])
    fixed_evals = {}
    for col, rot in schedule.fixed_queries:
        fixed_evals[(col, rot)] = eval_poly_coeffs(fixed_wrapped[col], rot_point(rot))
        transcript.write_scalar(fixed_evals[(col, rot)])

    xn = pow(x, n, P)
    h_acc = np.zeros(n, dtype=object)
    h_blind_acc = 0
    for piece, pblind in zip(reversed(s.h_pieces), reversed(s.h_blinds)):
        arr = np.empty(len(piece), dtype=object)
        arr[:] = piece
        h_acc = h_acc * xn % P
        h_acc[: len(piece)] = (h_acc[: len(piece)] + arr) % P
        h_blind_acc = (h_blind_acc * xn + pblind) % P
    h_collapsed = [int(v) for v in h_acc]
    h_collapsed_eval = eval_poly_coeffs(h_collapsed, x)

    random_eval = eval_poly_coeffs(s.random_poly, x)
    transcript.write_scalar(random_eval)

    sigma_evals = [eval_poly_coeffs(p, x) for p in sigma_wrapped]
    for ev in sigma_evals:
        transcript.write_scalar(ev)
    x_next = rot_point(1)
    x_last_rot = domain.rotate_point(x, usable)
    perm_z_evals = []
    for c, poly in enumerate(s.perm_z_polys):
        z_x = eval_poly_coeffs(poly, x)
        z_wx = eval_poly_coeffs(poly, x_next)
        transcript.write_scalar(z_x)
        transcript.write_scalar(z_wx)
        entry = {"z": z_x, "z_next": z_wx}
        if c < len(s.perm_z_polys) - 1:
            entry["last"] = eval_poly_coeffs(poly, x_last_rot)
        perm_z_evals.append(entry)
    for c in range(len(s.perm_z_polys) - 2, -1, -1):
        transcript.write_scalar(perm_z_evals[c]["last"])

    x_prev = rot_point(-1)
    lookup_evals = []
    for (z_poly, _), (a_poly, _, s_poly, _) in zip(s.lookup_z_polys, s.lookup_perm_polys):
        ev = {
            "z": eval_poly_coeffs(z_poly, x),
            "z_next": eval_poly_coeffs(z_poly, x_next),
            "a_perm": eval_poly_coeffs(a_poly, x),
            "a_perm_prev": eval_poly_coeffs(a_poly, x_prev),
            "s_perm": eval_poly_coeffs(s_poly, x),
        }
        for key in ("z", "z_next", "a_perm", "a_perm_prev", "s_perm"):
            transcript.write_scalar(ev[key])
        lookup_evals.append(ev)

    queries: list[Query] = []
    for col, rot in schedule.instance_queries:
        queries.append(Query(s.instance_polys[col], 0, rot_point(rot), instance_evals[(col, rot)]))
    for col, rot in schedule.advice_queries:
        queries.append(
            Query(s.advice_polys[col], s.advice_blinds[col], rot_point(rot), advice_evals[(col, rot)])
        )
    for c, poly in enumerate(s.perm_z_polys):
        queries.append(Query(poly, s.perm_z_blinds[c], x, perm_z_evals[c]["z"]))
        queries.append(Query(poly, s.perm_z_blinds[c], x_next, perm_z_evals[c]["z_next"]))
    for c in range(len(s.perm_z_polys) - 2, -1, -1):
        queries.append(Query(s.perm_z_polys[c], s.perm_z_blinds[c], x_last_rot, perm_z_evals[c]["last"]))
    for (z_poly, z_blind), (a_poly, a_blind, s_poly, s_blind), ev in zip(
        s.lookup_z_polys, s.lookup_perm_polys, lookup_evals
    ):
        queries.append(Query(z_poly, z_blind, x, ev["z"]))
        queries.append(Query(a_poly, a_blind, x, ev["a_perm"]))
        queries.append(Query(s_poly, s_blind, x, ev["s_perm"]))
        queries.append(Query(a_poly, a_blind, x_prev, ev["a_perm_prev"]))
        queries.append(Query(z_poly, z_blind, x_next, ev["z_next"]))
    for col, rot in schedule.fixed_queries:
        queries.append(Query(fixed_wrapped[col], 0, rot_point(rot), fixed_evals[(col, rot)]))
    for j, poly in enumerate(sigma_wrapped):
        queries.append(Query(poly, 0, x, sigma_evals[j]))
    queries.append(Query(h_collapsed, h_blind_acc, x, h_collapsed_eval))
    queries.append(Query(s.random_poly, s.random_blind, x, random_eval))

    multiopen_prove(params, transcript, queries, s.rng)
