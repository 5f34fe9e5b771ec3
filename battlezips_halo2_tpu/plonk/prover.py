"""The PLONK prover: full proof pipeline.

Framework analog of ``halo2_proofs::plonk::create_proof``
(SURVEY.md §3.1): witness synthesis → blinded advice commitments → lookup
permute+product → permutation grand products (chunked) → vanishing argument
(quotient over the extended coset) → evaluations at the challenge point →
multiopen → final IPA argument.

Compute split (SURVEY.md §3.1 "process/device boundaries"): circuit
synthesis and protocol orchestration on host; NTTs, commitments and the
quotient (constraint evaluation + y-fold + Z_H division, compiled to one
bytecode program by ops/gate_eval.py) run on the engine selected by
ops/engine.use_host_engine — the batched device kernels above the latency
threshold, the native C++ runtime (csrc/pasta.cpp) below it. Both engines
produce bit-identical proofs. BZ_HOST_QUOTIENT=1 keeps the legacy
object-array quotient path for cross-checks.
"""

from __future__ import annotations

import os
import time

import numpy as np

from ..config import config as _config


import threading

_evaluator_lock = threading.Lock()


def _get_quotient_evaluator(vk, schedule):
    """One compiled evaluator per verifying key (cached on the vk); built
    under a lock so pipelined session workers don't compile it twice."""
    ev = getattr(vk, "_quotient_evaluator", None)
    if ev is None:
        with _evaluator_lock:
            ev = getattr(vk, "_quotient_evaluator", None)
            if ev is None:
                from ..ops.gate_eval import QuotientEvaluator

                ev = QuotientEvaluator(vk, schedule)
                vk._quotient_evaluator = ev
    return ev


def _get_native_quotient_evaluator(vk, schedule):
    """Latency-tier twin (ops/native_quotient.py): same bytecode, native
    C++ VM — cached on the vk like the device evaluator."""
    ev = getattr(vk, "_native_quotient_evaluator", None)
    if ev is None:
        with _evaluator_lock:
            ev = getattr(vk, "_native_quotient_evaluator", None)
            if ev is None:
                from ..ops.native_quotient import NativeQuotientEvaluator

                ev = NativeQuotientEvaluator(vk, schedule)
                vk._native_quotient_evaluator = ev
    return ev


class _Phase:
    """Span logger for the prover pipeline (SURVEY.md §5.1: per-phase
    commit/NTT/open timers; enable with BZ_TPU_TRACE=1)."""

    def __init__(self):
        self.t = time.time()

    def mark(self, name: str):
        if _config().trace_prover:
            now = time.time()
            print(f"[prover] {name}: {now - self.t:.2f}s", flush=True)
            self.t = now
        else:
            self.t = time.time()

from ..curves.host import VESTA
from ..fields.host import FP
from ..pcs.ipa import Params, commit, commit_lagrange_many, commit_many
from ..pcs.multiopen import Query, multiopen_prove
from ..poly.domain import eval_poly_coeffs
from ..poly.transforms import batch_coeff_to_extended, batch_lagrange_to_coeff
from .arguments import (
    ProofSchedule,
    _lagrange_basis_extended,
    evaluate_expression,
    lookup_terms,
    permutation_terms,
    permute_lookup_inputs,
)
from .assignment import Assignment, Layouter
from .circuit import ConstraintSystem
from .expression import ColumnType
from .keys import ProvingKey
from .transcript import TranscriptWrite

P = FP.modulus


def _obj_array(values: list[int]) -> np.ndarray:
    out = np.empty(len(values), dtype=object)
    for i, v in enumerate(values):
        out[i] = v % P
    return out


def _grand_product_prefix(nums, dens, carry: int) -> list[int]:
    """z[0]=carry, z[i+1]=z[i]*nums[i]/dens[i] over the usable rows —
    native C++ when available (one batch inversion + prefix, ~2 ms at
    k=12 vs ~100 ms of per-row Python ints, VERDICT r4 weak #6); the
    object-array path stays authoritative and is forced by
    BZ_PROOF_ENGINE=device (the independent-pipeline knob)."""
    from .. import native

    if _config().proof_engine != "device" and native.available():
        nb = native.ints_to_bytes_arr([int(v) for v in nums])
        db = native.ints_to_bytes_arr([int(v) for v in dens])
        out = native.grand_product(native.which_for(P), nb, db, carry % P)
        return native.bytes_arr_to_ints(out)
    den_inv = FP.batch_inv([int(v) for v in dens])
    z = [0] * (len(nums) + 1)
    z[0] = carry
    acc = carry
    for i in range(len(nums)):
        acc = acc * int(nums[i]) % P * den_inv[i] % P
        z[i + 1] = acc
    return z


class _ExtendedCtx:
    """Extended-coset evaluation context shared by all constraint terms."""

    def __init__(self, domain, usable: int):
        self.domain = domain
        self.ext = domain.extended_n
        self.rot_scale = self.ext // domain.n
        n = domain.n
        rows = [0, usable] + list(range(usable + 1, n))
        basis = _lagrange_basis_extended(domain, rows)
        self.l0 = basis[0]
        self.llast = basis[usable]
        blind_sum = np.zeros(self.ext, dtype=object)
        for i in range(usable + 1, n):
            blind_sum = (blind_sum + basis[i]) % P
        self.lactive = (1 - (self.llast + blind_sum) % P) % P
        xs = []
        acc = domain.g_coset
        for _ in range(self.ext):
            xs.append(acc)
            acc = acc * domain.extended_omega % P
        self.x_coords = _obj_array(xs)
        self.t_inv = _obj_array(FP.batch_inv(domain.t_extended()))

    def rotated(self, arr: np.ndarray, rotation: int) -> np.ndarray:
        return np.roll(arr, -rotation * self.rot_scale)


def create_proof(
    params: Params,
    pk: ProvingKey,
    circuit,
    instances: list[list[int]],
    rng,
) -> bytes:
    vk = pk.vk
    cs: ConstraintSystem = vk.cs
    domain = vk.domain
    n = params.n
    usable = cs.usable_rows(n)
    schedule = ProofSchedule.build(cs)
    phase = _Phase()
    transcript = TranscriptWrite(VESTA)
    transcript.common_scalar(vk.digest)

    # --- instance commitments (recomputed by the verifier) -----------------
    instance_values = []
    for ci in range(cs.num_instance):
        vals = list(instances[ci]) if ci < len(instances) else []
        assert len(vals) <= usable
        instance_values.append([v % P for v in vals] + [0] * (n - len(vals)))
    instance_polys, instance_points = (
        commit_lagrange_many(params, domain, instance_values, [0] * len(instance_values))
        if instance_values
        else ([], [])
    )
    for point in instance_points:
        transcript.common_point(point)

    phase.mark("instance")
    # --- witness synthesis + advice commitments ---------------------------
    assignment = Assignment(cs, n)
    layouter = Layouter(assignment)
    circuit.synthesize(_configure_cached(cs, circuit), layouter)
    layouter.finalize()

    advice_values = []
    for col in assignment.advice:
        vals = [0 if v is None else v % P for v in col]
        for row in range(usable, n):
            vals[row] = FP.random(rng)
        advice_values.append(vals)
    advice_blinds = [FP.random(rng) for _ in advice_values]
    advice_polys, advice_points = commit_lagrange_many(
        params, domain, advice_values, advice_blinds
    )
    for point in advice_points:
        transcript.write_point(point)

    phase.mark("advice synth+commit")
    fixed_values = pk.fixed_values
    fixed_polys = pk.fixed_polys

    def lagrange_matrix(column):
        if column.kind == ColumnType.ADVICE:
            return _obj_array(advice_values[column.index])
        if column.kind == ColumnType.FIXED:
            return _obj_array(fixed_values[column.index])
        return _obj_array(instance_values[column.index])

    # --- lookups: compress + permute --------------------------------------
    theta = transcript.squeeze_challenge()
    lookups = []
    for lk in cs.lookups:
        def eval_lagrange_expr(expr):
            return evaluate_expression(
                cs,
                expr,
                cell_fn=lambda col, rot: np.roll(lagrange_matrix(col), -rot),
                selector_as_fixed_fn=lambda idx: _obj_array(fixed_values[idx]),
            )

        a_comp = np.zeros(n, dtype=object)
        s_comp = np.zeros(n, dtype=object)
        for i_expr, t_expr in lk.mapping:
            a_comp = (a_comp * theta + eval_lagrange_expr(i_expr)) % P
            s_comp = (s_comp * theta + eval_lagrange_expr(t_expr)) % P
        a_act = [int(v) for v in a_comp[:usable]]
        s_act = [int(v) for v in s_comp[:usable]]
        a_perm, s_perm = permute_lookup_inputs(a_act, s_act)
        tail = [FP.random(rng) for _ in range(n - usable)]
        tail2 = [FP.random(rng) for _ in range(n - usable)]
        lookups.append(
            {
                "a_compressed": [int(v) for v in a_comp],
                "s_compressed": [int(v) for v in s_comp],
                "a_perm": a_perm + tail,
                "s_perm": s_perm + tail2,
            }
        )
    lookup_perm_polys = []
    if lookups:
        blinds = [FP.random(rng) for _ in range(2 * len(lookups))]
        flat, points = commit_lagrange_many(
            params, domain, [v for lk in lookups for v in (lk["a_perm"], lk["s_perm"])], blinds
        )
        for i in range(len(lookups)):
            transcript.write_point(points[2 * i])
            transcript.write_point(points[2 * i + 1])
            lookup_perm_polys.append((flat[2 * i], blinds[2 * i], flat[2 * i + 1], blinds[2 * i + 1]))

    phase.mark("lookups permute+commit")
    beta = transcript.squeeze_challenge()
    gamma = transcript.squeeze_challenge()

    # --- permutation grand products (chunked) -----------------------------
    perm = vk.permutation
    chunk_len = schedule.chunk_len
    chunk_cols = [perm.columns[i : i + chunk_len] for i in range(0, len(perm.columns), chunk_len)]
    chunk_sigmas = [perm.sigmas[i : i + chunk_len] for i in range(0, len(perm.sigmas), chunk_len)]
    from .keys import DELTA

    omega = domain.omega
    perm_z_values = []
    carry = 1  # chunks chain multiplicatively
    # vectorized over rows: numpy object arrays of exact ints (the per-row
    # Python double loop costed ~0.5s/proof at k=11)
    w_pows = np.empty(usable, dtype=object)
    acc_w = 1
    for i in range(usable):
        w_pows[i] = acc_w
        acc_w = acc_w * omega % P
    for cols, sigmas in zip(chunk_cols, chunk_sigmas):
        col_offsets = [perm.columns.index(c) for c in cols]
        nums = np.ones(usable, dtype=object)
        dens = np.ones(usable, dtype=object)
        for c_idx, col in enumerate(cols):
            if col.kind == ColumnType.ADVICE:
                vals = advice_values[col.index]
            elif col.kind == ColumnType.FIXED:
                vals = fixed_values[col.index]
            else:
                vals = instance_values[col.index]
            v = _obj_array(vals[:usable])
            j = col_offsets[c_idx]
            delta_beta = beta * pow(DELTA, j, P) % P
            sig = _obj_array(sigmas[c_idx][:usable])
            nums = nums * ((v + delta_beta * w_pows + gamma) % P) % P
            dens = dens * ((v + beta * sig + gamma) % P) % P
        z = [0] * n
        z[: usable + 1] = _grand_product_prefix(nums, dens, carry)
        carry = z[usable]
        for row in range(usable + 1, n):
            z[row] = FP.random(rng)
        perm_z_values.append(z)
    perm_z_blinds = [FP.random(rng) for _ in perm_z_values]
    perm_z_polys, perm_z_points = (
        commit_lagrange_many(params, domain, perm_z_values, perm_z_blinds)
        if perm_z_values
        else ([], [])
    )
    for point in perm_z_points:
        transcript.write_point(point)

    phase.mark("permutation z")
    # --- lookup grand products --------------------------------------------
    lookup_z_polys = []
    for lk in lookups:
        a_c = _obj_array(lk["a_compressed"][:usable])
        s_c = _obj_array(lk["s_compressed"][:usable])
        a_p = _obj_array(lk["a_perm"][:usable])
        s_p = _obj_array(lk["s_perm"][:usable])
        nums = (a_c + beta) * (s_c + gamma) % P
        dens = (a_p + beta) * (s_p + gamma) % P
        z = [0] * n
        z[: usable + 1] = _grand_product_prefix(nums, dens, 1)
        for row in range(usable + 1, n):
            z[row] = FP.random(rng)
        lk["z_values"] = z
        lookup_z_polys.append(z)
    if lookup_z_polys:
        zb = [FP.random(rng) for _ in lookup_z_polys]
        zp, zpoints = commit_lagrange_many(params, domain, lookup_z_polys, zb)
        for point in zpoints:
            transcript.write_point(point)
        lookup_z_polys = list(zip(zp, zb))

    phase.mark("lookup z")
    # --- vanishing argument ------------------------------------------------
    random_poly = [FP.random(rng) for _ in range(n)]
    random_blind = FP.random(rng)
    transcript.write_point(commit(params, random_poly, random_blind))
    y = transcript.squeeze_challenge()

    # --- quotient over the extended coset ----------------------------------
    if _config().host_quotient:
        ctx = _ExtendedCtx(domain, usable)
        phase.mark("extended ctx (lagrange basis)")

        to_extend: list[list[int]] = []
        ext_index: dict = {}

        def register(key, poly):
            if key not in ext_index:
                ext_index[key] = len(to_extend)
                to_extend.append(poly)

        for i, poly in enumerate(advice_polys):
            register(("advice", i), poly)
        for i, poly in enumerate(fixed_polys):
            register(("fixed", i), poly)
        for i, poly in enumerate(instance_polys):
            register(("instance", i), poly)
        for i, poly in enumerate(perm_z_polys):
            register(("perm_z", i), poly)
        for i, poly in enumerate(perm.sigma_polys):
            register(("sigma", i), poly)
        for i, (a_poly, _, s_poly, _) in enumerate(lookup_perm_polys):
            register(("lk_a", i), a_poly)
            register(("lk_s", i), s_poly)
        for i, (z_poly, _) in enumerate(lookup_z_polys):
            register(("lk_z", i), z_poly)

        phase.mark("gather polys")
        extended = batch_coeff_to_extended(domain, to_extend)
        ext_arrays = {key: _obj_array(extended[idx]) for key, idx in ext_index.items()}
        phase.mark("extended NTTs")

        def ext_cell(column, rot):
            if column.kind == ColumnType.ADVICE:
                return ctx.rotated(ext_arrays[("advice", column.index)], rot)
            if column.kind == ColumnType.FIXED:
                return ctx.rotated(ext_arrays[("fixed", column.index)], rot)
            return ctx.rotated(ext_arrays[("instance", column.index)], rot)

        terms = []
        for gate in cs.gates:
            for _, poly in gate.constraints:
                terms.append(
                    evaluate_expression(
                        cs,
                        poly,
                        cell_fn=ext_cell,
                        selector_as_fixed_fn=lambda idx: ext_arrays[("fixed", idx)],
                    )
                )

        # permutation terms
        chunks_data = []
        for c, (cols, sigmas) in enumerate(zip(chunk_cols, chunk_sigmas)):
            entry = {
                "z": ext_arrays[("perm_z", c)],
                "z_next": ctx.rotated(ext_arrays[("perm_z", c)], 1),
                "prev_last": ctx.rotated(ext_arrays[("perm_z", c - 1)], usable) if c > 0 else None,
                "cols": [],
            }
            for c_idx, col in enumerate(cols):
                j = perm.columns.index(col)
                key = (col.kind.value, col.index)
                if col.kind == ColumnType.ADVICE:
                    v = ext_arrays[("advice", col.index)]
                elif col.kind == ColumnType.FIXED:
                    v = ext_arrays[("fixed", col.index)]
                else:
                    v = ext_arrays[("instance", col.index)]
                entry["cols"].append((v, ext_arrays[("sigma", j)], j))
            chunks_data.append(entry)
        if chunks_data:
            terms += permutation_terms(chunks_data, ctx.l0, ctx.llast, ctx.lactive, beta, gamma, ctx.x_coords)

        # lookup terms: compressed expressions evaluated over the extended coset
        for li, lk_def in enumerate(cs.lookups):
            a_comp_ext = np.zeros(ctx.ext, dtype=object)
            s_comp_ext = np.zeros(ctx.ext, dtype=object)
            for i_expr, t_expr in lk_def.mapping:
                a_comp_ext = (
                    a_comp_ext * theta
                    + evaluate_expression(
                        cs, i_expr, cell_fn=ext_cell, selector_as_fixed_fn=lambda idx: ext_arrays[("fixed", idx)]
                    )
                ) % P
                s_comp_ext = (
                    s_comp_ext * theta
                    + evaluate_expression(
                        cs, t_expr, cell_fn=ext_cell, selector_as_fixed_fn=lambda idx: ext_arrays[("fixed", idx)]
                    )
                ) % P
            lk_data = {
                "z": ext_arrays[("lk_z", li)],
                "z_next": ctx.rotated(ext_arrays[("lk_z", li)], 1),
                "a_compressed": a_comp_ext,
                "s_compressed": s_comp_ext,
                "a_perm": ext_arrays[("lk_a", li)],
                "a_perm_prev": ctx.rotated(ext_arrays[("lk_a", li)], -1),
                "s_perm": ext_arrays[("lk_s", li)],
            }
            terms += lookup_terms(lk_data, ctx.l0, ctx.llast, ctx.lactive, beta, gamma)

        phase.mark("constraint terms")
        agg = np.zeros(ctx.ext, dtype=object)
        for term in terms:
            agg = (agg * y + term) % P
        h_ext = agg * ctx.t_inv % P

        phase.mark("y-fold + divide")
        from ..poly.transforms import batch_extended_to_coeff

        h_coeffs = batch_extended_to_coeff(domain, [[int(v) for v in h_ext]])[0]
    else:
        # VM path: ONE program evaluates every constraint over the extended
        # coset, folds with y, divides by Z_H and returns the quotient
        # coefficients. The instruction stream is shared; the executor is
        # the device scan (ops/gate_eval.py) or, below the latency
        # threshold, the native C++ row-blocked VM (ops/native_quotient.py)
        from ..ops.engine import use_host_engine

        if use_host_engine(domain.n):
            evaluator = _get_native_quotient_evaluator(vk, schedule)
        else:
            evaluator = _get_quotient_evaluator(vk, schedule)
        polys_by_key = {}
        for i, poly in enumerate(advice_polys):
            polys_by_key[("advice", i)] = poly
        for i, poly in enumerate(fixed_polys):
            polys_by_key[("fixed", i)] = poly
        for i, poly in enumerate(instance_polys):
            polys_by_key[("instance", i)] = poly
        for i, poly in enumerate(perm_z_polys):
            polys_by_key[("perm_z", i)] = poly
        for i, poly in enumerate(perm.sigma_polys):
            polys_by_key[("sigma", i)] = poly
        for i, (a_poly, _, s_poly, _) in enumerate(lookup_perm_polys):
            polys_by_key[("lk_a", i)] = a_poly
            polys_by_key[("lk_s", i)] = s_poly
        for i, (z_poly, _) in enumerate(lookup_z_polys):
            polys_by_key[("lk_z", i)] = z_poly
        h_coeffs = evaluator(polys_by_key, (theta, beta, gamma, y))
    phase.mark("quotient")
    num_pieces = domain.extended_n // n
    h_pieces = [h_coeffs[i * n : (i + 1) * n] for i in range(num_pieces)]
    h_blinds = [FP.random(rng) for _ in h_pieces]
    for point in commit_many(params, h_pieces, h_blinds):
        transcript.write_point(point)

    phase.mark("h commit")
    x = transcript.squeeze_challenge()

    # --- evaluations (halo2 0.2.0 write order: instance, advice, fixed,
    # vanishing random_eval, sigmas, permutation z sets, lookups) -----------
    def rot_point(rot):
        return domain.rotate_point(x, rot)

    instance_evals = {}
    for col, rot in schedule.instance_queries:
        instance_evals[(col, rot)] = eval_poly_coeffs(instance_polys[col], rot_point(rot))
        transcript.write_scalar(instance_evals[(col, rot)])
    advice_evals = {}
    for col, rot in schedule.advice_queries:
        advice_evals[(col, rot)] = eval_poly_coeffs(advice_polys[col], rot_point(rot))
        transcript.write_scalar(advice_evals[(col, rot)])
    fixed_evals = {}
    for col, rot in schedule.fixed_queries:
        fixed_evals[(col, rot)] = eval_poly_coeffs(fixed_polys[col], rot_point(rot))
        transcript.write_scalar(fixed_evals[(col, rot)])

    # vanishing argument, part 2 (halo2 vanishing/prover.rs evaluate): the h
    # pieces collapse by x^n into ONE polynomial opened at x; no h evals are
    # written — the verifier derives the expected h(x) from the identity
    xn = pow(x, n, P)
    h_acc = np.zeros(n, dtype=object)
    h_blind_acc = 0
    for piece, pblind in zip(reversed(h_pieces), reversed(h_blinds)):
        arr = np.empty(len(piece), dtype=object)
        arr[:] = piece
        h_acc = h_acc * xn % P
        h_acc[: len(piece)] = (h_acc[: len(piece)] + arr) % P
        h_blind_acc = (h_blind_acc * xn + pblind) % P
    h_collapsed = [int(v) for v in h_acc]
    h_collapsed_eval = eval_poly_coeffs(h_collapsed, x)

    random_eval = eval_poly_coeffs(random_poly, x)
    transcript.write_scalar(random_eval)

    sigma_evals = [eval_poly_coeffs(p, x) for p in perm.sigma_polys]
    for ev in sigma_evals:
        transcript.write_scalar(ev)
    x_next = rot_point(1)
    x_last_rot = domain.rotate_point(x, usable)
    perm_z_evals = []
    for c, poly in enumerate(perm_z_polys):
        z_x = eval_poly_coeffs(poly, x)
        z_wx = eval_poly_coeffs(poly, x_next)
        transcript.write_scalar(z_x)
        transcript.write_scalar(z_wx)
        entry = {"z": z_x, "z_next": z_wx}
        if c < len(perm_z_polys) - 1:
            entry["last"] = eval_poly_coeffs(poly, x_last_rot)
        perm_z_evals.append(entry)
    # halo2 permutation/prover.rs: the ω^(-(b+1))x evals come AFTER all the
    # (z@x, z@ωx) pairs, in REVERSE set order skipping the final set
    for c in range(len(perm_z_polys) - 2, -1, -1):
        transcript.write_scalar(perm_z_evals[c]["last"])

    x_prev = rot_point(-1)
    lookup_evals = []
    for (z_poly, _), (a_poly, _, s_poly, _) in zip(lookup_z_polys, lookup_perm_polys):
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

    phase.mark("evaluations")
    # --- multiopen + IPA (halo2 prover.rs open order: instance, advice,
    # permutation sets, lookups, then fixed, sigmas, vanishing h+random) ----
    queries: list[Query] = []
    for col, rot in schedule.instance_queries:
        queries.append(Query(instance_polys[col], 0, rot_point(rot), instance_evals[(col, rot)]))
    for col, rot in schedule.advice_queries:
        queries.append(Query(advice_polys[col], advice_blinds[col], rot_point(rot), advice_evals[(col, rot)]))
    for c, poly in enumerate(perm_z_polys):
        queries.append(Query(poly, perm_z_blinds[c], x, perm_z_evals[c]["z"]))
        queries.append(Query(poly, perm_z_blinds[c], x_next, perm_z_evals[c]["z_next"]))
    for c in range(len(perm_z_polys) - 2, -1, -1):
        queries.append(Query(perm_z_polys[c], perm_z_blinds[c], x_last_rot, perm_z_evals[c]["last"]))
    # lookup open order (halo2 lookup/prover.rs): z@x, a'@x, s'@x, a'@ω⁻¹x, z@ωx
    for (z_poly, z_blind), (a_poly, a_blind, s_poly, s_blind), ev in zip(
        lookup_z_polys, lookup_perm_polys, lookup_evals
    ):
        queries.append(Query(z_poly, z_blind, x, ev["z"]))
        queries.append(Query(a_poly, a_blind, x, ev["a_perm"]))
        queries.append(Query(s_poly, s_blind, x, ev["s_perm"]))
        queries.append(Query(a_poly, a_blind, x_prev, ev["a_perm_prev"]))
        queries.append(Query(z_poly, z_blind, x_next, ev["z_next"]))
    for col, rot in schedule.fixed_queries:
        queries.append(Query(fixed_polys[col], 0, rot_point(rot), fixed_evals[(col, rot)]))
    for j, poly in enumerate(perm.sigma_polys):
        queries.append(Query(poly, 0, x, sigma_evals[j]))
    queries.append(Query(h_collapsed, h_blind_acc, x, h_collapsed_eval))
    queries.append(Query(random_poly, random_blind, x, random_eval))

    phase.mark("query build")
    multiopen_prove(params, transcript, queries, rng)
    phase.mark("multiopen+ipa")
    return transcript.finalize()


def _col_value(col, row, advice_values, fixed_values, instance_values):
    if col.kind == ColumnType.ADVICE:
        return advice_values[col.index][row]
    if col.kind == ColumnType.FIXED:
        return fixed_values[col.index][row]
    return instance_values[col.index][row]


_config_cache: dict = {}


def _configure_cached(cs: ConstraintSystem, circuit):
    """The prover must synthesize against the SAME ConstraintSystem the pk
    was built with; re-run configure on a throwaway CS to get a config object
    bound to equivalent columns (deterministic configure makes them match).
    Keyed by circuit type alone: configure() is a pure function of the type,
    and keying by id(cs) would risk stale hits after the id is recycled."""
    key = type(circuit)
    if key not in _config_cache:
        probe = ConstraintSystem()
        config = key.configure(probe)
        _config_cache[key] = config
    return _config_cache[key]
