"""Device-side quotient (gate/permutation/lookup) evaluation.

The prover's heaviest phase — evaluating every constraint polynomial over
the extended coset and folding with y — compiled into ONE jitted device
program per proving key.

The constraint math is **emitted as bytecode** (`_VMEmitter`): the gate /
permutation / lookup formulas are walked once at build time into a static
instruction stream of field ops (mul/add/sub) over a register file of
(ext, 16)-limb Montgomery vectors, and the device program executes it as a
single ``lax.scan`` whose body holds ONE instance of each field op
(dispatched with ``lax.switch``). The alternative — inlining the ~2000
field ops of a real circuit's constraints into the graph — compiles for
10-20 minutes per (circuit, platform) and holds every intermediate live;
the VM compiles in seconds and caps live memory at the register file.

* inputs (extended column polys, rotations, challenges, constants) are
  bound to pinned registers at run time; temporaries are register-allocated
  with a free list at emission time (in-place reuse via scan-carry
  donation);
* l_0 / l_last / l_active, the coset coordinates and 1/Z_H are baked-in
  constants; challenges (theta, beta, gamma, y) are traced inputs so the
  compiled program is reused across proofs;
* the division by Z_H and the extended iNTT + coset unscale happen in the
  same program — input: plain-limb column batch, output: plain-limb h
  coefficients.

Exact-arithmetic note: all ops are exact field ops, and the emission
follows the same formula/fold order as the host path (plonk/arguments.py),
so results are bit-identical to the host quotient (cross-checked by
BZ_HOST_QUOTIENT=1 and tests/test_prover.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import limb as L
from ..fields.host import FP
from ..fields.limb import FP_SPEC, ints_to_limbs
from ..plonk.arguments import ProofSchedule
from ..plonk.expression import ColumnType
from ..plonk.keys import DELTA, selector_column_index
from . import ntt as D

P = FP.modulus

OP_MUL, OP_ADD, OP_SUB = 0, 1, 2


class _Handle:
    __slots__ = ("kind", "id", "kept")

    def __init__(self, kind: str, hid: int, kept: bool = False):
        self.kind = kind  # "agg" | "pin" | "temp"
        self.id = hid
        self.kept = kept


class _VMEmitter:
    """Records field-op instructions over register handles.

    Temp registers are freed the first time they are consumed (expression
    trees use each intermediate exactly once); call ``keep(h)`` for the
    rare value used more than once and ``drop(h)`` when done with it."""

    def __init__(self):
        self.pins: dict = {}
        self.pin_keys: list = []
        self.prog: list = []  # (op, handle, handle, dst_handle-snapshot)
        self._free: list = []
        self._next_temp = 0

    # --- pinned inputs ----------------------------------------------------
    def _pin(self, key) -> _Handle:
        if key not in self.pins:
            self.pins[key] = len(self.pin_keys)
            self.pin_keys.append(key)
        return _Handle("pin", self.pins[key])

    def inp(self, kind: str, index: int, rot: int = 0) -> _Handle:
        return self._pin(("inp", kind, index, rot))

    def const_int(self, v: int) -> _Handle:
        return self._pin(("const", v % P))

    def chal(self, name: str) -> _Handle:
        return self._pin(("chal", name))

    def named(self, name: str) -> _Handle:
        return self._pin(("named", name))

    def agg(self) -> _Handle:
        return _Handle("agg", 0)

    # --- ops --------------------------------------------------------------
    def _alloc(self) -> int:
        if self._free:
            return self._free.pop()
        t = self._next_temp
        self._next_temp += 1
        return t

    def _release(self, h: _Handle):
        if h.kind == "temp" and not h.kept:
            self._free.append(h.id)

    def _emit(self, op: int, a: _Handle, b: _Handle) -> _Handle:
        self._release(a)
        if b is not a:
            self._release(b)
        dst = _Handle("temp", self._alloc())
        self.prog.append((op, (a.kind, a.id), (b.kind, b.id), (dst.kind, dst.id)))
        return dst

    def mul(self, a, b):
        return self._emit(OP_MUL, a, b)

    def add(self, a, b):
        return self._emit(OP_ADD, a, b)

    def sub(self, a, b):
        return self._emit(OP_SUB, a, b)

    def neg(self, a):
        return self._emit(OP_SUB, self.const_int(0), a)

    def keep(self, h: _Handle) -> _Handle:
        h.kept = True
        return h

    def drop(self, h: _Handle):
        if h.kind == "temp":
            h.kept = False
            self._free.append(h.id)

    def fold_term(self, t: _Handle):
        """agg = agg * y + t (t consumed)."""
        a = self.agg()
        self.prog.append((OP_MUL, ("agg", 0), ("pin", self.pins[("chal", "y")]), ("agg", 0)))
        self._release(t)
        self.prog.append((OP_ADD, ("agg", 0), (t.kind, t.id), ("agg", 0)))

    # --- finalize ---------------------------------------------------------
    def finalize(self) -> tuple[np.ndarray, list, int]:
        """-> ((I, 4) int32 program, pin keys, total registers).
        Register layout: [0]=agg, [1..n_pins]=pins, then temps."""
        n_pins = len(self.pin_keys)

        def reg(kind, hid):
            if kind == "agg":
                return 0
            if kind == "pin":
                return 1 + hid
            return 1 + n_pins + hid

        prog = np.array(
            [(op, reg(*a), reg(*b), reg(*d)) for op, a, b, d in self.prog],
            dtype=np.int32,
        )
        return prog, self.pin_keys, 1 + n_pins + self._next_temp


def quotient_poly_keys(cs, num_perm_chunks: int):
    """Canonical ordering of every polynomial the quotient evaluation reads;
    the prover stacks its coefficient polys in exactly this order."""
    keys = []
    keys += [("advice", i) for i in range(cs.num_advice)]
    from ..plonk.keys import num_fixed_total

    keys += [("fixed", i) for i in range(num_fixed_total(cs))]
    keys += [("instance", i) for i in range(cs.num_instance)]
    keys += [("perm_z", i) for i in range(num_perm_chunks)]
    keys += [("sigma", i) for i in range(len(cs.equality_columns))]
    for i in range(len(cs.lookups)):
        keys += [("lk_a", i), ("lk_s", i), ("lk_z", i)]
    return keys


def _emit_constraints(em: _VMEmitter, cs, usable: int, chunk_meta, lookups, gates):
    """Walk every constraint term through the emitter, folding with y in the
    SAME order as the host path (plonk/arguments.py) so the quotient is
    bit-identical."""

    def eval_expr(expr):
        return expr.evaluate(
            constant=lambda v: em.const_int(v),
            cell=lambda column, rot: em.inp(
                "advice"
                if column.kind == ColumnType.ADVICE
                else ("fixed" if column.kind == ColumnType.FIXED else "instance"),
                column.index,
                rot,
            ),
            selector=lambda s: em.inp("fixed", selector_column_index(cs, s.index)),
            add=em.add,
            mul=em.mul,
            neg=em.neg,
        )

    one = em.named("one")
    l0 = em.named("l0")
    llast = em.named("llast")
    lactive = em.named("lactive")
    x = em.named("x")
    theta, beta, gamma = em.chal("theta"), em.chal("beta"), em.chal("gamma")
    em.chal("y")  # ensure the fold challenge is pinned

    for gate in gates:
        for _, poly in gate.constraints:
            em.fold_term(eval_expr(poly))

    # --- permutation terms (same order as arguments.permutation_terms) ----
    if chunk_meta:
        n_chunks = len(chunk_meta)
        z = lambda c: em.inp("perm_z", c)
        em.fold_term(em.mul(l0, em.sub(one, z(0))))
        zl = z(n_chunks - 1)
        em.fold_term(em.mul(llast, em.sub(em.mul(zl, zl), zl)))
        for c in range(1, n_chunks):
            prev_last = em.inp("perm_z", c - 1, usable)
            em.fold_term(em.mul(l0, em.sub(z(c), prev_last)))
        for c, entries in enumerate(chunk_meta):
            # left/right accumulate across the loop: keep while live, clear
            # kept on the final use so em.sub releases them exactly once
            left = em.inp("perm_z", c, 1)
            right = z(c)
            for kind, idx, j, delta_j in entries:
                v = em.inp(kind, idx)
                sigma = em.inp("sigma", j)
                lf = em.add(v, em.add(em.mul(beta, sigma), gamma))
                left.kept = False  # released by this use
                left = em.keep(em.mul(left, lf))
                bx = em.mul(em.mul(beta, em.const_int(delta_j)), x)
                rf = em.add(v, em.add(bx, gamma))
                right.kept = False
                right = em.keep(em.mul(right, rf))
            left.kept = right.kept = False
            em.fold_term(em.mul(em.sub(left, right), lactive))

    # --- lookup terms (same order as arguments.lookup_terms) --------------
    for li, lk in enumerate(lookups):
        a_comp = None
        s_comp = None
        for i_expr, t_expr in lk.mapping:
            iv = eval_expr(i_expr)
            tv = eval_expr(t_expr)
            if a_comp is None:
                a_comp = em.keep(iv)
                s_comp = em.keep(tv)
            else:
                a_comp.kept = False
                a_comp = em.keep(em.add(em.mul(a_comp, theta), iv))
                s_comp.kept = False
                s_comp = em.keep(em.add(em.mul(s_comp, theta), tv))
        zr = em.inp("lk_z", li)
        z_next = em.inp("lk_z", li, 1)
        a_perm = em.inp("lk_a", li)
        s_perm = em.inp("lk_s", li)
        a_prev = em.inp("lk_a", li, -1)
        em.fold_term(em.mul(l0, em.sub(one, zr)))
        em.fold_term(em.mul(llast, em.sub(em.mul(zr, zr), zr)))
        lhs = em.mul(em.mul(z_next, em.add(a_perm, beta)), em.add(s_perm, gamma))
        a_comp.kept = False
        s_comp.kept = False
        rhs = em.mul(em.mul(zr, em.add(a_comp, beta)), em.add(s_comp, gamma))
        em.fold_term(em.mul(em.sub(lhs, rhs), lactive))
        diff = em.keep(em.sub(a_perm, s_perm))
        em.fold_term(em.mul(l0, diff))
        diff.kept = False
        em.fold_term(em.mul(em.mul(diff, em.sub(a_perm, a_prev)), lactive))


def quotient_constants(vk) -> dict:
    """Shared per-pk quotient constants as plain int lists over the extended
    coset: l0 / llast / lactive Lagrange selectors, the coset x coordinates,
    and 1/Z_H. Consumed by both the device VM (QuotientEvaluator) and the
    native host VM (ops/native_quotient.py). With the native runtime the
    ~10 basis rows build in C++ (batch inversion + vector ops, ~30 ms
    instead of seconds of object-array Python) and the returned lists carry
    their bytes arrays (PolyInts) so the native VM binds them copy-free.

    BZ_PROOF_ENGINE=device forces the object-array build below so the
    device pipeline shares no native code with the host engine (the
    cross-check knob — ADVICE r4)."""
    from .. import native
    from ..config import config as _cfg

    if _cfg().proof_engine != "device" and native.available():
        return _quotient_constants_native(vk)
    from ..plonk.arguments import _lagrange_basis_extended

    cs = vk.cs
    domain = vk.domain
    usable = cs.usable_rows(domain.n)
    ext = domain.extended_n
    rows = [0, usable] + list(range(usable + 1, domain.n))
    basis = _lagrange_basis_extended(domain, rows)
    l0 = [int(v) for v in basis[0]]
    llast = [int(v) for v in basis[usable]]
    blind = np.zeros(ext, dtype=object)
    for i in range(usable + 1, domain.n):
        blind = (blind + basis[i]) % P
    lactive = [(1 - (lv + bv)) % P for lv, bv in zip(llast, blind)]
    xs = []
    acc = domain.g_coset
    for _ in range(ext):
        xs.append(acc)
        acc = acc * domain.extended_omega % P
    t_inv = FP.batch_inv(domain.t_extended())
    return {"l0": l0, "llast": llast, "lactive": lactive, "x": xs, "t_inv": t_inv}


def _quotient_constants_native(vk) -> dict:
    """Native twin of quotient_constants — same exact math, bit-identical
    values (l_i(X) = w^i * t(X) / (n * (X - w^i)) on the extended coset)."""
    from .. import native
    from ..pcs.ipa import PolyInts

    cs = vk.cs
    domain = vk.domain
    usable = cs.usable_rows(domain.n)
    ext = domain.extended_n
    n = domain.n
    which = native.which_for(P)

    # xs[i] = g_coset * extended_omega^i
    xs_b = np.zeros((1, ext, 32), np.uint8)
    xs_b[:, :, 0] = 1
    native.scale_batch(which, xs_b, domain.extended_omega, domain.g_coset)
    xs_b = xs_b[0]
    t_b = native.ints_to_bytes_arr(domain.t_extended())
    t_inv_b = native.inv_vec(which, t_b)
    zeros = np.zeros((ext, 32), np.uint8)

    def basis_row(i: int):
        wi = pow(domain.omega, i, P)
        neg = np.broadcast_to(
            np.frombuffer(((-(n * wi)) % P).to_bytes(32, "little"), dtype=np.uint8),
            (ext, 32),
        )
        denoms = native.axpy(which, xs_b, n, neg)  # n*x - n*wi
        invs = native.inv_vec(which, denoms)
        prod = native.mul_vec(which, t_b, invs)
        return native.axpy(which, prod, wi, zeros)  # wi * t * inv

    l0_b = basis_row(0)
    llast_b = basis_row(usable)
    acc = llast_b
    for i in range(usable + 1, n):
        acc = native.axpy(which, basis_row(i), 1, acc)
    ones = np.zeros((ext, 32), np.uint8)
    ones[:, 0] = 1
    lactive_b = native.axpy(which, acc, P - 1, ones)  # 1 - (llast + blind)

    def wrap(arr):
        return PolyInts.wrap(native.bytes_arr_to_ints(arr), arr)

    return {
        "l0": wrap(l0_b),
        "llast": wrap(llast_b),
        "lactive": wrap(lactive_b),
        "x": wrap(xs_b),
        "t_inv": wrap(t_inv_b),
    }


def emit_vm(vk, schedule: ProofSchedule):
    """Emit the constraint bytecode for a verifying key: -> ((I, 4) int32
    program, pin keys, total registers). Shared by the device and native
    host VM executors — both run the IDENTICAL instruction stream, so their
    quotients are bit-identical by construction."""
    cs = vk.cs
    usable = cs.usable_rows(vk.domain.n)
    perm_cols = vk.permutation.columns
    chunk_len = schedule.chunk_len
    chunk_meta = []
    for c0 in range(0, len(perm_cols), chunk_len):
        cols = perm_cols[c0 : c0 + chunk_len]
        entries = []
        for col in cols:
            j = perm_cols.index(col)
            entries.append((col.kind.value, col.index, j, pow(DELTA, j, P)))
        chunk_meta.append(entries)
    em = _VMEmitter()
    _emit_constraints(em, cs, usable, chunk_meta, cs.lookups, cs.gates)
    return em.finalize()


class QuotientEvaluator:
    """Built once per proving key; __call__(columns, challenges) -> h coeffs."""

    def __init__(self, vk, schedule: ProofSchedule):
        cs = vk.cs
        domain = vk.domain
        usable = cs.usable_rows(domain.n)
        self.domain = domain
        self.keys = quotient_poly_keys(cs, schedule.num_perm_chunks)
        self.key_index = {k: i for i, k in enumerate(self.keys)}
        ext = domain.extended_n
        rot_scale = ext // domain.n
        spec = FP_SPEC
        r = spec.r_mod_p

        # --- baked constants (Montgomery limb form) ------------------------
        consts = quotient_constants(vk)

        def mont_const(vals):
            return jnp.asarray(ints_to_limbs([v * r % P for v in vals]))

        named_arrays = {
            "l0": mont_const(consts["l0"]),
            "llast": mont_const(consts["llast"]),
            "lactive": mont_const(consts["lactive"]),
            "x": mont_const(consts["x"]),
            "one": jnp.broadcast_to(jnp.asarray(spec.one_mont), (ext, L.NLIMBS)),
        }
        c_tinv = mont_const(consts["t_inv"])

        # --- emit the constraint bytecode (host, once) ---------------------
        prog_np, pin_keys, n_regs = emit_vm(vk, schedule)
        self.vm_size = (len(prog_np), n_regs)

        def run(batch, challenges):
            # batch: (B, ext, 16) plain limbs of COEFFICIENT polys (padded);
            # challenges: (4, 16) plain limbs
            # evaluate every poly on the extended coset: scale + NTT.
            # lax.map (sequential) keeps peak HBM at one poly's
            # intermediates — the bf16 chunk expansion is 32x the operand
            # size and OOMs if the whole batch is processed at once
            scale = jnp.asarray(D.make_scale_vector(FP, domain.g_coset, ext, spec))
            plan = D.plan_for(P, ext, domain.extended_omega)

            def extend_one(p):
                pm = L.to_mont(spec, p)
                pm = L.mont_mul(spec, pm, scale)
                return D.ntt(plan, pm)

            bm = jax.lax.map(extend_one, batch)
            ch = L.to_mont(spec, challenges)
            chal_arrays = {"theta": ch[0], "beta": ch[1], "gamma": ch[2], "y": ch[3]}

            def arr(key):
                return bm[self.key_index[key]]

            # --- bind pinned registers -------------------------------------
            pin_vals = []
            for key in pin_keys:
                if key[0] == "inp":
                    _, kind, index, rot = key
                    pin_vals.append(jnp.roll(arr((kind, index)), -rot * rot_scale, axis=0))
                elif key[0] == "const":
                    pin_vals.append(
                        jnp.broadcast_to(
                            jnp.asarray(ints_to_limbs([key[1] * r % P])[0]), (ext, L.NLIMBS)
                        )
                    )
                elif key[0] == "chal":
                    pin_vals.append(jnp.broadcast_to(chal_arrays[key[1]], (ext, L.NLIMBS)))
                else:  # named
                    pin_vals.append(named_arrays[key[1]])
            n_temps = n_regs - 1 - len(pin_vals)
            regs0 = jnp.concatenate(
                [
                    jnp.zeros((1, ext, L.NLIMBS), jnp.uint32),  # agg
                    jnp.stack(pin_vals).astype(jnp.uint32),
                    jnp.zeros((n_temps, ext, L.NLIMBS), jnp.uint32),
                ]
            )

            # --- execute the bytecode: one field op per scan step ----------
            prog = jnp.asarray(prog_np)

            def step(regs, ins):
                a = jax.lax.dynamic_index_in_dim(regs, ins[1], 0, keepdims=False)
                b = jax.lax.dynamic_index_in_dim(regs, ins[2], 0, keepdims=False)
                res = jax.lax.switch(
                    ins[0],
                    (
                        lambda: L.mont_mul(spec, a, b),
                        lambda: L.add(spec, a, b),
                        lambda: L.sub(spec, a, b),
                    ),
                )
                regs = jax.lax.dynamic_update_index_in_dim(regs, res, ins[3], 0)
                return regs, None

            regs, _ = jax.lax.scan(step, regs0, prog)
            h_ext = L.mont_mul(spec, regs[0], c_tinv)

            # extended iNTT + coset unscale, still on device
            plan_inv = D.plan_for(P, ext, pow(domain.extended_omega, -1, P))
            n_inv = L.int_to_limbs(pow(ext, -1, P) * r % P)
            coeffs = D.intt(plan_inv, h_ext, n_inv)
            inv_scale = D.make_scale_vector(FP, domain.g_coset_inv, ext, spec)
            coeffs = L.mont_mul(spec, coeffs, jnp.asarray(inv_scale))
            return L.from_mont(spec, coeffs)

        self._run = run  # unjitted body — the batch prover vmaps/maps it
        self._fn = jax.jit(run)

    def __call__(self, coeff_polys_by_key: dict, challenges: tuple) -> list[int]:
        """coeff_polys_by_key: {key: coefficient int list};
        challenges: (theta, beta, gamma, y). Returns h coefficients."""
        from ..fields.limb import limbs_to_ints

        ext = self.domain.extended_n
        flat = []
        for key in self.keys:
            poly = coeff_polys_by_key[key]
            flat.extend(list(poly) + [0] * (ext - len(poly)))
        batch = ints_to_limbs(flat).reshape(len(self.keys), ext, L.NLIMBS)
        ch = ints_to_limbs([c % P for c in challenges])
        from .dispatch import device_call

        out = np.asarray(
            device_call(self._fn, jnp.asarray(batch), jnp.asarray(ch), what="quotient evaluation")
        )
        return limbs_to_ints(out)


class BatchQuotientEvaluator:
    """Quotients of B same-pk proofs in ONE device dispatch.

    The batch-amortized prover's phase-k insight (VERDICT r4 next #1): the
    ~1.5 s relay dispatch cost of an MB-scale executable is per-EXECUTION,
    not per-proof, so evaluating all B quotients in a single program divides
    it by B. Structure:

    * pk-constant polys (fixed, sigma) upload ONCE and their extended-coset
      forms are computed once, outside the per-proof loop;
    * per-proof polys upload as length-n coefficient arrays and are
      zero-padded to the extended size in-graph (8x less relay transfer
      than the single-proof path's host-side padding);
    * ``lax.map`` (sequential) over the proof axis bounds live memory at
      one proof's register file, and the per-proof body is the IDENTICAL
      instruction stream as QuotientEvaluator — h outputs are bit-identical
      to the sequential path by construction (tests/test_batch_prover.py).
    """

    def __init__(self, vk, schedule: ProofSchedule):
        cs = vk.cs
        domain = vk.domain
        self.domain = domain
        self.keys = quotient_poly_keys(cs, schedule.num_perm_chunks)
        self.shared_keys = [k for k in self.keys if k[0] in ("fixed", "sigma")]
        self.per_keys = [k for k in self.keys if k[0] not in ("fixed", "sigma")]
        shared_index = {k: i for i, k in enumerate(self.shared_keys)}
        per_index = {k: i for i, k in enumerate(self.per_keys)}
        ext = domain.extended_n
        n = domain.n
        rot_scale = ext // n
        spec = FP_SPEC
        r = spec.r_mod_p

        consts = quotient_constants(vk)

        def mont_const(vals):
            return jnp.asarray(ints_to_limbs([v * r % P for v in vals]))

        named_arrays = {
            "l0": mont_const(consts["l0"]),
            "llast": mont_const(consts["llast"]),
            "lactive": mont_const(consts["lactive"]),
            "x": mont_const(consts["x"]),
            "one": jnp.broadcast_to(jnp.asarray(spec.one_mont), (ext, L.NLIMBS)),
        }
        c_tinv = mont_const(consts["t_inv"])

        prog_np, pin_keys, n_regs = emit_vm(vk, schedule)
        self.vm_size = (len(prog_np), n_regs)

        scale = jnp.asarray(D.make_scale_vector(FP, domain.g_coset, ext, spec))
        plan = D.plan_for(P, ext, domain.extended_omega)
        plan_inv = D.plan_for(P, ext, pow(domain.extended_omega, -1, P))
        n_inv = L.int_to_limbs(pow(ext, -1, P) * r % P)
        inv_scale = jnp.asarray(D.make_scale_vector(FP, domain.g_coset_inv, ext, spec))

        def extend_one(p):
            # (n, 16) plain canonical -> (ext, 16) Montgomery on the coset.
            # Zero-padding before to_mont is bit-identical to the
            # single-proof path's host-side padding (0 * R = 0).
            pm = L.to_mont(spec, p)
            pm = jnp.pad(pm, ((0, ext - pm.shape[0]), (0, 0)))
            pm = L.mont_mul(spec, pm, scale)
            return D.ntt(plan, pm)

        def run_batch(shared, per_batch, challenges_batch):
            # shared: (S, n, 16); per_batch: (B, Pk, n, 16);
            # challenges_batch: (B, 4, 16) — canonical limbs, shipped as
            # uint16 (halves the relay upload; widened here)
            shared = shared.astype(jnp.uint32)
            per_batch = per_batch.astype(jnp.uint32)
            challenges_batch = challenges_batch.astype(jnp.uint32)
            ext_shared = jax.lax.map(extend_one, shared)

            def one_proof(args):
                per, challenges = args
                ext_per = jax.lax.map(extend_one, per)
                ch = L.to_mont(spec, challenges)
                chal_arrays = {"theta": ch[0], "beta": ch[1], "gamma": ch[2], "y": ch[3]}

                def arr(key):
                    if key in shared_index:
                        return ext_shared[shared_index[key]]
                    return ext_per[per_index[key]]

                pin_vals = []
                for key in pin_keys:
                    if key[0] == "inp":
                        _, kind, index, rot = key
                        pin_vals.append(
                            jnp.roll(arr((kind, index)), -rot * rot_scale, axis=0)
                        )
                    elif key[0] == "const":
                        pin_vals.append(
                            jnp.broadcast_to(
                                jnp.asarray(ints_to_limbs([key[1] * r % P])[0]),
                                (ext, L.NLIMBS),
                            )
                        )
                    elif key[0] == "chal":
                        pin_vals.append(jnp.broadcast_to(chal_arrays[key[1]], (ext, L.NLIMBS)))
                    else:
                        pin_vals.append(named_arrays[key[1]])
                n_temps = n_regs - 1 - len(pin_vals)
                regs0 = jnp.concatenate(
                    [
                        jnp.zeros((1, ext, L.NLIMBS), jnp.uint32),
                        jnp.stack(pin_vals).astype(jnp.uint32),
                        jnp.zeros((n_temps, ext, L.NLIMBS), jnp.uint32),
                    ]
                )
                prog = jnp.asarray(prog_np)

                def step(regs, ins):
                    a = jax.lax.dynamic_index_in_dim(regs, ins[1], 0, keepdims=False)
                    b = jax.lax.dynamic_index_in_dim(regs, ins[2], 0, keepdims=False)
                    res = jax.lax.switch(
                        ins[0],
                        (
                            lambda: L.mont_mul(spec, a, b),
                            lambda: L.add(spec, a, b),
                            lambda: L.sub(spec, a, b),
                        ),
                    )
                    regs = jax.lax.dynamic_update_index_in_dim(regs, res, ins[3], 0)
                    return regs, None

                regs, _ = jax.lax.scan(step, regs0, prog)
                h_ext = L.mont_mul(spec, regs[0], c_tinv)
                coeffs = D.intt(plan_inv, h_ext, n_inv)
                coeffs = L.mont_mul(spec, coeffs, inv_scale)
                # canonical limbs < 2^16 — u16 halves the download
                return L.from_mont(spec, coeffs).astype(jnp.uint16)

            return jax.lax.map(one_proof, (per_batch, challenges_batch))

        self._fn = jax.jit(run_batch)
        self._shared_cache = None

    def __call__(
        self, coeff_polys_by_key_list: list[dict], challenges_list: list[tuple]
    ) -> list[list[int]]:
        """One dispatch for the whole batch; returns per-proof h coeffs."""
        from ..fields.limb import limbs_to_ints
        from .dispatch import device_call

        n = self.domain.n
        ext = self.domain.extended_n
        b = len(coeff_polys_by_key_list)
        assert b == len(challenges_list) and b > 0

        if self._shared_cache is None:
            flat = []
            for key in self.shared_keys:
                poly = coeff_polys_by_key_list[0][key]
                flat.extend(list(poly) + [0] * (n - len(poly)))
            self._shared_cache = jnp.asarray(
                ints_to_limbs(flat)
                .reshape(len(self.shared_keys), n, L.NLIMBS)
                .astype(np.uint16)
            )

        per = np.empty((b, len(self.per_keys), n, L.NLIMBS), np.uint16)
        for bi, polys_by_key in enumerate(coeff_polys_by_key_list):
            flat = []
            for key in self.per_keys:
                poly = polys_by_key[key]
                flat.extend(list(poly) + [0] * (n - len(poly)))
            per[bi] = ints_to_limbs(flat).reshape(len(self.per_keys), n, L.NLIMBS)
        ch = np.stack(
            [ints_to_limbs([c % P for c in chs]) for chs in challenges_list]
        ).astype(np.uint16)
        out = np.asarray(
            device_call(
                self._fn,
                self._shared_cache,
                jnp.asarray(per),
                jnp.asarray(ch),
                what=f"batched quotient x{b}",
            )
        )
        return [limbs_to_ints(out[bi]) for bi in range(b)]
