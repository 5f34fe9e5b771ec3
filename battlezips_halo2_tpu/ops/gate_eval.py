"""Device-side quotient (gate/permutation/lookup) evaluation.

The prover's heaviest host phase — evaluating every constraint polynomial
over the extended coset and folding with y — compiled into ONE jitted device
program per proving key:

* the Expression DAG evaluates with Montgomery limb semantics (mont_mul /
  add / sub on (ext, 16) arrays, rotations as rolls);
* the permutation and lookup argument formulas are the device twins of
  plonk/arguments.py (same math, limb ops);
* l_0 / l_last / l_active, the coset coordinates and 1/Z_H are baked in as
  constants; challenges (theta, beta, gamma, y) are traced inputs so the
  compiled program is reused across proofs;
* the division by Z_H and the extended iNTT + coset unscale happen in the
  same program — input: plain-limb column batch, output: plain-limb h
  coefficients.
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
from ..plonk.keygen import DELTA, selector_column_index
from . import ntt as D

P = FP.modulus


def quotient_poly_keys(cs, num_perm_chunks: int):
    """Canonical ordering of every polynomial the quotient evaluation reads;
    the prover stacks its coefficient polys in exactly this order."""
    keys = []
    keys += [("advice", i) for i in range(cs.num_advice)]
    keys += [("fixed", i) for i in range(cs.num_fixed + len(cs.selectors))]
    keys += [("instance", i) for i in range(cs.num_instance)]
    keys += [("perm_z", i) for i in range(num_perm_chunks)]
    keys += [("sigma", i) for i in range(len(cs.equality_columns))]
    for i in range(len(cs.lookups)):
        keys += [("lk_a", i), ("lk_s", i), ("lk_z", i)]
    return keys


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
        from ..plonk.arguments import _lagrange_basis_extended

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

        def mont_const(vals):
            return jnp.asarray(ints_to_limbs([v * r % P for v in vals]))

        c_l0 = mont_const(l0)
        c_llast = mont_const(llast)
        c_lactive = mont_const(lactive)
        c_x = mont_const(xs)
        c_tinv = mont_const(t_inv)
        one_mont = jnp.asarray(spec.one_mont)

        # permutation chunk metadata
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

        lookups = cs.lookups
        gates = cs.gates

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
            theta, beta, gamma, y = ch[0], ch[1], ch[2], ch[3]

            def arr(key):
                return bm[self.key_index[key]]

            def rotated(a, rot):
                return jnp.roll(a, -rot * rot_scale, axis=0)

            def cell_fn(column, rot):
                kind = "advice" if column.kind == ColumnType.ADVICE else (
                    "fixed" if column.kind == ColumnType.FIXED else "instance"
                )
                return rotated(arr((kind, column.index)), rot)

            def eval_expr(expr):
                return expr.evaluate(
                    constant=lambda v: jnp.asarray(ints_to_limbs([v % P * r % P])[0]),
                    cell=cell_fn,
                    selector=lambda s: arr(("fixed", selector_column_index(cs, s.index))),
                    add=lambda a, b: L.add(spec, a, b),
                    mul=lambda a, b: L.mont_mul(spec, a, b),
                    neg=lambda a: L.neg(spec, a),
                )

            terms = []
            for gate in gates:
                for _, poly in gate.constraints:
                    terms.append(eval_expr(poly))

            # --- permutation terms (device twin of arguments.permutation_terms)
            if chunk_meta:
                zs = [arr(("perm_z", c)) for c in range(len(chunk_meta))]
                terms.append(L.mont_mul(spec, c_l0, L.sub(spec, one_mont[None, :], zs[0])))
                zl = zs[-1]
                terms.append(L.mont_mul(spec, c_llast, L.sub(spec, L.mont_mul(spec, zl, zl), zl)))
                for c in range(1, len(chunk_meta)):
                    prev_last = rotated(zs[c - 1], usable)
                    terms.append(L.mont_mul(spec, c_l0, L.sub(spec, zs[c], prev_last)))
                for c, entries in enumerate(chunk_meta):
                    left = rotated(zs[c], 1)
                    right = zs[c]
                    for kind, idx, j, delta_j in entries:
                        v = arr((kind, idx))
                        sigma = arr(("sigma", j))
                        dj = jnp.asarray(ints_to_limbs([delta_j * r % P])[0])
                        left = L.mont_mul(
                            spec,
                            left,
                            L.add(spec, v, L.add(spec, L.mont_mul(spec, beta, sigma), gamma)),
                        )
                        bx = L.mont_mul(spec, L.mont_mul(spec, beta, dj[None, :]), c_x)
                        right = L.mont_mul(spec, right, L.add(spec, v, L.add(spec, bx, gamma)))
                    terms.append(L.mont_mul(spec, L.sub(spec, left, right), c_lactive))

            # --- lookup terms (device twin of arguments.lookup_terms) ------
            for li, lk in enumerate(lookups):
                a_comp = None
                s_comp = None
                for i_expr, t_expr in lk.mapping:
                    iv = eval_expr(i_expr)
                    tv = eval_expr(t_expr)
                    a_comp = iv if a_comp is None else L.add(spec, L.mont_mul(spec, a_comp, theta), iv)
                    s_comp = tv if s_comp is None else L.add(spec, L.mont_mul(spec, s_comp, theta), tv)
                z = arr(("lk_z", li))
                z_next = rotated(z, 1)
                a_perm = arr(("lk_a", li))
                s_perm = arr(("lk_s", li))
                a_prev = rotated(a_perm, -1)
                terms.append(L.mont_mul(spec, c_l0, L.sub(spec, one_mont[None, :], z)))
                terms.append(L.mont_mul(spec, c_llast, L.sub(spec, L.mont_mul(spec, z, z), z)))
                lhs = L.mont_mul(
                    spec, L.mont_mul(spec, z_next, L.add(spec, a_perm, beta)), L.add(spec, s_perm, gamma)
                )
                rhs = L.mont_mul(
                    spec, L.mont_mul(spec, z, L.add(spec, a_comp, beta)), L.add(spec, s_comp, gamma)
                )
                terms.append(L.mont_mul(spec, L.sub(spec, lhs, rhs), c_lactive))
                diff = L.sub(spec, a_perm, s_perm)
                terms.append(L.mont_mul(spec, c_l0, diff))
                terms.append(
                    L.mont_mul(spec, L.mont_mul(spec, diff, L.sub(spec, a_perm, a_prev)), c_lactive)
                )

            agg = terms[0]
            for t in terms[1:]:
                agg = L.add(spec, L.mont_mul(spec, agg, y[None, :]), t)
            h_ext = L.mont_mul(spec, agg, c_tinv)

            # extended iNTT + coset unscale, still on device
            plan_inv = D.plan_for(P, ext, pow(domain.extended_omega, -1, P))
            n_inv = L.int_to_limbs(pow(ext, -1, P) * r % P)
            coeffs = D.intt(plan_inv, h_ext, n_inv)
            inv_scale = D.make_scale_vector(FP, domain.g_coset_inv, ext, spec)
            coeffs = L.mont_mul(spec, coeffs, jnp.asarray(inv_scale))
            return L.from_mont(spec, coeffs)

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
        out = np.asarray(self._fn(jnp.asarray(batch), jnp.asarray(ch)))
        return limbs_to_ints(out)
