"""In-circuit ECC chip: fixed-base scalar multiplication and complete
addition over Pallas.

Framework analog of ``halo2_gadgets::ecc::chip::EccChip`` as consumed by the
reference's Pedersen chip (src/chips/pedersen.rs:6-17,59,87-133), with the
same mathematical content (SURVEY.md §2.2 "ECC in-circuit gadget"):

* fixed-base mul over 85 3-bit windows using the precomputed window tables
  (gadgets/fixed_bases.py, regenerating the reference's Z/U data):
  - per-window range check: prod_{c=0..7} (w - c) == 0
  - x-coordinate via the degree-7 Lagrange polynomial whose coefficients sit
    in 8 fixed columns: x_p == sum_l  c_l * w^l
  - y-canonicity via the Z/U tables: u^2 == y_p + z  (z in a fixed column)
  - window points accumulated with incomplete addition
* base-field-element mul additionally binds the windows to a circuit cell
  with a running-sum decomposition: z_i = 8*z_{i+1} + w_i, z_0 = alpha,
  z_85 == 0
* complete point addition with the 12-constraint gate from the halo2 book
  (identity encoded as (0, 0), which is not on y^2 = x^3 + 5).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..curves.host import PALLAS, Point
from ..fields.host import FP
from ..plonk import AssignedCell, ConstraintSystem, Layouter
from ..plonk.expression import Column, Constant, Selector
from ..utils.constants import H, NUM_WINDOWS
from .common import with_selector
from .fixed_bases import FixedBase, decompose_scalar


def _inv0(x: int) -> int:
    return 0 if x % FP.modulus == 0 else FP.inv(x)


@dataclass(frozen=True)
class EccConfig:
    # advice
    window: Column
    x_p: Column
    y_p: Column
    x_acc: Column  # doubles as x_q / x_r in complete add
    y_acc: Column  # doubles as y_q / y_r in complete add
    u: Column
    z_run: Column
    aux: tuple  # (alpha, beta, gamma, delta) advice for complete add
    lam: Column
    # fixed
    lagrange: tuple  # 8 coefficient columns
    fixed_z: Column
    # selectors
    q_mul_fixed: Selector
    q_run_sum: Selector
    q_acc_init: Selector
    q_add_incomplete: Selector
    q_add_complete: Selector


class EccChip:
    def __init__(self, config: EccConfig):
        self.config = config

    @staticmethod
    def configure(cs: ConstraintSystem, advice: list[Column], lagrange: list[Column], fixed_z: Column) -> EccConfig:
        assert len(advice) >= 10 and len(lagrange) == 8
        window, x_p, y_p, x_acc, y_acc, u, z_run = advice[:7]
        alpha, beta, gamma = advice[7], advice[8], advice[9]
        # delta and lambda share columns with the mul-only region
        delta, lam = advice[5], advice[6]

        q_mul_fixed = cs.selector()
        q_run_sum = cs.selector()
        q_acc_init = cs.selector()
        q_add_incomplete = cs.selector()
        q_add_complete = cs.selector()

        # --- fixed-base window gate (range + x-interp + u canonicity) -----
        w = window.cur()
        range_poly = w - 0
        for c in range(1, H):
            range_poly = range_poly * (w - Constant(c))
        interp = Constant(0)
        w_pow = None
        for l in range(H):
            col = lagrange[l].cur()
            if l == 0:
                interp = col + interp
            else:
                w_pow = w if w_pow is None else w_pow * w
                interp = interp + col * w_pow
        cs.create_gate(
            "fixed-base window",
            with_selector(
                q_mul_fixed.expr(),
                [
                    ("window range", range_poly),
                    ("x == lagrange interp", x_p.cur() - interp),
                    ("u^2 == y + z", u.cur() * u.cur() - y_p.cur() - fixed_z.cur()),
                ],
            ),
        )

        # --- running-sum decomposition (base-field-element scalars) -------
        cs.create_gate(
            "fixed-base running sum",
            with_selector(
                q_run_sum.expr(),
                [("z_cur == 8 z_next + word", z_run.cur() - Constant(8) * z_run.next() - w)],
            ),
        )

        # --- accumulator initialization (first window) --------------------
        cs.create_gate(
            "init fixed-base accumulator",
            with_selector(
                q_acc_init.expr(),
                [
                    ("x_acc init", x_acc.cur() - x_p.cur()),
                    ("y_acc init", y_acc.cur() - y_p.cur()),
                ],
            ),
        )

        # --- incomplete addition: (x_q,y_q)=prev acc, (x_p,y_p)=window pt --
        x_q, y_q = x_acc.prev(), y_acc.prev()
        x_r, y_r = x_acc.cur(), y_acc.cur()
        dx = x_p.cur() - x_q
        dy = y_p.cur() - y_q
        cs.create_gate(
            "incomplete point addition",
            with_selector(
                q_add_incomplete.expr(),
                [
                    ("x_r consistency", (x_r + x_q + x_p.cur()) * dx * dx - dy * dy),
                    ("y_r consistency", (y_r + y_q) * dx - dy * (x_q - x_r)),
                ],
            ),
        )

        # --- complete addition (halo2 book formulation) --------------------
        # row layout: [_, x_p, y_p, x_q, y_q, delta, lambda, alpha, beta, gamma]
        # result row +1:      [x_r, y_r] in the x_q/y_q columns
        cxp, cyp = x_p.cur(), y_p.cur()
        cxq, cyq = x_acc.cur(), y_acc.cur()
        cxr, cyr = x_acc.next(), y_acc.next()
        cl, ca, cb, cg, cd = lam.cur(), alpha.cur(), beta.cur(), gamma.cur(), delta.cur()
        ddx = cxq - cxp
        s = cyq + cyp
        one = Constant(1)
        poly_x = cl * cl - cxp - cxq - cxr
        poly_y = cl * (cxp - cxr) - cyp - cyr
        cs.create_gate(
            "complete point addition",
            with_selector(
                q_add_complete.expr(),
                [
                    ("lambda from distinct x", ddx * (ddx * cl - (cyq - cyp))),
                    ("lambda from doubling", (one - ddx * ca) * (Constant(2) * cyp * cl - Constant(3) * cxp * cxp)),
                    ("x_r (add)", cxp * cxq * ddx * poly_x),
                    ("y_r (add)", cxp * cxq * ddx * poly_y),
                    ("x_r (double)", cxp * cxq * s * poly_x),
                    ("y_r (double)", cxp * cxq * s * poly_y),
                    ("P identity x", (one - cxp * cb) * (cxr - cxq)),
                    ("P identity y", (one - cxp * cb) * (cyr - cyq)),
                    ("Q identity x", (one - cxq * cg) * (cxr - cxp)),
                    ("Q identity y", (one - cxq * cg) * (cyr - cyp)),
                    ("inverse sum x", (one - ddx * ca - s * cd) * cxr),
                    ("inverse sum y", (one - ddx * ca - s * cd) * cyr),
                ],
            ),
        )

        return EccConfig(
            window=window,
            x_p=x_p,
            y_p=y_p,
            x_acc=x_acc,
            y_acc=y_acc,
            u=u,
            z_run=z_run,
            aux=(alpha, beta, gamma, delta),
            lam=lam,
            lagrange=tuple(lagrange),
            fixed_z=fixed_z,
            q_mul_fixed=q_mul_fixed,
            q_run_sum=q_run_sum,
            q_acc_init=q_acc_init,
            q_add_incomplete=q_add_incomplete,
            q_add_complete=q_add_complete,
        )

    # ------------------------------------------------------------------
    def _mul_region(self, layouter: Layouter, table: FixedBase, windows: list[int], alpha_cell, max_bits=None):
        """Shared synthesis of a fixed-base mul; binds the running sum to
        ``alpha_cell`` when given (base-field-element mode).

        ``max_bits``: when the scalar is known (and elsewhere constrained)
        to be < 2^max_bits, the running sum is additionally pinned to zero
        from window ceil(max_bits/3) on — this removes the K vs K+p
        decomposition ambiguity (the 255-bit window range leaves two
        integers congruent to alpha mod p; forcing the tail windows to zero
        keeps K < 2^(3*ceil(max_bits/3)) < p, so K = alpha exactly)."""
        cfg = self.config

        # host-side trace
        zs = None
        if alpha_cell is not None:
            zs = [0] * (NUM_WINDOWS + 1)
            inv8 = FP.inv(8)
            zs[0] = alpha_cell.value if alpha_cell.value is not None else 0
            for i in range(NUM_WINDOWS):
                zs[i + 1] = (zs[i] - windows[i]) * inv8 % FP.modulus

        def region_fn(region):
            acc = None
            out = (None, None)
            for wi in range(NUM_WINDOWS):
                wt = table.windows[wi]
                kw = windows[wi]
                pt = wt.points[kw]
                region.enable_selector("mul_fixed", cfg.q_mul_fixed, wi)
                region.assign_advice(f"window {wi}", cfg.window, wi, kw)
                region.assign_advice(f"x_p {wi}", cfg.x_p, wi, pt[0])
                region.assign_advice(f"y_p {wi}", cfg.y_p, wi, pt[1])
                region.assign_advice(f"u {wi}", cfg.u, wi, wt.us[kw])
                for l in range(H):
                    region.assign_fixed(f"lagrange {wi},{l}", cfg.lagrange[l], wi, wt.lagrange_coeffs[l])
                region.assign_fixed(f"z {wi}", cfg.fixed_z, wi, wt.z)
                acc = pt if acc is None else PALLAS.add(acc, pt)
                if acc is None:
                    # scalar == 0 (or a pathological collision): the
                    # incomplete-addition chain cannot represent the identity —
                    # same limitation as halo2_gadgets' fixed-base mul.
                    raise ValueError(
                        "fixed-base mul accumulator hit the identity; "
                        "zero scalars are not supported by the incomplete addition chain"
                    )
                xa = region.assign_advice(f"x_acc {wi}", cfg.x_acc, wi, acc[0])
                ya = region.assign_advice(f"y_acc {wi}", cfg.y_acc, wi, acc[1])
                out = (xa, ya)
                if wi == 0:
                    region.enable_selector("acc_init", cfg.q_acc_init, 0)
                else:
                    region.enable_selector("add_inc", cfg.q_add_incomplete, wi)
            if alpha_cell is not None:
                cutoff = NUM_WINDOWS if max_bits is None else -(-max_bits // 3)
                z0 = region.assign_advice("z_run 0", cfg.z_run, 0, zs[0])
                region.constrain_equal(z0, alpha_cell)
                for i in range(1, NUM_WINDOWS + 1):
                    zc = region.assign_advice(f"z_run {i}", cfg.z_run, i, zs[i])
                    if i >= cutoff:
                        # canonicity: all windows past the scalar's bit bound
                        # are zero (z_i == 0 forces w_j == 0 for j >= cutoff)
                        region.constrain_constant(zc, 0)
                for i in range(NUM_WINDOWS):
                    region.enable_selector("run_sum", cfg.q_run_sum, i)
            return out

        name = f"fixed-base mul [{table.name}]"
        return layouter.assign_region(name, region_fn)

    def mul_full_width(self, layouter: Layouter, table: FixedBase, scalar: int):
        """[scalar]B for a full-width (255-bit, Fq) witnessed scalar — the
        trapdoor path (reference src/chips/pedersen.rs:89-93, ScalarFixed)."""
        windows = decompose_scalar(scalar % PALLAS.scalar.modulus)
        return self._mul_region(layouter, table, windows, None)

    def mul_base_field(self, layouter: Layouter, table: FixedBase, alpha: AssignedCell, max_bits=None):
        """[alpha]B where alpha is an assigned base-field cell
        (FixedPointBaseField::mul — the message path). ``max_bits`` enables
        the canonical-decomposition tail constraint (see _mul_region)."""
        value = alpha.value if alpha.value is not None else 0
        windows = decompose_scalar(value % FP.modulus)
        return self._mul_region(layouter, table, windows, alpha, max_bits=max_bits)

    # ------------------------------------------------------------------
    def add_complete(self, layouter: Layouter, p: tuple, q: tuple):
        """Complete addition of two assigned points; returns (x_r, y_r)."""
        cfg = self.config
        xp = p[0].value if p[0].value is not None else 0
        yp = p[1].value if p[1].value is not None else 0
        xq = q[0].value if q[0].value is not None else 0
        yq = q[1].value if q[1].value is not None else 0

        # host-side complete addition with (0,0) as identity
        P: Point = None if (xp, yp) == (0, 0) else (xp, yp)
        Q: Point = None if (xq, yq) == (0, 0) else (xq, yq)
        R = PALLAS.add(P, Q)
        xr, yr = (0, 0) if R is None else R

        alpha = _inv0(xq - xp)
        beta = _inv0(xp)
        gamma = _inv0(xq)
        delta = _inv0(yq + yp) if xq == xp else 0
        if xq != xp:
            lam = (yq - yp) * _inv0(xq - xp) % FP.modulus
        elif yp != 0:
            # doubling AND inverse case: constraint 2 pins lambda to the
            # tangent slope whenever x_q == x_p (result unused when y_q=-y_p)
            lam = 3 * xp * xp * _inv0(2 * yp) % FP.modulus
        else:
            lam = 0

        a_alpha, a_beta, a_gamma = cfg.aux[0], cfg.aux[1], cfg.aux[2]
        a_delta = cfg.aux[3]

        def region_fn(region):
            region.enable_selector("add_complete", cfg.q_add_complete, 0)
            p[0].copy_advice("x_p", region, cfg.x_p, 0)
            p[1].copy_advice("y_p", region, cfg.y_p, 0)
            q[0].copy_advice("x_q", region, cfg.x_acc, 0)
            q[1].copy_advice("y_q", region, cfg.y_acc, 0)
            region.assign_advice("lambda", cfg.lam, 0, lam)
            region.assign_advice("alpha", a_alpha, 0, alpha)
            region.assign_advice("beta", a_beta, 0, beta)
            region.assign_advice("gamma", a_gamma, 0, gamma)
            region.assign_advice("delta", a_delta, 0, delta)
            x_r = region.assign_advice("x_r", cfg.x_acc, 1, xr)
            y_r = region.assign_advice("y_r", cfg.y_acc, 1, yr)
            return x_r, y_r

        return layouter.assign_region("complete point addition", region_fn)
