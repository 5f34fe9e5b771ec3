"""Per-ship placement legality chip.

Constraint semantics mirror the reference's PlacementChip
(src/chips/placement.rs:107-265), parameterized by ship length S:

* ``s_input``  — collapse H+V bit pairs: sum == h + v (placement.rs:121-133)
* ``s_sum_bits`` — running bit count: sum == bit + prev (placement.rs:136-145)
* ``s_adjacency`` — windowed adjacency: sum the next S bits and add the
  Lagrange-interpolated indicator poly (degree S, maps bit-count S -> 1,
  everything else -> 0) to the running full-window count
  (placement.rs:148-215)
* ``s_permute`` — carry the window sum unchanged through rows where a ship
  cannot start, i.e. ``offset % 10 + S > 10`` (placement.rs:218-230)
* ``s_constrain`` — final check: bit_sum == S and full_window_sum == 1
  (placement.rs:233-250)

The witness trace is precomputed host-side (compute_placement_trace,
placement.rs:380-419).
"""

from __future__ import annotations

from dataclasses import dataclass

from ..plonk import AssignedCell, ConstraintSystem, Layouter
from ..plonk.expression import Column, Constant, Selector
from ..poly import lagrange_interpolate
from ..utils.binary import BOARD_SIZE, BinaryValue
from .common import with_selector


@dataclass(frozen=True)
class PlacementConfig:
    ship_len: int
    bits: Column  # collapsed H+V bits (column also holds h in s_input rows)
    bit_sum: Column
    full_window_sum: Column
    fixed: Column
    s_input: Selector
    s_sum_bits: Selector
    s_adjacency: Selector
    s_permute: Selector
    s_constrain: Selector


def compute_placement_trace(ship: BinaryValue, s: int) -> list[list[int]]:
    """[bit_sum trace, full_window_sum trace], each length 100
    (placement.rs:380-419)."""
    bits = ship.bitfield(BOARD_SIZE)
    bit_sum = [bits[0]]
    for i in range(1, BOARD_SIZE):
        bit_sum.append(bits[i] + bit_sum[i - 1])

    def increment(offset: int) -> int:
        return 1 if sum(bits[offset : offset + s]) == s else 0

    window = [increment(0)]
    for i in range(1, BOARD_SIZE):
        if i % 10 + s > 10:
            window.append(window[i - 1])
        else:
            window.append(window[i - 1] + increment(i))
    return [bit_sum, window]


class PlacementChip:
    def __init__(self, config: PlacementConfig):
        self.config = config

    @staticmethod
    def configure(
        cs: ConstraintSystem,
        s: int,
        bits: Column,
        bit_sum: Column,
        full_window_sum: Column,
        fixed: Column,
    ) -> PlacementConfig:
        s_input = cs.selector()
        s_sum_bits = cs.selector()
        s_adjacency = cs.selector()
        s_permute = cs.selector()
        s_constrain = cs.selector()

        # s_input: columns are repurposed — bit_sum holds h, full_window_sum
        # holds v, bits holds the collapsed sum (placement.rs:121-133).
        # Cells bind in the reference closure's statement order
        # (placement.rs:127-129: horizontal, vertical, sum) so first-use
        # query numbering matches halo2's.
        horizontal = bit_sum.cur()
        vertical = full_window_sum.cur()
        sum_ = bits.cur()
        cs.create_gate(
            "sum inputted H, V bits",
            with_selector(
                s_input.expr(),
                [("h + v = sum", sum_ - (horizontal + vertical))],
            ),
        )

        cs.create_gate(
            "placement bit count",
            with_selector(
                s_sum_bits.expr(),
                [("Running Sum: Bits", bits.cur() + bit_sum.prev() - bit_sum.cur())],
            ),
        )

        # window-indicator polynomial via Lagrange interpolation over 0..=S.
        # Query order follows placement.rs:150-158: the S window bits, then
        # full_window_sum at prev, then at cur.
        bit_count = bits.cur()
        for i in range(1, s):
            bit_count = bit_count + bits.query(i)
        prev_full_window_count = full_window_sum.prev()
        full_window_count = full_window_sum.cur()
        coeffs = lagrange_interpolate(list(range(s + 1)), [0] * s + [1])
        # expression-tree shape mirrors interpolate_incrementor / exp_pow
        # (placement.rs:166-207): the fold seeds at Constant(0), the i=0
        # term multiplies by exp_pow(x, 0) = Constant(1), and x^i builds as
        # a left-assoc product chain — so the {:?} tree in the pinned vk
        # matches the reference's construction node for node
        indicator = Constant(0)
        x_pow = None
        for i in range(len(coeffs)):
            if i == 0:
                term = Constant(coeffs[i]) * Constant(1)
            else:
                x_pow = bit_count if x_pow is None else x_pow * bit_count
                term = Constant(coeffs[i]) * x_pow
            indicator = indicator + term
        cs.create_gate(
            "adjacency bit count",
            with_selector(
                s_adjacency.expr(),
                [
                    (
                        "Full Window Running Sum",
                        full_window_count - prev_full_window_count - indicator,
                    )
                ],
            ),
        )

        cs.create_gate(
            "permute adjaceny bit count",
            with_selector(
                s_permute.expr(),
                [("Premute Full Window Running Sum", full_window_sum.prev() - full_window_sum.cur())],
            ),
        )

        cs.create_gate(
            "running sum constraints",
            with_selector(
                s_constrain.expr(),
                [
                    ("Placed ship of correct length", bit_sum.cur() - Constant(s)),
                    ("One full bit window", full_window_sum.cur() - 1),
                ],
            ),
        )

        return PlacementConfig(
            s, bits, bit_sum, full_window_sum, fixed, s_input, s_sum_bits, s_adjacency, s_permute, s_constrain
        )

    # --- synthesis (placement.rs:267-282) ---------------------------------
    def synthesize(
        self,
        layouter: Layouter,
        ship: BinaryValue,
        horizontal: list[AssignedCell],
        vertical: list[AssignedCell],
    ):
        bits = ship.bitfield(BOARD_SIZE)
        trace = compute_placement_trace(ship, self.config.ship_len)
        assigned = self._load_bits(layouter, bits, horizontal, vertical)
        state = self._placement_sums(layouter, assigned, trace)
        self._assign_constraint(layouter, state)

    def _load_bits(self, layouter, bits, horizontal, vertical) -> list[AssignedCell]:
        cfg = self.config

        def region_fn(region):
            assigned = []
            for i in range(BOARD_SIZE):
                region.enable_selector("input", cfg.s_input, i)
                horizontal[i].copy_advice(f"copy h bit #{i}", region, cfg.bit_sum, i)
                vertical[i].copy_advice(f"copy v bit #{i}", region, cfg.full_window_sum, i)
                assigned.append(region.assign_advice(f"collapse bit #{i}", cfg.bits, i, bits[i]))
            return assigned

        return layouter.assign_region("permute and collapse bit decompositions", region_fn)

    def _placement_sums(self, layouter, assigned_bits, trace):
        cfg = self.config

        def region_fn(region):
            # padding row of constant zeros so Rotation::prev is safe
            region.assign_advice_from_constant("pad bit count running sum", cfg.bit_sum, 0, 0)
            region.assign_advice_from_constant("pad full bit window running sum", cfg.full_window_sum, 0, 0)
            for i, bit in enumerate(assigned_bits):
                bit.copy_advice(f"permute bit {i}", region, cfg.bits, i + 1)
            bit_sum_cell = full_window_cell = None
            for offset in range(1, BOARD_SIZE + 1):
                idx = offset - 1
                bit_sum_cell = region.assign_advice(
                    f"assign running sum (bit count) {idx}", cfg.bit_sum, offset, trace[0][idx]
                )
                full_window_cell = region.assign_advice(
                    f"assign running sum (full window count) {idx}",
                    cfg.full_window_sum,
                    offset,
                    trace[1][idx],
                )
                region.enable_selector("sum bits", cfg.s_sum_bits, offset)
                if idx % 10 + cfg.ship_len > 10:
                    region.enable_selector("permute", cfg.s_permute, offset)
                else:
                    region.enable_selector("adjacency", cfg.s_adjacency, offset)
            return (bit_sum_cell, full_window_cell)

        return layouter.assign_region("placement running sum trace", region_fn)

    def _assign_constraint(self, layouter, state):
        cfg = self.config
        bit_sum, full_window = state

        def region_fn(region):
            bit_sum.copy_advice("copy bit sum total count", region, cfg.bit_sum, 0)
            full_window.copy_advice("copy full bit window total count", region, cfg.full_window_sum, 0)
            region.enable_selector("constrain", cfg.s_constrain, 0)

        layouter.assign_region("constrain running sum output", region_fn)
