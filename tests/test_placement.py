"""Placement chip tests: valid placements for every ship size plus the
malicious-witness cases (mirrors the negative coverage driven through
src/circuits/board.rs:164-539, at chip granularity)."""

import pytest

from battlezips_halo2_tpu.dev import ConstraintNotSatisfied, MockProver
from battlezips_halo2_tpu.gadgets.placement import PlacementChip, compute_placement_trace
from battlezips_halo2_tpu.plonk import Circuit, ConstraintSystem
from battlezips_halo2_tpu.utils import BinaryValue, Ship, ShipType, WitnessOption
from battlezips_halo2_tpu.utils.binary import BOARD_SIZE


class PlacementCircuit(Circuit):
    """Harness: witness H/V bit decompositions directly, then run the chip."""

    def __init__(self, ship_len: int, h: BinaryValue, v: BinaryValue):
        self.ship_len = ship_len
        self.h = h
        self.v = v

    @classmethod
    def configure(cls, cs):
        raise NotImplementedError  # parameterized below

    def synthesize(self, config, layouter):
        chip_cfg, load_col = config
        h_bits = self.h.bitfield(BOARD_SIZE)
        v_bits = self.v.bitfield(BOARD_SIZE)

        def load(region):
            h_cells = [region.assign_advice(f"h{i}", load_col, i, b) for i, b in enumerate(h_bits)]
            v_cells = [
                region.assign_advice(f"v{i}", load_col, BOARD_SIZE + i, b) for i, b in enumerate(v_bits)
            ]
            return h_cells, v_cells

        h_cells, v_cells = layouter.assign_region("load", load)
        ship = self.h.zip(self.v)
        PlacementChip(chip_cfg).synthesize(layouter, ship, h_cells, v_cells)

    def without_witnesses(self):
        return PlacementCircuit(self.ship_len, BinaryValue.empty(), BinaryValue.empty())


def make_circuit_class(s: int):
    class _C(PlacementCircuit):
        @classmethod
        def configure(cls, cs: ConstraintSystem):
            bits = cs.advice_column()
            bit_sum = cs.advice_column()
            window = cs.advice_column()
            load = cs.advice_column()
            fixed = cs.fixed_column()
            for col in (bits, bit_sum, window, load):
                cs.enable_equality(col)
            cs.enable_constant(fixed)
            chip_cfg = PlacementChip.configure(cs, s, bits, bit_sum, window, fixed)
            return chip_cfg, load

    return _C


def run(ship: Ship, option=WitnessOption.DEFAULT):
    h, v = ship.witness(option)
    cls = make_circuit_class(ship.ship_type.length)
    return MockProver.run(9, cls(ship.ship_type.length, h, v), []).verify()


def test_trace_computation():
    ship = Ship(ShipType.CARRIER, 0, 0, False)
    trace = compute_placement_trace(ship.bits(True), 5)
    assert trace[0][99] == 5  # total bits
    assert trace[1][99] == 1  # exactly one full window


@pytest.mark.parametrize(
    "ship",
    [
        Ship(ShipType.CARRIER, 0, 0, False),
        Ship(ShipType.BATTLESHIP, 3, 4, False),
        Ship(ShipType.CRUISER, 2, 2, True),
        Ship(ShipType.SUBMARINE, 7, 5, True),
        Ship(ShipType.DESTROYER, 8, 9, False),
    ],
)
def test_valid_placements(ship):
    assert run(ship) == []


@pytest.mark.parametrize(
    "option",
    [
        WitnessOption.NONCONSECUTIVE,
        WitnessOption.OVERSIZED,
        WitnessOption.UNDERSIZED,
        WitnessOption.EXTRA_BIT,
    ],
)
def test_malicious_placements_fail(option):
    ship = Ship(ShipType.BATTLESHIP, 2, 2, False)
    failures = run(ship, option)
    assert failures, f"{option} must violate placement constraints"
    assert any(isinstance(f, ConstraintNotSatisfied) for f in failures)
    gates = {f.constraint.gate.name for f in failures if isinstance(f, ConstraintNotSatisfied)}
    assert "running sum constraints" in gates


def test_failure_provenance_oversized():
    """An oversized battleship reports bit_sum=5 (expected 4) and window
    count failures in the final constraint region (mirrors the exact
    cell-value expectations of src/circuits/board.rs:437-467)."""
    failures = run(Ship(ShipType.BATTLESHIP, 2, 2, False), WitnessOption.OVERSIZED)
    final = [
        f
        for f in failures
        if isinstance(f, ConstraintNotSatisfied) and f.location.region.name == "constrain running sum output"
    ]
    assert final
    names = {f.constraint.name for f in final}
    assert "Placed ship of correct length" in names
    length_failure = next(f for f in final if f.constraint.name == "Placed ship of correct length")
    values = dict(length_failure.cell_values)
    assert "0x5" in values.values()  # bit_sum == 5 for an oversized battleship
