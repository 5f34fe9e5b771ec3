"""BoardCircuit tests — mirror of the reference's 11 board tests
(src/circuits/board.rs:98-933): 2 valid patterns, 8 negative cases driven by
the malicious witness generators / geometric violations, 1 commitment
tamper. (The real-prover `production` test lives in test_prover.py.)"""

import pytest

from battlezips_halo2_tpu.circuits import BoardCircuit
from battlezips_halo2_tpu.dev import ConstraintNotSatisfied, MockProver, Permutation
from battlezips_halo2_tpu.fields import FP
from battlezips_halo2_tpu.utils import (
    DEFAULT_WITNESS_OPTIONS,
    BinaryValue,
    Board,
    Deck,
    WitnessOption,
    pedersen_commit,
)

TRAPDOOR = 0x1CEB00DA_5EED_0F_BA5E_12345678


def make_board(placements):
    return Board.from_deck(Deck.from_placements(placements))


def run_board(board, options=DEFAULT_WITNESS_OPTIONS, tamper_commitment=False, k=12):
    message = board.state(options)
    # state may exceed canonical Fp only in contrived cases; use lower_u128
    msg = message.lower_u128()
    commitment = pedersen_commit(msg, TRAPDOOR)
    cx, cy = commitment
    if tamper_commitment:
        cx = FP.add(cx, 1)
    circuit = BoardCircuit(board.witness(options), message, TRAPDOOR)
    return MockProver.run(k, circuit, [[cx, cy]]).verify()


VALID_0 = [(3, 3, True), (5, 4, False), (0, 1, False), (0, 5, True), (6, 1, False)]
VALID_1 = [(3, 4, False), (9, 6, True), (0, 0, False), (0, 6, False), (6, 1, True)]


def gate_names(failures):
    return {f.constraint.gate.name for f in failures if isinstance(f, ConstraintNotSatisfied)}


def constraint_names(failures):
    return {f.constraint.name for f in failures if isinstance(f, ConstraintNotSatisfied)}


def test_valid_0():
    assert run_board(make_board(VALID_0)) == []


def test_valid_1():
    assert run_board(make_board(VALID_1)) == []


def test_invalid_placement_none():
    """Missing carrier: its placement chip sees 0 bits (board.rs:165-231)."""
    board = make_board([None] + VALID_0[1:])
    failures = run_board(board)
    assert failures
    names = constraint_names(failures)
    assert "Placed ship of correct length" in names
    assert "One full bit window" in names


def test_invalid_placement_dual():
    """Bits split across H and V: the orientation H*V==0 gate fires
    (board.rs:233-293)."""
    options = (WitnessOption.DUAL_PLACEMENT,) + DEFAULT_WITNESS_OPTIONS[1:]
    failures = run_board(make_board(VALID_0), options)
    assert "Commitment orientation H OR V == 0 constraint" in gate_names(failures)
    # the offending gate is in the load region, row 0
    f = next(
        f
        for f in failures
        if isinstance(f, ConstraintNotSatisfied)
        and f.constraint.gate.name == "Commitment orientation H OR V == 0 constraint"
    )
    assert f.location.region.name == "load ship placements"
    assert f.location.offset == 0
    assert f.constraint.name == "Aircraft Carrier H OR V == 0"


@pytest.mark.parametrize(
    "option",
    [WitnessOption.NONCONSECUTIVE, WitnessOption.EXTRA_BIT, WitnessOption.OVERSIZED, WitnessOption.UNDERSIZED],
    ids=["nonconsecutive", "extra_bit", "oversized", "undersized"],
)
def test_invalid_malicious_witness(option):
    """Tampered carrier witness fails placement constraints
    (board.rs:295-539)."""
    options = (option,) + DEFAULT_WITNESS_OPTIONS[1:]
    failures = run_board(make_board(VALID_0), options)
    assert failures
    assert "running sum constraints" in gate_names(failures)


def test_invalid_placement_oversized_cell_values():
    """The oversized carrier reports bit_sum == 6 in the final constraint
    (mirrors src/circuits/board.rs:437-467's exact cell-value assertions)."""
    options = (WitnessOption.OVERSIZED,) + DEFAULT_WITNESS_OPTIONS[1:]
    failures = run_board(make_board(VALID_0), options)
    final = [
        f
        for f in failures
        if isinstance(f, ConstraintNotSatisfied) and f.constraint.name == "Placed ship of correct length"
    ]
    assert final and any("0x6" in v for _, v in final[0].cell_values)


def test_invalid_horizontal_row_overflow():
    """Carrier at (8,0,H) wraps across rows: bit count ok, no full window
    (board.rs:542-590)."""
    board = make_board([(8, 0, False)] + VALID_0[1:])
    failures = run_board(board)
    names = constraint_names(failures)
    assert "One full bit window" in names
    assert "Placed ship of correct length" not in names


def test_invalid_vertical_row_overflow():
    """Carrier at (0,8,V) wraps after transpose serialization
    (board.rs:592-639)."""
    board = make_board([(0, 8, True)] + VALID_0[1:])
    failures = run_board(board)
    names = constraint_names(failures)
    assert "One full bit window" in names


def test_invalid_collision_no_transpose():
    """Two horizontal ships crossing the same cell: transpose booleanity
    fires (board.rs:642-733)."""
    board = make_board([(0, 0, False), (0, 0, False), (4, 0, False), (0, 6, False), (6, 1, True)])
    failures = run_board(board)
    assert "transpose row constraint" in gate_names(failures)
    f = next(
        f
        for f in failures
        if isinstance(f, ConstraintNotSatisfied) and f.constraint.gate.name == "transpose row constraint"
    )
    assert f.location.region.name == "Transpose ship commitments"


def test_invalid_collision_transposed():
    """A horizontal and a vertical ship crossing (board.rs:735-828)."""
    board = make_board([(3, 1, True), (1, 3, False), (6, 0, False), (0, 6, False), (8, 8, False)])
    failures = run_board(board)
    assert "transpose row constraint" in gate_names(failures)


def test_invalid_board_commitment():
    """Tampered public commitment: instance equality fails
    (board.rs:831-877)."""
    failures = run_board(make_board(VALID_0), tamper_commitment=True)
    assert failures
    assert all(isinstance(f, Permutation) for f in failures)


# --- exact VerifyFailure parity (VERDICT r2 missing #1) ---------------------
# Full-strictness mirrors of the reference's structured-failure assertions:
# the COMPLETE failure vector — gate index+name, constraint index+name,
# region index+name, offset, and every queried cell's (column, rotation) and
# value string — must equal the reference's expectation, pinning
# configure/synthesis ordering (SURVEY §3.5).

from battlezips_halo2_tpu.dev.failures import (
    ConstraintRef,
    FailureLocation,
    GateRef,
    RegionRef,
)
from battlezips_halo2_tpu.plonk.expression import Column, ColumnType


def adv(i):
    return Column(ColumnType.ADVICE, i)


def cns(gate_idx, gate_name, c_idx, c_name, r_idx, r_name, offset, cells):
    return ConstraintNotSatisfied(
        constraint=ConstraintRef(GateRef(gate_idx, gate_name), c_idx, c_name),
        location=FailureLocation(RegionRef(r_idx, r_name), offset),
        cell_values=tuple(((adv(i), 0), v) for i, v in cells),
    )


VALID_1_BOARD = [(3, 4, False), (9, 6, True), (0, 0, False), (0, 6, False), (6, 1, True)]


def test_exact_failure_vector_nonconsecutive():
    """Bit-exact mirror of board.rs:295-346's full VerifyFailure vector."""
    options = (WitnessOption.NONCONSECUTIVE,) + DEFAULT_WITNESS_OPTIONS[1:]
    assert run_board(make_board(VALID_0), options) == [
        cns(15, "running sum constraints", 1, "One full bit window",
            13, "constrain running sum output", 0, [(2, "0")]),
    ]


def test_exact_failure_vector_extra_bit():
    """Bit-exact mirror of board.rs:348-399 (6 bits counted for the carrier)."""
    options = (WitnessOption.EXTRA_BIT,) + DEFAULT_WITNESS_OPTIONS[1:]
    assert run_board(make_board(VALID_0), options) == [
        cns(15, "running sum constraints", 0, "Placed ship of correct length",
            13, "constrain running sum output", 0, [(1, "0x6")]),
    ]


def test_exact_failure_vector_oversized():
    """Bit-exact mirror of board.rs:401-470 (battleship oversized: 5 bits +
    2 full windows)."""
    options = (DEFAULT_WITNESS_OPTIONS[0], WitnessOption.OVERSIZED) + DEFAULT_WITNESS_OPTIONS[2:]
    assert run_board(make_board(VALID_0), options) == [
        cns(20, "running sum constraints", 0, "Placed ship of correct length",
            16, "constrain running sum output", 0, [(1, "0x5")]),
        cns(20, "running sum constraints", 1, "One full bit window",
            16, "constrain running sum output", 0, [(2, "0x2")]),
    ]


def test_exact_failure_vector_undersized():
    """Bit-exact mirror of board.rs:472-540 (destroyer undersized: 1 bit,
    0 full windows)."""
    options = DEFAULT_WITNESS_OPTIONS[:4] + (WitnessOption.UNDERSIZED,)
    assert run_board(make_board(VALID_1_BOARD), options) == [
        cns(35, "running sum constraints", 0, "Placed ship of correct length",
            25, "constrain running sum output", 0, [(1, "1")]),
        cns(35, "running sum constraints", 1, "One full bit window",
            25, "constrain running sum output", 0, [(2, "0")]),
    ]


def test_exact_failure_vector_collision_no_transpose():
    """Bit-exact mirror of board.rs:642-733: cruiser at (4,1,H) collides with
    destroyer at (6,1,H); both transpose-gate constraints fire at offset 16
    with the exact 11- and 10-cell value vectors."""
    board = make_board([(3, 3, True), (5, 4, False), (4, 1, False), (0, 5, True), (6, 1, False)])
    c0_cells = [(i, "1" if i in (4, 8, 10) else "0") for i in range(11)]
    c1_cells = [(i, "1" if i in (4, 8) else "0") for i in range(10)]
    assert run_board(board) == [
        cns(36, "transpose row constraint", 0, "Constrain trace value integrity",
            26, "Transpose ship commitments", 16, c0_cells),
        cns(36, "transpose row constraint", 1, "Constrain transposition of bit",
            26, "Transpose ship commitments", 16, c1_cells),
    ]


def test_exact_failure_vector_collision_transposed():
    """Bit-exact mirror of board.rs:735-829: destroyer at (6,3,V) collides
    with battleship at (6,4,H) after transposition; offset 46."""
    board = make_board([(3, 4, False), (9, 6, True), (0, 0, False), (0, 6, False), (6, 3, True)])
    c0_cells = [(i, "1" if i in (0, 9, 10) else "0") for i in range(11)]
    c1_cells = [(i, "1" if i in (0, 9) else "0") for i in range(10)]
    assert run_board(board) == [
        cns(36, "transpose row constraint", 0, "Constrain trace value integrity",
            26, "Transpose ship commitments", 46, c0_cells),
        cns(36, "transpose row constraint", 1, "Constrain transposition of bit",
            26, "Transpose ship commitments", 46, c1_cells),
    ]
