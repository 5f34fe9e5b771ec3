"""Board circuit: prove 5 ships are legally placed and commit to the board.

Semantic mirror of the reference's BoardChip/BoardCircuit
(src/chips/board.rs:186-499, src/circuits/board.rs:15-73): 11 shared advice
columns, 10 num2bits + 5 placement + transpose + bits2num + Pedersen chips,
plus the per-ship "H*V == 0" orientation gate. Public instance: the Pedersen
commitment's (x, y) at rows 0 and 1.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..gadgets import (
    Bits2NumChip,
    Num2BitsChip,
    PedersenCommitmentChip,
    PlacementChip,
    TransposeChip,
)
from ..plonk import Circuit, ConstraintSystem, Layouter
from ..utils.binary import BOARD_SIZE, BinaryValue
from ..gadgets.common import with_selector

SHIP_LENGTHS = [5, 4, 3, 3, 2]
SHIP_NAMES = ["Aircraft Carrier", "Battleship", "Cruiser", "Submarine", "Destroyer"]


def commitment_label(i: int) -> str:
    """H/V commitment label by index (board.rs:32-46)."""
    return ("H" if i % 2 == 0 else "V") + str(SHIP_LENGTHS[i // 2])


@dataclass
class BoardConfig:
    num2bits: list
    bits2num: object
    placement: list
    transpose: object
    pedersen: object
    advice: list
    fixed: list
    table_idx: object
    instance: object
    orientation_selector: object


class BoardChip:
    def __init__(self, config: BoardConfig):
        self.config = config

    @staticmethod
    def configure(cs: ConstraintSystem) -> BoardConfig:
        advice = []
        for _ in range(11):
            col = cs.advice_column()
            cs.enable_equality(col)
            advice.append(col)
        fixed = [cs.fixed_column() for _ in range(9)]
        cs.enable_constant(fixed[0])
        table_idx = cs.lookup_table_column()
        instance = cs.instance_column()
        cs.enable_equality(instance)
        selector = cs.selector()

        num2bits = [
            Num2BitsChip.configure(cs, advice[0], advice[1], advice[2], fixed[0]) for _ in range(10)
        ]
        bits2num = Bits2NumChip.configure(cs, advice[0], advice[1], advice[2], fixed[0])
        placement = [
            PlacementChip.configure(cs, s, advice[0], advice[1], advice[2], fixed[0])
            for s in SHIP_LENGTHS
        ]
        transpose = TransposeChip.configure(cs, advice[:10], advice[10])
        # 8 Lagrange fixed columns + dedicated fixed_z column
        pedersen = PedersenCommitmentChip.configure(cs, advice[:10], fixed[:8], fixed[8], table_idx)

        # H * V == 0 per ship pair (board.rs:275-306)
        cs.create_gate(
            "Commitment orientation H OR V == 0 constraint",
            with_selector(
                selector.expr(),
                [
                    (f"{SHIP_NAMES[i]} H OR V == 0", advice[2 * i].cur() * advice[2 * i + 1].cur())
                    for i in range(5)
                ],
            ),
        )

        return BoardConfig(
            num2bits=num2bits,
            bits2num=bits2num,
            placement=placement,
            transpose=transpose,
            pedersen=pedersen,
            advice=advice,
            fixed=fixed,
            table_idx=table_idx,
            instance=instance,
            orientation_selector=selector,
        )

    # --- synthesis pipeline (board.rs:331-363) -----------------------------
    def synthesize(
        self,
        layouter: Layouter,
        ship_commitments: list[BinaryValue],
        board: BinaryValue,
        trapdoor: int,
    ):
        cfg = self.config
        ships = [ship_commitments[2 * i].zip(ship_commitments[2 * i + 1]) for i in range(5)]
        assigned = self._load_commitments(layouter, ship_commitments)
        placements = self._decompose_commitments(layouter, ship_commitments, assigned)
        self._synth_placements(layouter, ships, placements)
        transposed_bits = self._transpose_placements(layouter, board, placements)
        transposed = self._recompose_board(layouter, board, transposed_bits)
        x, y = self._commit_board(layouter, transposed, trapdoor)
        layouter.constrain_instance(x, cfg.instance, 0)
        layouter.constrain_instance(y, cfg.instance, 1)

    def _load_commitments(self, layouter, ship_commitments):
        cfg = self.config

        def region_fn(region):
            cells = []
            for i in range(10):
                cells.append(
                    region.assign_advice(
                        f"{commitment_label(i)} ship commitment",
                        cfg.advice[i],
                        0,
                        ship_commitments[i].lower_u128(),
                    )
                )
            region.enable_selector("orientation", cfg.orientation_selector, 0)
            return cells

        return layouter.assign_region("load ship placements", region_fn)

    def _decompose_commitments(self, layouter, ship_commitments, assigned):
        placements = []
        for i in range(10):
            bits = ship_commitments[i].bitfield(BOARD_SIZE)
            chip = Num2BitsChip(assigned[i], bits)
            placements.append(chip.synthesize(self.config.num2bits[i], layouter))
        return placements

    def _synth_placements(self, layouter, ships, placements):
        for i in range(5):
            chip = PlacementChip(self.config.placement[i])
            chip.synthesize(layouter, ships[i], placements[2 * i], placements[2 * i + 1])

    def _transpose_placements(self, layouter, board, placements):
        chip = TransposeChip(self.config.transpose)
        return chip.synthesize(layouter, board.bitfield(BOARD_SIZE), placements)

    def _recompose_board(self, layouter, board, transposed_bits):
        chip = Bits2NumChip(board.lower_u128(), transposed_bits)
        return chip.synthesize(self.config.bits2num, layouter)

    def _commit_board(self, layouter, board_state_cell, trapdoor):
        chip = PedersenCommitmentChip(self.config.pedersen)
        return chip.synthesize(layouter, board_state_cell, trapdoor)


class BoardCircuit(Circuit):
    """Circuit wrapper (src/circuits/board.rs:15-73). k = 12."""

    K = 12

    def __init__(self, ship_commitments: list[BinaryValue], board: BinaryValue, trapdoor: int):
        assert len(ship_commitments) == 10
        self.ship_commitments = ship_commitments
        self.board = board
        self.trapdoor = trapdoor

    @classmethod
    def configure(cls, cs: ConstraintSystem) -> BoardConfig:
        return BoardChip.configure(cs)

    def synthesize(self, config: BoardConfig, layouter: Layouter):
        BoardChip(config).synthesize(layouter, self.ship_commitments, self.board, self.trapdoor)

    def without_witnesses(self) -> "BoardCircuit":
        # nonzero dummy state/trapdoor: the fixed-base mul's incomplete
        # addition chain cannot represent a zero scalar
        dummy = [BinaryValue(1) if i == 0 else BinaryValue.empty() for i in range(10)]
        return BoardCircuit(dummy, BinaryValue(1), 1)
