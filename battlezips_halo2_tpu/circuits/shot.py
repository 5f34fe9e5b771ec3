"""Shot circuit: prove a shot against a committed board is a hit/miss.

Semantic mirror of the reference's ShotChip/ShotCircuit
(src/chips/shot.rs:170-536, src/circuits/shot.rs:15-78): load
[board_state, cx, cy, shot, hit] advice, boolean-constrain the hit
assertion, decompose board and shot to bits, run the shot/hit running sums
over 100 rows, constrain shot_sum == 1 and hit_sum == hit, recommit the
board in-circuit, and export [cx, cy, shot, hit] as the public instance.
k = 11.
"""

from __future__ import annotations

from dataclasses import dataclass

from ..gadgets import Num2BitsChip, PedersenCommitmentChip
from ..gadgets.common import with_selector
from ..plonk import Circuit, ConstraintSystem, Layouter
from ..utils.binary import BOARD_SIZE, BinaryValue
from ..utils.pedersen import pedersen_commit


def compute_shot_trace(board: BinaryValue, shot: BinaryValue) -> list[list[int]]:
    """[shot running sum, hit running sum] traces (shot.rs:28-51)."""
    shot_trace = [1 if shot.bit(0) else 0]
    hit_trace = [1 if (board.bit(0) and shot.bit(0)) else 0]
    for i in range(1, BOARD_SIZE):
        hit_trace.append(hit_trace[-1] + (1 if (board.bit(i) and shot.bit(i)) else 0))
        shot_trace.append(shot_trace[-1] + (1 if shot.bit(i) else 0))
    return [shot_trace, hit_trace]


@dataclass
class ShotConfig:
    num2bits: list
    pedersen: object
    advice: list
    fixed: list
    table_idx: object
    instance: object
    s_hit_bool: object
    s_running_sum: object
    s_output: object


class ShotChip:
    def __init__(self, config: ShotConfig):
        self.config = config

    @staticmethod
    def configure(cs: ConstraintSystem) -> ShotConfig:
        advice = []
        for _ in range(10):
            col = cs.advice_column()
            cs.enable_equality(col)
            advice.append(col)
        extra = cs.advice_column()
        cs.enable_equality(extra)
        fixed = [cs.fixed_column() for _ in range(9)]
        cs.enable_constant(fixed[0])
        table_idx = cs.lookup_table_column()
        instance = cs.instance_column()
        cs.enable_equality(instance)
        s_hit_bool = cs.selector()
        s_running_sum = cs.selector()
        s_output = cs.selector()

        num2bits = [
            Num2BitsChip.configure(cs, advice[5], advice[6], advice[7], fixed[0]) for _ in range(2)
        ]
        pedersen = PedersenCommitmentChip.configure(cs, advice, fixed[:8], fixed[8], table_idx)

        # boolean hit assertion (shot.rs:229-237)
        assertion = advice[4].cur()
        cs.create_gate(
            "boolean hit assertion",
            with_selector(s_hit_bool.expr(), [("asserted hit value is boolean", (1 - assertion) * assertion)]),
        )

        # running sums (shot.rs:239-261); cells bind in the reference
        # closure's statement order (shot.rs:241-246) for first-use
        # query numbering
        hit_bit = advice[5].cur()
        shot_bit = advice[6].cur()
        shot_sum = advice[7].cur()
        hit_sum = advice[8].cur()
        prev_shot_sum = advice[7].prev()
        prev_hit_sum = advice[8].prev()
        cs.create_gate(
            "shot running sum row",
            with_selector(
                s_running_sum.expr(),
                [
                    ("running sum of flipped bits in shot", shot_bit + prev_shot_sum - shot_sum),
                    ("running sum of hits against board", hit_bit * shot_bit + prev_hit_sum - hit_sum),
                ],
            ),
        )

        # output constraints (shot.rs:263-285)
        cs.create_gate(
            "constrain shot running sum output",
            with_selector(
                s_output.expr(),
                [
                    ("Shot only fires at one board cell", 1 - advice[6].cur()),
                    ("Public hit assertion matches private witness", advice[5].cur() - advice[7].cur()),
                ],
            ),
        )

        return ShotConfig(
            num2bits=num2bits,
            pedersen=pedersen,
            advice=advice + [extra],
            fixed=fixed,
            table_idx=table_idx,
            instance=instance,
            s_hit_bool=s_hit_bool,
            s_running_sum=s_running_sum,
            s_output=s_output,
        )

    # --- synthesis (shot.rs:308-354) ---------------------------------------
    def synthesize(
        self,
        layouter: Layouter,
        board: BinaryValue,
        trapdoor: int,
        shot: BinaryValue,
        hit: BinaryValue,
    ):
        cfg = self.config
        board_state = board.lower_u128()
        commitment = pedersen_commit(board_state, trapdoor)
        cx, cy = commitment if commitment is not None else (0, 0)
        shot_commitment = shot.lower_u128()
        bits = [board.bitfield(BOARD_SIZE), shot.bitfield(BOARD_SIZE)]
        trace = compute_shot_trace(board, shot)

        inputs = self._load_advice(layouter, board_state, (cx, cy), shot_commitment, hit.lower_u128())
        assigned_bits = self._decompose(layouter, [inputs[0], inputs[3]], bits)
        sums = self._running_sums(layouter, assigned_bits, trace)
        self._running_sum_output(layouter, inputs[4], sums)
        x, y = self._commit_board(layouter, inputs[0], trapdoor)
        layouter.constrain_instance(x, cfg.instance, 0)
        layouter.constrain_instance(y, cfg.instance, 1)
        layouter.constrain_instance(inputs[3], cfg.instance, 2)
        layouter.constrain_instance(inputs[4], cfg.instance, 3)

    def _load_advice(self, layouter, board_state, commitment, shot_commitment, hit):
        cfg = self.config

        def region_fn(region):
            cells = [
                region.assign_advice("assign board state", cfg.advice[4], 0, board_state),
                region.assign_advice("assign commitment x", cfg.advice[4], 1, commitment[0]),
                region.assign_advice("assign commitment y", cfg.advice[4], 2, commitment[1]),
                region.assign_advice("assign shot commitment", cfg.advice[4], 3, shot_commitment),
                region.assign_advice("assign hit assertion", cfg.advice[4], 4, hit),
            ]
            region.enable_selector("hit bool", cfg.s_hit_bool, 4)
            return cells

        return layouter.assign_region("load private ShotChip advice values", region_fn)

    def _decompose(self, layouter, nums, bits):
        board_bits = Num2BitsChip(nums[0], bits[0]).synthesize(self.config.num2bits[0], layouter)
        shot_bits = Num2BitsChip(nums[1], bits[1]).synthesize(self.config.num2bits[1], layouter)
        return [board_bits, shot_bits]

    def _running_sums(self, layouter, bits, trace):
        cfg = self.config

        def region_fn(region):
            region.assign_advice_from_constant("pad bit sum column", cfg.advice[7], 0, 0)
            region.assign_advice_from_constant("pad shot hit sum column", cfg.advice[8], 0, 0)
            shot_sum = hit_sum = None
            for i in range(BOARD_SIZE):
                bits[0][i].copy_advice(f"copy board bit {i}", region, cfg.advice[5], i + 1)
                bits[1][i].copy_advice(f"copy shot bit {i}", region, cfg.advice[6], i + 1)
                shot_sum = region.assign_advice(f"shot bit count sum {i}", cfg.advice[7], i + 1, trace[0][i])
                hit_sum = region.assign_advice(f"board hit count sum {i}", cfg.advice[8], i + 1, trace[1][i])
                region.enable_selector("running sum", cfg.s_running_sum, i + 1)
            return [shot_sum, hit_sum]

        return layouter.assign_region("shot running sum", region_fn)

    def _running_sum_output(self, layouter, hit, output):
        cfg = self.config

        def region_fn(region):
            hit.copy_advice("permute hit assertion", region, cfg.advice[5], 0)
            output[0].copy_advice("permute shot bit count", region, cfg.advice[6], 0)
            output[1].copy_advice("permute board hits by shot count", region, cfg.advice[7], 0)
            region.enable_selector("output", cfg.s_output, 0)

        layouter.assign_region("shot running sum output checks", region_fn)

    def _commit_board(self, layouter, board_state_cell, trapdoor):
        chip = PedersenCommitmentChip(self.config.pedersen)
        return chip.synthesize(layouter, board_state_cell, trapdoor)


class ShotCircuit(Circuit):
    """Circuit wrapper (src/circuits/shot.rs:15-78). k = 11."""

    K = 11

    def __init__(self, board: BinaryValue, trapdoor: int, shot: BinaryValue, hit: BinaryValue):
        self.board = board
        self.trapdoor = trapdoor
        self.shot = shot
        self.hit = hit

    @classmethod
    def configure(cls, cs: ConstraintSystem) -> ShotConfig:
        return ShotChip.configure(cs)

    def synthesize(self, config: ShotConfig, layouter: Layouter):
        ShotChip(config).synthesize(layouter, self.board, self.trapdoor, self.shot, self.hit)

    def without_witnesses(self) -> "ShotCircuit":
        return ShotCircuit(BinaryValue(1), 1, BinaryValue(1), BinaryValue(1))

    def public_instance(self) -> list[int]:
        """[commitment_x, commitment_y, shot, hit] (shot.rs:349-352)."""
        commitment = pedersen_commit(self.board.lower_u128(), self.trapdoor)
        cx, cy = commitment if commitment is not None else (0, 0)
        return [cx, cy, self.shot.lower_u128(), self.hit.lower_u128()]
