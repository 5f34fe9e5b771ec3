"""Battleship domain layer: ships, decks, boards, witnesses, shots.

Mirrors the semantics pinned by the reference (src/utils/): coordinate
serialization with the vertical-transpose rule, witness ordering, the five
malicious witness generators, zip overlap detection, and shot encoding.
"""

import pytest

from battlezips_halo2_tpu.utils import (
    BOARD_SIZE,
    BinaryValue,
    Board,
    Deck,
    Ship,
    ShipType,
    WitnessOption,
    serialize,
)


def valid_deck():
    # the reference's canonical valid placement (src/circuits/board.rs:100-107)
    return Deck.from_placements([(3, 3, True), (5, 4, False), (0, 1, False), (0, 5, True), (6, 1, False)])


class TestBinaryValue:
    def test_repr_roundtrip(self):
        v = BinaryValue(123456789)
        assert BinaryValue.from_repr(v.to_repr()) == v

    def test_bitfield(self):
        v = BinaryValue(0b1011)
        assert v.bitfield(5) == [1, 1, 0, 1, 0]

    def test_zip_overlap_fails(self):
        a = BinaryValue(0b110)
        b = BinaryValue(0b011)
        with pytest.raises(ValueError, match="zip"):
            a.zip(b)
        assert a.zip(BinaryValue(0b001)).value == 0b111

    def test_lower_u128(self):
        v = BinaryValue((1 << 200) | 7)
        assert v.lower_u128() == 7


class TestShip:
    def test_lengths(self):
        assert [t.length for t in ShipType] == [5, 4, 3, 3, 2]

    def test_horizontal_coordinates(self):
        ship = Ship(ShipType.DESTROYER, 2, 3, False)
        assert ship.coordinates(False) == [32, 33]
        assert ship.coordinates(True) == [32, 33]

    def test_vertical_coordinates_transposed(self):
        # vertical ships serialize as x*10 + y when transposed (ship.rs:147-161)
        ship = Ship(ShipType.DESTROYER, 2, 3, True)
        assert ship.coordinates(False) == [32, 42]
        assert ship.coordinates(True) == [23, 24]

    def test_default_witness_orientation(self):
        h = Ship(ShipType.CRUISER, 0, 0, False).witness()
        assert h[0].value != 0 and h[1].value == 0
        v = Ship(ShipType.CRUISER, 0, 0, True).witness()
        assert v[0].value == 0 and v[1].value != 0

    def test_malicious_witnesses(self):
        ship = Ship(ShipType.BATTLESHIP, 2, 2, False)
        honest = ship.witness()[0]
        assert honest.popcount() == 4

        dual = ship.witness(WitnessOption.DUAL_PLACEMENT)
        assert dual[0].popcount() == 3 and dual[1].popcount() == 1

        noncon = ship.witness(WitnessOption.NONCONSECUTIVE)[0]
        assert noncon.popcount() == 4 and noncon != honest

        extra = ship.witness(WitnessOption.EXTRA_BIT)[0]
        assert extra.popcount() == 5 and extra.bit(0)

        over = ship.witness(WitnessOption.OVERSIZED)[0]
        assert over.popcount() == 5 and not over.bit(0)

        under = ship.witness(WitnessOption.UNDERSIZED)[0]
        assert under.popcount() == 3


class TestBoard:
    def test_state_merges_and_transposes(self):
        board = Board.from_deck(valid_deck())
        state = board.state()
        # 5+4+3+3+2 = 17 cells occupied on a valid board
        assert state.popcount() == 17

    def test_witness_order(self):
        board = Board.from_deck(valid_deck())
        w = board.witness()
        assert len(w) == 10
        # [H5, V5, H4, V4, ...]: carrier is vertical in this deck
        assert w[0].value == 0 and w[1].popcount() == 5
        assert w[2].popcount() == 4 and w[3].value == 0

    def test_double_place_fails(self):
        board = Board.from_deck(valid_deck())
        with pytest.raises(ValueError):
            board.place(Ship(ShipType.CARRIER, 0, 0, False))

    def test_state_matches_zip_of_witness(self):
        board = Board.from_deck(valid_deck())
        w = board.witness()
        acc = BinaryValue.empty()
        for h, v in zip(w[0::2], w[1::2]):
            acc = acc.zip(h.zip(BinaryValue.from_bits([v.bit(i % 10 * 10 + i // 10) for i in range(BOARD_SIZE)])))
        assert acc == board.state()

    def test_render(self):
        text = Board.from_deck(valid_deck()).render()
        assert "(X)" in text and len(text.splitlines()) == 13


class TestShot:
    def test_single_shot(self):
        assert serialize([3], [5]).value == 1 << 53

    def test_multi_shot_for_tests_only(self):
        v = serialize([0, 1], [0, 0])
        assert v.popcount() == 2
