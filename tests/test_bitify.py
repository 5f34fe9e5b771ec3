"""Bitify chip tests — mirrors the reference's 9 inline tests
(src/chips/bitify.rs:406-531): decomposition/composition of small, max-field,
>field (254-bit), zero, and real-ship values, plus the negative permutation
test with exact structured-failure matching."""

import pytest

from battlezips_halo2_tpu.dev import MockProver, Permutation
from battlezips_halo2_tpu.fields import FP
from battlezips_halo2_tpu.gadgets.bitify import Bits2NumChip, Num2BitsChip
from battlezips_halo2_tpu.plonk import Circuit, ConstraintSystem
from battlezips_halo2_tpu.utils import BinaryValue, Ship, ShipType


class _TestConfig:
    def __init__(self, bitify, bits):
        self.bitify = bitify
        self.bits = bits


def _configure(cs: ConstraintSystem, chip_cls):
    bits = cs.advice_column()
    lc1 = cs.advice_column()
    e2 = cs.advice_column()
    fixed = cs.fixed_column()
    for col in (bits, lc1, e2):
        cs.enable_equality(col)
    cs.enable_constant(fixed)
    return _TestConfig(chip_cls.configure(cs, bits, lc1, e2, fixed), bits)


class Num2BitsCircuit(Circuit):
    """Harness: witness a value in a 'trace' region, decompose with Num2Bits
    (mirrors src/chips/bitify.rs:262-341)."""

    def __init__(self, value: int, binary: BinaryValue, nbits: int):
        self.value = value
        self.binary = binary
        self.nbits = nbits

    @classmethod
    def configure(cls, cs):
        return _configure(cs, Num2BitsChip)

    def synthesize(self, config, layouter):
        value = layouter.assign_region(
            "trace", lambda region: region.assign_advice("value", config.bits, 0, self.value)
        )
        chip = Num2BitsChip(value, self.binary.bitfield(self.nbits))
        chip.synthesize(config.bitify, layouter)

    def without_witnesses(self):
        return Num2BitsCircuit(0, BinaryValue.empty(), self.nbits)


class Bits2NumCircuit(Circuit):
    def __init__(self, value: int, binary: BinaryValue, nbits: int):
        self.value = value
        self.binary = binary
        self.nbits = nbits

    @classmethod
    def configure(cls, cs):
        return _configure(cs, Bits2NumChip)

    def synthesize(self, config, layouter):
        bits = self.binary.bitfield(self.nbits)

        def trace(region):
            return [region.assign_advice("bit", config.bits, i, b) for i, b in enumerate(bits)]

        assigned = layouter.assign_region("trace", trace)
        chip = Bits2NumChip(self.value, assigned)
        chip.synthesize(config.bitify, layouter)

    def without_witnesses(self):
        return Bits2NumCircuit(0, BinaryValue.empty(), self.nbits)


VALUE = 1311768467294899695  # 0x01234567890abcdef (bitify.rs:407)


def test_num_to_bits():
    prover = MockProver.run(9, Num2BitsCircuit(VALUE, BinaryValue(VALUE), 256), [])
    assert prover.verify() == []


def test_bits_to_num():
    prover = MockProver.run(10, Bits2NumCircuit(VALUE, BinaryValue(VALUE), 256), [])
    assert prover.verify() == []


def test_num_to_bits_big():
    value = FP.modulus - 1
    prover = MockProver.run(9, Num2BitsCircuit(value, BinaryValue(value), 256), [])
    assert prover.verify() == []


def test_bits_to_num_big():
    value = FP.modulus - 1
    prover = MockProver.run(10, Bits2NumCircuit(value, BinaryValue(value), 256), [])
    assert prover.verify() == []


def test_bits_to_num_big_plus():
    """254-bit slice of p-1: composes to p-1 truncated mod 2^254
    (bitify.rs:460-474: claimed value 0, bits of p-1 truncated to 254 bits —
    p-1 has bits 254/255 clear... the reference asserts Ok with value=0?
    No: 0x40..00 = p-1 is 255 bits; low 254 bits of p-1 compose to
    p-1 - 2^254, and the claimed value is NOT constrained by Bits2Num, so
    the circuit passes regardless)."""
    value_bytes = bytes.fromhex("40000000000000000000000000000000224698fc094cf91b992d30ed00000000")[::-1]
    binary = BinaryValue.from_repr(value_bytes)
    prover = MockProver.run(10, Bits2NumCircuit(0, binary, 254), [])
    assert prover.verify() == []


def test_num_to_bits_zero_value():
    prover = MockProver.run(9, Num2BitsCircuit(0, BinaryValue.empty(), 254), [])
    assert prover.verify() == []


def test_bits_to_num_zero_value():
    prover = MockProver.run(10, Bits2NumCircuit(0, BinaryValue.empty(), 254), [])
    assert prover.verify() == []


def test_battlezips():
    """Ship-placement bits through Num2Bits (bitify.rs:495-531), including
    the tampered-value negative case with exact failure structure."""
    ship = Ship(ShipType.CARRIER, 4, 3, True)
    bits = ship.bits(True)
    value = bits.to_fp()

    prover = MockProver.run(9, Num2BitsCircuit(value, bits, 100), [])
    assert prover.verify() == []

    # increment the claimed value: the equality constraint between the trace
    # cell and the final accumulator must fail on both ends
    prover = MockProver.run(9, Num2BitsCircuit(FP.add(value, 1), bits, 100), [])
    failures = prover.verify()
    assert len(failures) == 2
    assert all(isinstance(f, Permutation) for f in failures)
    locs = {(f.location.region.index, f.location.region.name, f.location.offset) for f in failures}
    assert locs == {(0, "trace", 0), (1, "num2bits", 100)}
