"""Selector compression (plonk/compress.py): grouping respects row
disjointness and the degree cap, indicator substitution is exact, and
compressed/uncompressed keygens both prove and verify."""

import random

from battlezips_halo2_tpu.fields import FP
from battlezips_halo2_tpu.gadgets.common import with_selector
from battlezips_halo2_tpu.pcs.ipa import Params
from battlezips_halo2_tpu.plonk import Circuit, ConstraintSystem, create_proof, keygen, verify_proof
from battlezips_halo2_tpu.plonk.compress import _indicator, plan_groups
from battlezips_halo2_tpu.plonk.expression import CellQuery, Column, ColumnType
from battlezips_halo2_tpu.plonk.keys import num_fixed_total

P = FP.modulus


class ThreeSelCircuit(Circuit):
    """Three disjoint LINEAR gates (selector-product degree 2) on separate
    rows — under the degree-3 floor (permutation argument), groups of up to
    2 selectors are allowed, so 3 selectors pack into 2 combined columns."""

    def __init__(self, x):
        self.x = x

    @classmethod
    def configure(cls, cs: ConstraintSystem):
        a = cs.advice_column()
        inst = cs.instance_column()
        cs.enable_equality(a)
        cs.enable_equality(inst)
        s1, s2, s3 = cs.selector(), cs.selector(), cs.selector()
        cs.create_gate("dbl", with_selector(s1.expr(), [("d", a.next() - 2 * a.cur())]))
        cs.create_gate("tpl", with_selector(s2.expr(), [("t", a.next() - 3 * a.cur())]))
        cs.create_gate("inc", with_selector(s3.expr(), [("i", a.next() - a.cur() - 1)]))
        return (a, inst, s1, s2, s3)

    def synthesize(self, config, layouter):
        a, inst, s1, s2, s3 = config
        x = self.x

        def region(r):
            r.enable_selector("s1", s1, 0)
            r.assign_advice("a0", a, 0, x)
            r.enable_selector("s2", s2, 1)
            r.assign_advice("a1", a, 1, 2 * x % P)
            r.enable_selector("s3", s3, 2)
            r.assign_advice("a2", a, 2, 6 * x % P)
            return r.assign_advice("a3", a, 3, (6 * x + 1) % P)

        out = layouter.assign_region("r", region)
        layouter.constrain_instance(out, inst, 0)

    def without_witnesses(self):
        return ThreeSelCircuit(0)


def test_indicator_polynomial_exact():
    col = Column(ColumnType.FIXED, 0)
    for g in (2, 3, 5):
        for slot in range(1, g + 1):
            poly = _indicator(col, slot, g)
            for x in range(g + 1):
                got = poly.evaluate(
                    constant=lambda v: v % P,
                    cell=lambda c, r: x,
                    selector=lambda s: (_ for _ in ()).throw(AssertionError),
                    add=lambda a, b: (a + b) % P,
                    mul=lambda a, b: (a * b) % P,
                    neg=lambda a: (-a) % P,
                )
                assert got == (1 if x == slot else 0)


def test_plan_groups_disjoint_and_capped():
    cs = ConstraintSystem()
    a = cs.advice_column()
    sels = [cs.selector() for _ in range(4)]
    for i, s in enumerate(sels):
        cs.create_gate(f"g{i}", with_selector(s.expr(), [("c", a.cur() * a.cur())]))
    n = 16
    vals = [[False] * n for _ in range(4)]
    vals[0][0] = True
    vals[1][0] = True  # overlaps selector 0 -> must not share its group
    vals[2][3] = True
    vals[3][4] = True
    groups = plan_groups(cs, vals, max_degree=4)
    for g in groups:
        rows: set = set()
        for s in g:
            srows = {i for i, b in enumerate(vals[s]) if b}
            assert not (rows & srows)
            rows |= srows
        # degree-3 constraints (sel * a^2): 3 - 1 + len(g) <= 4
        assert 3 - 1 + len(g) <= 4
    g_of = {s: i for i, g in enumerate(groups) for s in g}
    assert g_of[0] != g_of[1]


def test_compressed_roundtrip_and_column_count(monkeypatch):
    params = Params.new(5)
    pk = keygen(params, ThreeSelCircuit(0))
    # 3 selectors packed into fewer appended columns
    assert pk.vk.cs.num_selector_columns < 3
    assert len(pk.fixed_values) == num_fixed_total(pk.vk.cs)
    rng = random.Random(1)
    x = 5
    out = (6 * x + 1) % P
    proof = create_proof(params, pk, ThreeSelCircuit(x), [[out]], rng)
    assert verify_proof(params, pk.vk, proof, [[out]])
    assert not verify_proof(params, pk.vk, proof, [[3]])

    # uncompressed path still sound
    monkeypatch.setenv("BZ_NO_SELECTOR_COMPRESS", "1")
    pk_u = keygen(params, ThreeSelCircuit(0))
    assert pk_u.vk.cs.num_selector_columns == 3
    proof_u = create_proof(params, pk_u, ThreeSelCircuit(x), [[out]], random.Random(2))
    assert verify_proof(params, pk_u.vk, proof_u, [[out]])
