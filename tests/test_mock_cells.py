"""MockProver CellNotAssigned detection (halo2 ``VerifyFailure::
CellNotAssigned``): a gate whose selector is enabled must have every queried
advice cell assigned at that row."""

from battlezips_halo2_tpu.dev import MockProver
from battlezips_halo2_tpu.dev.failures import CellNotAssigned
from battlezips_halo2_tpu.plonk import Circuit, ConstraintSystem


class _Config:
    def __init__(self, a, b, sel):
        self.a = a
        self.b = b
        self.sel = sel


class _GapCircuit(Circuit):
    """Gate: sel * (a - b) == 0. With ``assign_b=False`` the selector fires
    on a row whose b cell was never assigned — the dense matrix defaults it
    to 0 and the gate would pass silently (a=0), which is exactly the bug
    class CellNotAssigned exists to catch."""

    def __init__(self, assign_b: bool):
        self.assign_b = assign_b

    @classmethod
    def configure(cls, cs: ConstraintSystem):
        a = cs.advice_column()
        b = cs.advice_column()
        sel = cs.selector()
        cs.create_gate("eq", [("a=b", sel.expr() * (a.cur() - b.cur()))])
        return _Config(a, b, sel)

    def synthesize(self, config, layouter):
        def trace(region):
            region.enable_selector("sel", config.sel, 0)
            region.assign_advice("a", config.a, 0, 0)
            if self.assign_b:
                region.assign_advice("b", config.b, 0, 0)

        layouter.assign_region("gap", trace)

    def without_witnesses(self):
        return _GapCircuit(self.assign_b)


def test_unassigned_queried_cell_reported():
    failures = MockProver.run(4, _GapCircuit(assign_b=False), []).verify()
    cells = [f for f in failures if isinstance(f, CellNotAssigned)]
    assert len(cells) == 1
    f = cells[0]
    assert f.gate.name == "eq" and f.gate_offset == 0 and f.rotation == 0
    assert f.region is not None and f.region.name == "gap"


def test_fully_assigned_row_clean():
    assert MockProver.run(4, _GapCircuit(assign_b=True), []).verify() == []
