"""Circuit layout rendering — dev tooling.

Framework analog of the reference's (commented-out) plotters `dev-graph`
layout rendering (src/circuits/board.rs:935-968, SURVEY.md §4): summarize a
circuit's region placement, column occupancy and row utilization as text —
useful for k-sizing and floor-planner debugging.
"""

from __future__ import annotations

from ..plonk.assignment import Assignment, Layouter
from ..plonk.circuit import ConstraintSystem


def circuit_layout(circuit, k: int) -> str:
    """Render the region map of a circuit at size 2^k."""
    cs = ConstraintSystem()
    config = type(circuit).configure(cs)
    n = 1 << k
    assignment = Assignment(cs, n)
    layouter = Layouter(assignment)
    circuit.synthesize(config, layouter)
    layouter.finalize()

    lines = [
        f"circuit layout @ k={k} (n={n}, usable={assignment.usable_rows})",
        f"columns: {cs.num_advice} advice, {cs.num_fixed} fixed, "
        f"{cs.num_instance} instance, {len(cs.selectors)} selectors, "
        f"{len(cs.gates)} gates, {len(cs.lookups)} lookups, degree {cs.degree()}",
        "",
        f"{'#':>3} {'region':<42} {'rows':>12} {'cols':>5}",
    ]
    max_row = 0
    for info in assignment.regions:
        lines.append(
            f"{info.index:>3} {info.name[:42]:<42} {info.start:>5}..{info.end:<5} {len(info.columns):>5}"
        )
        max_row = max(max_row, info.end)
    fill = 100.0 * max_row / assignment.usable_rows
    lines.append("")
    lines.append(
        f"{len(assignment.regions)} regions, max row {max_row} / {assignment.usable_rows} usable ({fill:.1f}% full)"
    )
    lines.append(f"{len(assignment.copies)} equality constraints")
    return "\n".join(lines)


def print_circuit_layout(circuit, k: int):
    print(circuit_layout(circuit, k))
