"""Exact Lagrange interpolation over a prime field.

Framework analog of ``halo2_proofs::arithmetic::lagrange_interpolate``, which
the reference calls *during gate construction* to build the placement chip's
window-indicator polynomial (src/chips/placement.rs:4,196). Host-side and
small-degree (<= 6 points in practice), so plain Python ints are the right
tool; the device NTT handles large interpolations via iFFT instead.
"""

from __future__ import annotations

from ..fields.host import FP, Field


def lagrange_interpolate(points: list[int], evals: list[int], field: Field = FP) -> list[int]:
    """Coefficients (ascending order) of the unique degree < n polynomial
    with poly(points[i]) == evals[i]."""
    assert len(points) == len(evals)
    m = field.modulus
    n = len(points)
    coeffs = [0] * n
    for i in range(n):
        # basis_i(x) = prod_{j != i} (x - x_j) / (x_i - x_j)
        denom = 1
        for j in range(n):
            if j != i:
                denom = denom * (points[i] - points[j]) % m
        scale = evals[i] * field.inv(denom) % m
        # expand prod_{j != i} (x - x_j)
        basis = [1]
        for j in range(n):
            if j == i:
                continue
            new = [0] * (len(basis) + 1)
            for d, c in enumerate(basis):
                new[d] = (new[d] - c * points[j]) % m
                new[d + 1] = (new[d + 1] + c) % m
            basis = new
        for d, c in enumerate(basis):
            coeffs[d] = (coeffs[d] + scale * c) % m
    return coeffs


def eval_poly(coeffs: list[int], x: int, field: Field = FP) -> int:
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % field.modulus
    return acc
