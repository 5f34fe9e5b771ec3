"""Transposed-layout (limb-major) curve arithmetic: points as (16, N) limb
arrays (see fields/limb_t.py for the layout rationale). Same branchless
Jacobian formulas as curves/limb.py; used by the fused Pallas MSM kernels.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..fields import limb_t as T


class JacobianPointT(NamedTuple):
    x: jnp.ndarray  # (16, N)
    y: jnp.ndarray
    z: jnp.ndarray


def infinity(cst, n: int) -> JacobianPointT:
    one = jnp.broadcast_to(jnp.asarray(cst["one_col"]), (16, n)).astype(jnp.uint32)
    return JacobianPointT(one, one, jnp.zeros((16, n), jnp.uint32))


def select_point(cond, a: JacobianPointT, b: JacobianPointT) -> JacobianPointT:
    """cond: (1, N) bool."""
    return JacobianPointT(
        T.select(cond, a.x, b.x), T.select(cond, a.y, b.y), T.select(cond, a.z, b.z)
    )


def point_double(cst, p: JacobianPointT) -> JacobianPointT:
    """2P, a = 0 ('dbl-2009-l'); identity-safe."""
    mul, add, sub = (
        lambda a, b: T.mont_mul_sel(cst, a, b),
        lambda a, b: T.add(cst, a, b),
        lambda a, b: T.sub(cst, a, b),
    )
    A = mul(p.x, p.x)
    B = mul(p.y, p.y)
    C = mul(B, B)
    xb = add(p.x, B)
    t = sub(sub(mul(xb, xb), A), C)
    D = add(t, t)
    E = add(add(A, A), A)
    F = mul(E, E)
    X3 = sub(F, add(D, D))
    eight_c = add(C, C)
    eight_c = add(eight_c, eight_c)
    eight_c = add(eight_c, eight_c)
    Y3 = sub(mul(E, sub(D, X3)), eight_c)
    yz = mul(p.y, p.z)
    Z3 = add(yz, yz)
    return JacobianPointT(X3, Y3, Z3)


def point_add(cst, p: JacobianPointT, q: JacobianPointT) -> JacobianPointT:
    """P + Q, fully general ('add-2007-bl' + branchless candidates)."""
    mul, add, sub = (
        lambda a, b: T.mont_mul_sel(cst, a, b),
        lambda a, b: T.add(cst, a, b),
        lambda a, b: T.sub(cst, a, b),
    )
    z1z1 = mul(p.z, p.z)
    z2z2 = mul(q.z, q.z)
    u1 = mul(p.x, z2z2)
    u2 = mul(q.x, z1z1)
    s1 = mul(mul(p.y, q.z), z2z2)
    s2 = mul(mul(q.y, p.z), z1z1)
    h = sub(u2, u1)
    r = sub(s2, s1)

    hh = mul(h, h)
    hhh = mul(h, hh)
    v = mul(u1, hh)
    r2 = mul(r, r)
    X3 = sub(sub(r2, hhh), add(v, v))
    Y3 = sub(mul(r, sub(v, X3)), mul(s1, hhh))
    Z3 = mul(mul(p.z, q.z), h)
    added = JacobianPointT(X3, Y3, Z3)

    doubled = point_double(cst, p)

    p_inf = T.is_zero(p.z)
    q_inf = T.is_zero(q.z)
    h_zero = T.is_zero(h)
    r_zero = T.is_zero(r)

    inf = infinity(cst, p.x.shape[1])
    out = select_point(h_zero & r_zero, doubled, added)
    out = select_point(h_zero & ~r_zero, inf, out)
    out = select_point(q_inf, p, out)
    out = select_point(p_inf, q, out)
    return out


def point_add_mixed_incomplete(cst, p: JacobianPointT, qx, qy, q_inf):
    """P + Q (Q affine, (16, N) coords + (1, N) bool inf flag) without the
    doubling branch: returns (result, needs_double (1, N) bool). Device twin
    of curves/limb.point_add_mixed_incomplete in the transposed layout."""
    mul, add, sub = (
        lambda a, b: T.mont_mul_sel(cst, a, b),
        lambda a, b: T.add(cst, a, b),
        lambda a, b: T.sub(cst, a, b),
    )
    z1z1 = mul(p.z, p.z)
    u2 = mul(qx, z1z1)
    s2 = mul(mul(qy, p.z), z1z1)
    h = sub(u2, p.x)
    r = sub(s2, p.y)

    hh = mul(h, h)
    hhh = mul(h, hh)
    v = mul(p.x, hh)
    r2 = mul(r, r)
    X3 = sub(sub(r2, hhh), add(v, v))
    Y3 = sub(mul(r, sub(v, X3)), mul(p.y, hhh))
    Z3 = mul(p.z, h)
    added = JacobianPointT(X3, Y3, Z3)

    p_inf = T.is_zero(p.z)
    h_zero = T.is_zero(h)
    r_zero = T.is_zero(r)
    needs_double = h_zero & r_zero & ~p_inf & ~q_inf

    one = jnp.broadcast_to(jnp.asarray(cst["one_col"]), qx.shape).astype(jnp.uint32)
    qz = jnp.where(q_inf, jnp.zeros_like(qx), one)
    q_jac = JacobianPointT(qx, qy, qz)
    inf = infinity(cst, p.x.shape[1])
    out = select_point(h_zero & ~r_zero, inf, added)
    out = select_point(q_inf, p, out)
    out = select_point(p_inf, q_jac, out)
    return out, needs_double
