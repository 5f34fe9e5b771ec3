"""Device (JAX) Pasta curve arithmetic on limb vectors — Jacobian coordinates.

TPU-native point kernels (SURVEY.md §7.1 item 2): a point batch is a
(JacobianPoint) pytree of three (..., 16) uint32 limb arrays in Montgomery
form. The group law is branchless — all candidate results (add, double,
identity, passthrough) are computed and lane-selected — so everything maps
onto the VPU with static shapes. The identity is encoded as Z == 0.

Golden-tested against curves/host.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..fields import limb as L
from ..fields.limb import FieldSpec, int_to_limbs


class JacobianPoint(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray


def infinity(spec: FieldSpec, shape=(), cst=None) -> JacobianPoint:
    one = L._cst(spec, cst).one_mont if cst is not None else jnp.asarray(spec.one_mont)
    one = jnp.broadcast_to(one, shape + (L.NLIMBS,))
    zero = jnp.zeros(shape + (L.NLIMBS,), dtype=jnp.uint32)
    return JacobianPoint(one, one, zero)


def affine_to_jacobian_host(spec: FieldSpec, points) -> JacobianPoint:
    """Host helper: list of affine points (or None) -> device Jacobian batch
    in Montgomery form."""
    r = spec.r_mod_p
    m = spec.modulus
    xs, ys, zs = [], [], []
    for p in points:
        if p is None:
            xs.append(int_to_limbs(r))  # arbitrary; z = 0 marks identity
            ys.append(int_to_limbs(r))
            zs.append(int_to_limbs(0))
        else:
            xs.append(int_to_limbs(p[0] * r % m))
            ys.append(int_to_limbs(p[1] * r % m))
            zs.append(int_to_limbs(r))
    return JacobianPoint(jnp.asarray(np.stack(xs)), jnp.asarray(np.stack(ys)), jnp.asarray(np.stack(zs)))


def jacobian_to_affine_host(spec: FieldSpec, pt: JacobianPoint):
    """Host helper: device Jacobian batch -> list of affine points/None."""
    field = spec.host
    xs = np.asarray(L.from_mont(spec, pt.x))
    ys = np.asarray(L.from_mont(spec, pt.y))
    zs = np.asarray(L.from_mont(spec, pt.z))
    out = []
    for i in range(xs.shape[0]):
        z = L.limbs_to_int(zs[i])
        if z == 0:
            out.append(None)
            continue
        zi = field.inv(z)
        zi2 = zi * zi % field.modulus
        x = L.limbs_to_int(xs[i]) * zi2 % field.modulus
        y = L.limbs_to_int(ys[i]) * zi2 % field.modulus * zi % field.modulus
        out.append((x, y))
    return out


def select_point(cond, a: JacobianPoint, b: JacobianPoint) -> JacobianPoint:
    """cond (...,) bool: a where true else b."""
    return JacobianPoint(
        L.select(cond, a.x, b.x), L.select(cond, a.y, b.y), L.select(cond, a.z, b.z)
    )


def point_double(spec: FieldSpec, p: JacobianPoint, cst=None) -> JacobianPoint:
    """2P, a = 0 short Weierstrass ('dbl-2009-l'). Identity-safe (Z=0 -> Z3=0)."""
    mul = lambda a, b: L.mont_mul(spec, a, b, cst)
    add = lambda a, b: L.add(spec, a, b, cst)
    sub = lambda a, b: L.sub(spec, a, b, cst)
    A = mul(p.x, p.x)
    B = mul(p.y, p.y)
    C = mul(B, B)
    t = sub(sub(mul(add(p.x, B), add(p.x, B)), A), C)
    D = add(t, t)  # 2*((X+B)^2 - A - C)
    E = add(add(A, A), A)  # 3A
    F = mul(E, E)
    X3 = sub(F, add(D, D))
    eight_c = add(C, C)
    eight_c = add(eight_c, eight_c)
    eight_c = add(eight_c, eight_c)
    Y3 = sub(mul(E, sub(D, X3)), eight_c)
    yz = mul(p.y, p.z)
    Z3 = add(yz, yz)
    return JacobianPoint(X3, Y3, Z3)


def point_add_mixed(spec: FieldSpec, p: JacobianPoint, qx, qy, q_inf, cst=None) -> JacobianPoint:
    """P + Q with Q affine ((..., 16) coords + (...) bool infinity flag) —
    'madd-2007-bl' specialization (Z2 = 1): ~13 field muls vs ~18 for the
    general add. Fully branchless; handles identity/doubling/inverse the
    same way as point_add."""
    mul = lambda a, b: L.mont_mul(spec, a, b, cst)
    add = lambda a, b: L.add(spec, a, b, cst)
    sub = lambda a, b: L.sub(spec, a, b, cst)

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
    added = JacobianPoint(X3, Y3, Z3)

    doubled = point_double(spec, p, cst)

    p_inf = L.is_zero(p.z)
    h_zero = L.is_zero(h)
    r_zero = L.is_zero(r)

    one = L._cst(spec, cst).one_mont if cst is not None else jnp.asarray(spec.one_mont)
    qz = L.select(q_inf, jnp.zeros_like(qx), jnp.broadcast_to(one, qx.shape).astype(jnp.uint32))
    q_jac = JacobianPoint(qx, qy, qz)
    inf = infinity(spec, p.x.shape[:-1], cst)
    out = select_point(h_zero & r_zero, doubled, added)
    out = select_point(h_zero & ~r_zero, inf, out)
    out = select_point(q_inf, p, out)
    out = select_point(p_inf, q_jac, out)
    return out


def point_add_mixed_incomplete(spec: FieldSpec, p: JacobianPoint, qx, qy, q_inf, cst=None):
    """P + Q (Q affine) WITHOUT the doubling branch: ~11 field muls vs ~21
    for the complete mixed add (which evaluates point_double every lane).

    Returns (result, needs_double): identity and inverse cases are handled
    branchlessly; the P == Q case (h == 0, r == 0) yields garbage and sets
    the flag instead. Pippenger bucket runs over DISTINCT points hit that
    case only if a partial bucket sum collides with the next point — finding
    such scalars is a discrete-log relation among SRS points — so callers
    run this fast path, check the (exact) flag, and redo with the complete
    formula on the astronomically-rare hit (ops/msm.py)."""
    mul = lambda a, b: L.mont_mul(spec, a, b, cst)
    add = lambda a, b: L.add(spec, a, b, cst)
    sub = lambda a, b: L.sub(spec, a, b, cst)

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
    added = JacobianPoint(X3, Y3, Z3)

    p_inf = L.is_zero(p.z)
    h_zero = L.is_zero(h)
    r_zero = L.is_zero(r)
    needs_double = h_zero & r_zero & ~p_inf & ~q_inf

    one = L._cst(spec, cst).one_mont if cst is not None else jnp.asarray(spec.one_mont)
    qz = L.select(q_inf, jnp.zeros_like(qx), jnp.broadcast_to(one, qx.shape).astype(jnp.uint32))
    q_jac = JacobianPoint(qx, qy, qz)
    inf = infinity(spec, p.x.shape[:-1], cst)
    out = select_point(h_zero & ~r_zero, inf, added)
    out = select_point(q_inf, p, out)
    out = select_point(p_inf, q_jac, out)
    return out, needs_double


def point_add(spec: FieldSpec, p: JacobianPoint, q: JacobianPoint, cst=None) -> JacobianPoint:
    """P + Q, fully general (handles identity, doubling, inverse) via lane
    selection ('add-2007-bl' + candidates)."""
    mul = lambda a, b: L.mont_mul(spec, a, b, cst)
    add = lambda a, b: L.add(spec, a, b, cst)
    sub = lambda a, b: L.sub(spec, a, b, cst)

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
    added = JacobianPoint(X3, Y3, Z3)

    doubled = point_double(spec, p, cst)

    p_inf = L.is_zero(p.z)
    q_inf = L.is_zero(q.z)
    h_zero = L.is_zero(h)
    r_zero = L.is_zero(r)

    # default: added; if H==0 and r==0: doubled; if H==0 and r!=0: infinity
    inf = infinity(spec, p.x.shape[:-1], cst)
    out = select_point(h_zero & r_zero, doubled, added)
    out = select_point(h_zero & ~r_zero, inf, out)
    out = select_point(q_inf, p, out)
    out = select_point(p_inf, q, out)
    return out
