"""Batched BLS12-377 G1 arithmetic over Fq limb tensors (JAX).

TPU-native equivalent of ark-ec's projective G1 ops (SURVEY.md §2b: "G1 point
add/double in Jacobian coords over 377-bit Fq as limb tensors"). Points are
pytrees (X, Y, Z) of [..., 24] uint32 Montgomery-form limb tensors; Z == 0
encodes infinity. The unified `add` is branchless: it evaluates the general
and doubling formulas and selects per lane, so it is safe inside
`associative_scan` / `fori_loop` (msm_jax.py).

Bit-exact against ops/curve_host.AffinePoint (tests/test_msm_jax.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .curve_host import AffinePoint, g1_infinity, g1_point
from .field_jax import FieldOps, fq_ops
from .limbs import from_mont, to_mont


class JacPoint(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray


def _is_inf(p: JacPoint) -> jnp.ndarray:
    return jnp.all(p.z == 0, axis=-1)


def jac_infinity(batch_shape: Tuple[int, ...] = ()) -> JacPoint:
    L = fq_ops().L
    z = jnp.zeros(batch_shape + (L,), jnp.uint32)
    return JacPoint(z, z, z)


def jac_double(p: JacPoint, ops: FieldOps | None = None) -> JacPoint:
    """Jacobian doubling, a = 0 curve (y^2 = x^3 + 1)."""
    f = ops or fq_ops()
    a = f.mul(p.x, p.x)                  # X1^2
    b = f.mul(p.y, p.y)                  # Y1^2
    c = f.mul(b, b)                      # B^2
    t = f.add(p.x, b)
    d = f.sub(f.sub(f.mul(t, t), a), c)
    d = f.add(d, d)                      # 2((X1+B)^2 - A - C)
    e = f.add(f.add(a, a), a)            # 3A
    ff = f.mul(e, e)
    x3 = f.sub(ff, f.add(d, d))
    c8 = f.add(c, c)
    c8 = f.add(c8, c8)
    c8 = f.add(c8, c8)
    y3 = f.sub(f.mul(e, f.sub(d, x3)), c8)
    z3 = f.mul(f.add(p.y, p.y), p.z)
    # doubling a point with y = 0 gives infinity; on this curve y=0 points
    # are not in the subgroup, but infinity itself must stay fixed
    inf = _is_inf(p)
    zero = jnp.zeros_like(x3)
    return JacPoint(
        f.select(inf, zero, x3), f.select(inf, zero, y3), f.select(inf, zero, z3)
    )


def jac_add(p: JacPoint, q: JacPoint, ops: FieldOps | None = None) -> JacPoint:
    """Unified branchless Jacobian addition (handles O, P==Q, P==-Q)."""
    f = ops or fq_ops()
    z1z1 = f.mul(p.z, p.z)
    z2z2 = f.mul(q.z, q.z)
    u1 = f.mul(p.x, z2z2)
    u2 = f.mul(q.x, z1z1)
    s1 = f.mul(f.mul(p.y, q.z), z2z2)
    s2 = f.mul(f.mul(q.y, p.z), z1z1)
    h = f.sub(u2, u1)
    r = f.sub(s2, s1)
    h2 = f.mul(h, h)
    h3 = f.mul(h, h2)
    v = f.mul(u1, h2)
    r2 = f.mul(r, r)
    x3 = f.sub(f.sub(r2, h3), f.add(v, v))
    y3 = f.sub(f.mul(r, f.sub(v, x3)), f.mul(s1, h3))
    z3 = f.mul(f.mul(p.z, q.z), h)
    general = JacPoint(x3, y3, z3)

    dbl = jac_double(p, f)
    p_inf = _is_inf(p)
    q_inf = _is_inf(q)
    x_eq = jnp.all(h == 0, axis=-1)
    y_eq = jnp.all(r == 0, axis=-1)
    both = jnp.logical_and(jnp.logical_not(p_inf), jnp.logical_not(q_inf))
    is_dbl = jnp.logical_and(both, jnp.logical_and(x_eq, y_eq))
    is_neg = jnp.logical_and(both, jnp.logical_and(x_eq, jnp.logical_not(y_eq)))

    def sel(c, a, b):
        return f.select(c, a, b)

    out_x = sel(p_inf, q.x, sel(q_inf, p.x, sel(is_dbl, dbl.x, general.x)))
    out_y = sel(p_inf, q.y, sel(q_inf, p.y, sel(is_dbl, dbl.y, general.y)))
    out_z = sel(p_inf, q.z, sel(q_inf, p.z, sel(is_dbl, dbl.z, general.z)))
    zero = jnp.zeros_like(out_z)
    out_z = sel(is_neg, zero, out_z)
    return JacPoint(out_x, out_y, out_z)


# ---------------------------------------------------------------------------
# host <-> device conversion
# ---------------------------------------------------------------------------


def affine_to_device(points) -> JacPoint:
    """List of host AffinePoints -> batched Jacobian limb tensors."""
    ctx = fq_ops().ctx
    xs, ys, zs = [], [], []
    for p in points:
        if p.inf:
            xs.append(0)
            ys.append(0)
            zs.append(0)
        else:
            xs.append(p.x)
            ys.append(p.y)
            zs.append(1)
    return JacPoint(
        jnp.asarray(to_mont(ctx, xs)),
        jnp.asarray(to_mont(ctx, ys)),
        jnp.asarray(to_mont(ctx, zs)),
    )


def device_to_affine(p: JacPoint):
    """Batched Jacobian -> list of host AffinePoints (host inversion)."""
    from .field_params import Q_MOD, inv_mod

    ctx = fq_ops().ctx
    xs = from_mont(ctx, np.asarray(p.x))
    ys = from_mont(ctx, np.asarray(p.y))
    zs = from_mont(ctx, np.asarray(p.z))
    out = []
    for x, y, z in zip(xs, ys, zs):
        if z == 0:
            out.append(g1_infinity())
        else:
            zi = inv_mod(z, Q_MOD)
            zi2 = zi * zi % Q_MOD
            out.append(g1_point(x * zi2 % Q_MOD, y * zi2 % Q_MOD * zi % Q_MOD))
    return out
