"""Gather-free batched trajectory-state evaluation — the swept-SDF hot path.

``PolyTraj.pvaj`` gathers the located piece's (6, 3) coefficient block per
query (coeffs[idx]); on TPU that gather scalarizes and throttles the zoom
refinement to ~10⁷ evals/s while the surrounding elementwise chain
(flatness + rotation + SDF) sustains ~10¹⁰.  This module evaluates **all N
pieces** with one einsum — a (PK, 6)×(6, N·3) matmul the MXU eats — and
selects the located piece by a one-hot contraction.  N× more FLOPs, zero
gathers: orders of magnitude faster for the N ≤ 32 regime.

Numerically identical to the gather path (tests assert parity); local times
are clamped per piece to keep unselected-piece monomials bounded.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from isdf_tpu.core import flatness as fl
from isdf_tpu.core.so3 import quat_to_rot

# β factor/power tables, generic in coefficient count (poly.deriv_tables);
# kept as the 6-coefficient instances for the s=3 workhorse's importers.
from isdf_tpu.core.poly import deriv_tables

_FACT, _POW = deriv_tables(6)
_FACT, _POW = _FACT[:4], _POW[:4]


def pvaj_all(traj, t, n_orders: int = 4):
    """pos/vel/acc[/jerk] at global times t (any shape), gather-free.

    Returns n_orders arrays of shape t.shape + (3,), zero-padded to 4 when
    n_orders < 4 (the pose map never reads jerk; computing it is pure
    bandwidth waste in the zoom hot loop).
    """
    dtype = t.dtype
    durations = traj.durations.astype(dtype)
    cum = jnp.cumsum(durations)
    starts = cum - durations
    N = durations.shape[0]

    tc = jnp.clip(t, 0.0, cum[-1])
    # piece index by explicit comparison count (NOT searchsorted: batched
    # searchsorted with a per-scenario `cum` lowers to a gather-based binary
    # search under vmap — catastrophically slow on TPU; N comparisons
    # vectorize perfectly)
    tcs = jax.lax.stop_gradient(tc)[..., None]               # t.shape + (1,)
    idx = jnp.clip(
        jnp.sum((tcs > cum).astype(jnp.int32), axis=-1), 0, N - 1
    )
    oh = jax.nn.one_hot(idx, N, dtype=dtype)                 # t.shape + (N,)

    s = t[..., None] - starts                                 # t.shape + (N,)
    s = jnp.clip(s, 0.0, durations)
    n_coef = traj.coeffs.shape[1]
    fact_tab, pow_tab = deriv_tables(n_coef)
    one = jnp.ones_like(s)
    pows = [one]
    for _ in range(n_coef - 1):
        pows.append(pows[-1] * s)
    P6 = jnp.stack(pows, axis=-1)                             # (..., N, n_coef)

    coeffs = traj.coeffs.astype(dtype)                        # (N, n_coef, 3)
    outs = []
    for d in range(n_orders):
        d = min(d, n_coef)
        fact = jnp.asarray(fact_tab[d], dtype)
        b = fact * P6[..., pow_tab[d]]                        # (..., N, n_coef)
        per_piece = (b[..., None] * coeffs).sum(-2)           # (..., N, 3)
        outs.append((oh[..., None] * per_piece).sum(-2))
    while len(outs) < 4:
        outs.append(jnp.zeros_like(outs[0]))
    return tuple(outs)


def sdf_at_time_fast(shape, traj, params, p_eva, t):
    """Batched body SDF at trajectory time(s) — gather-free twin of
    sweep_sdf.sdf_at_time.  p_eva broadcasts against t (e.g. (P, 1, 3) vs
    (P, K)).  Only orders 0-2 are evaluated (tilt needs vel/acc, SE(2)
    needs pos)."""
    pos, vel, acc, jer = pvaj_all(traj, t, n_orders=3)
    pos3, R = fl.pose_of(pos, vel, acc, jer, params)
    p_rel = jnp.einsum("...ji,...j->...i", R, p_eva - pos3)
    return shape.sdf(p_rel)


# ===========================================================================
# Transposed (structure-of-arrays) hot path
#
# All arrays keep the LARGE query dimension minor-most so TPU vector lanes
# are fully utilized; components travel as separate arrays instead of a
# trailing (..., 3) axis (which would put 3 elements in 128 lanes — measured
# 25×+ slower, BASELINE.md "sweep kernel measurements").  Numerics: Horner
# evaluation per piece (vs power-basis contraction) — identical to ~1 ulp.
# ===========================================================================


def pvaj_components(traj, t, n_orders: int = 3):
    """pos/vel/acc[/jerk] components at global times t (any shape, large dim
    minor).  Returns ``n_orders`` 3-tuples of arrays shaped like t.

    Gather-free: unrolls the (static) piece loop, accumulating each piece's
    Horner evaluation under its selection mask — the lane-optimal twin of
    :func:`pvaj_all`.
    """
    dtype = t.dtype
    durations = traj.durations.astype(dtype)          # (N,)
    cum = jnp.cumsum(durations)
    starts = cum - durations
    N = durations.shape[0]
    n_coef = traj.coeffs.shape[1]
    coeffs = traj.coeffs.astype(dtype)                # (N, n_coef, 3)

    tc = jax.lax.stop_gradient(jnp.clip(t, 0.0, cum[-1]))
    idx = jnp.zeros(t.shape, jnp.int32)
    for n in range(N - 1):
        idx = idx + (tc > cum[n]).astype(jnp.int32)

    outs = [[None, None, None] for _ in range(n_orders)]
    for n in range(N):
        sel = idx == n
        s = jnp.clip(t - starts[n], 0.0, durations[n])
        for ax in range(3):
            c = [coeffs[n, k, ax] for k in range(n_coef)]
            for d in range(n_orders):
                if d >= n_coef:
                    continue
                # derivative-folded coefficients (scalar ops, negligible)
                if d == 0:
                    cd = c
                else:
                    cd = [
                        c[k] * (_fact_ratio(k, d)) for k in range(d, n_coef)
                    ]
                acc = cd[-1]
                for k in range(len(cd) - 2, -1, -1):
                    acc = acc * s + cd[k]
                prev = outs[d][ax]
                term = jnp.where(sel, acc, 0.0)
                outs[d][ax] = term if prev is None else prev + term
    zero = jnp.zeros(t.shape, dtype)
    result = []
    for d in range(n_orders):
        result.append(tuple(o if o is not None else zero for o in outs[d]))
    while len(result) < 4:
        result.append((zero, zero, zero))
    return tuple(result)


def _fact_ratio(k: int, d: int) -> float:
    r = 1.0
    for j in range(k, k - d, -1):
        r *= j
    return r


def pose_components(pos, vel, acc, params):
    """Component-form pose map: 3-tuples → (pos3 3-tuple, R 9-tuple).

    R is returned row-major (r00..r22).  Twin of flatness.pose_of (quadrotor
    tilt from the drag-augmented specific force, ref flatness.hpp:53-86) and
    of the SE(2) PlanarPose map.
    """
    px, py, pz = pos
    if isinstance(params, fl.PlanarPose):
        c, s = jnp.cos(pz), jnp.sin(pz)
        zeros = jnp.zeros_like(c)
        ones = jnp.ones_like(c)
        zref = jnp.full_like(c, params.z_ref)
        return (px, py, zref), (c, -s, zeros, s, c, zeros, zeros, zeros, ones)

    p = params
    vx, vy, vz = vel
    ax, ay, az = acc
    cp_term = jnp.sqrt(vx * vx + vy * vy + vz * vz + p.veps)
    w_term = 1.0 + p.cp * cp_term
    k = p.dh / p.mass
    zux = ax + k * w_term * vx
    zuy = ay + k * w_term * vy
    zuz = az + k * w_term * vz + p.grav
    izn = jax.lax.rsqrt(zux * zux + zuy * zuy + zuz * zuz)
    zx, zy, zz = zux * izn, zuy * izn, zuz * izn

    td2 = 2.0 * (1.0 + zz)
    itd = jax.lax.rsqrt(td2)
    qw = 0.5 * td2 * itd
    qx = -zy * itd
    qy = zx * itd
    # quat_to_rot with qz = 0 (so3.quat_to_rot's exact expressions)
    ww, xx, yy = qw * qw, qx * qx, qy * qy
    xy2, wx2, wy2 = 2 * qx * qy, 2 * qw * qx, 2 * qw * qy
    R = (
        ww + xx - yy, xy2, wy2,
        xy2, ww - xx + yy, -wx2,
        -wy2, wx2, ww - xx - yy,
    )
    return (px, py, pz), R


def rel_components(p_world, x3, R):
    """p_rel = Rᵀ (p − x), all component-form (broadcasting)."""
    dx = p_world[0] - x3[0]
    dy = p_world[1] - x3[1]
    dz = p_world[2] - x3[2]
    r00, r01, r02, r10, r11, r12, r20, r21, r22 = R
    return (
        r00 * dx + r10 * dy + r20 * dz,
        r01 * dx + r11 * dy + r21 * dz,
        r02 * dx + r12 * dy + r22 * dz,
    )


def sdf_at_time_c(shape, traj, params, p_world, t):
    """Component-form body SDF at trajectory time(s).

    p_world: 3-tuple of arrays broadcasting against t (e.g. (P,) vs (K, P)).
    Returns d shaped like the broadcast.  Lane-optimal twin of
    :func:`sdf_at_time_fast`.
    """
    pos, vel, acc, _ = pvaj_components(traj, t, n_orders=3)
    x3, R = pose_components(pos, vel, acc, params)
    prel = rel_components(p_world, x3, R)
    return shape.sdf3_fn()(*prel)
