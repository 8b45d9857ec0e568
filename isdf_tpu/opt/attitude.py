"""Attitude-reference tracking penalty (shared by mid end and back end).

Re-derivation of the reference's costaltitude/gradaltitude/WC2 machinery
(ref src/planner_algorithm/include/planner_algorithm/mid_end.hpp:340-421 +
addTimeIntPenalty 424-595); see opt/midend.py for the full design notes.
The reference wires this only into the mid end (and its released
costFunction does not invoke it at all); exposing it to the back end as well
(weight_ar_backend) keeps the warm-start attitude from being unwound by the
swept-SDF penalty's local gradients in needle's-eye passages.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from isdf_tpu.core import flatness as fl
from isdf_tpu.core.poly import PolyTraj, beta
from isdf_tpu.core.smoothing import smoothed_l1
from isdf_tpu.core.so3 import quat_to_rot, log_rot, exp_rotvec


def wc2(x):
    """C¹ window: 1 at x=0 falling to 0 at |x|≥1 (ref mid_end.hpp:394-421).

    Piecewise: 0 | 2(x+1)² | 1−2x² | 2(x−1)² | 0 on
    (−∞,−1] [−1,−½] [−½,½] [½,1] [1,∞).  Autodiff-safe (each branch finite).
    """
    x = jnp.asarray(x)
    return jnp.where(
        jnp.abs(x) >= 1.0,
        0.0,
        jnp.where(
            x < -0.5,
            2.0 * (x + 1.0) ** 2,
            jnp.where(x < 0.5, 1.0 - 2.0 * x * x, 2.0 * (x - 1.0) ** 2),
        ),
    )


def attitude_cost(quat, rot_ref):
    """2(3 − tr(R_refᵀ R(q))) — 0 iff R(q) = R_ref, max 12 at angle π
    (ref costaltitude mid_end.hpp:340-348, autodiff replaces gradaltitude)."""
    R = quat_to_rot(quat)
    return 2.0 * (3.0 - jnp.einsum("...ij,...ij->...", rot_ref, R))


def attitude_penalty(traj: PolyTraj, params, att, w_ar: float,
                     smooth_fac: float, res: int, bridge: bool = True):
    """WC2-windowed attitude-tracking penalty over pieces × (res+1) samples
    (ref addTimeIntPenalty mid_end.hpp:476-595, attitude part).

    att: (N+1, 3, 3) junction attitude references — identity at the ends
    (ref: rotate_ref_L/R default Identity, hpp:483-493), rot_list between.
    Per piece i the left window tracks att[i] (weight 1 at piece start → 0
    at mid-piece), the right window tracks att[i+1] (0 at mid → 1 at end).

    ``bridge`` (no reference equivalent — a robustness improvement): the
    reference's window weight vanishes at EVERY mid-piece, so between two
    consecutive rolled waypoints the attitude is unconstrained exactly where
    an obstacle crossing may still be in progress (the body momentarily
    un-rolls inside a slit whose traversal spans > 1 waypoint window).  With
    bridge on, pieces whose BOTH junction refs are non-identity get full
    weight across the piece, tracking the geodesic (rotation-vector lerp)
    between the two references.
    """
    N = traj.n_pieces
    T = traj.durations
    j = jnp.arange(res + 1)
    frac = (j / res).astype(T.dtype)
    s = T[:, None] * frac[None, :]                      # (N, res+1)
    c = traj.coeffs

    def eval_d(order):
        b = beta(s, order)
        return jnp.einsum("nsk,nkd->nsd", b, c)

    pos, vel, acc, jer = eval_d(0), eval_d(1), eval_d(2), eval_d(3)
    quat, _ = fl.rates_of(pos, vel, acc, jer, params)   # (N, res+1, 4)

    midT = 0.5 * T[:, None]                             # (N, 1)
    is_left = s <= midT
    # left branch: x = s/midT ∈ [0,1]; right: x = (s−midT)/midT − 1 ∈ [−1,0]
    xw = jnp.where(is_left, s / midT, (s - midT) / midT - 1.0)
    k = wc2(xw)                                         # (N, res+1)
    if bridge:
        rv = log_rot(att)                               # (N+1, 3)
        rv_l, rv_r = rv[:-1], rv[1:]                    # (N, 3)
        nonid = jnp.sum(rv * rv, axis=-1) > 1e-10       # (N+1,)
        full = (nonid[:-1] & nonid[1:]).astype(T.dtype)  # (N,)
        k = jnp.maximum(k, full[:, None])
        rv_s = (1.0 - frac)[None, :, None] * rv_l[:, None] \
            + frac[None, :, None] * rv_r[:, None]       # (N, res+1, 3)
        ref = exp_rotvec(rv_s)
    else:
        ref = jnp.where(
            is_left[..., None, None], att[:-1, None], att[1:, None]
        )                                               # (N, res+1, 3, 3)
    ca = attitude_cost(quat, ref)
    pena = k * w_ar * smoothed_l1(ca, smooth_fac)
    node = jnp.where((j == 0) | (j == res), 0.5, 1.0).astype(T.dtype)
    step = T / res
    return jnp.sum(pena * node[None, :] * step[:, None])


def pad_attitude_refs(rot_refs, dtype=None):
    """(N−1, 3, 3) waypoint refs → (N+1, 3, 3) junction table with identity
    head/tail (start and goal are flat hover states)."""
    rot_refs = jnp.asarray(rot_refs, dtype)
    eye = jnp.eye(3, dtype=rot_refs.dtype)[None]
    return jnp.concatenate([eye, rot_refs, eye], axis=0)


