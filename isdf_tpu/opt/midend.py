"""Mid-end warm-start trajectory generator — the ``OriTraj`` equivalent
(ref src/planner_algorithm/include/planner_algorithm/mid_end.hpp:341 +
mid_end.cpp:3-133).

Fits a MINCO trajectory through the A* waypoints minimizing
  energy + ρ_mid Σ T + w_pr Σ_i ‖pos_i − ref_i‖³  [+ attitude tracking]
where pos_i samples the start of piece i+1 (local time T_{i+1}/integralRes —
ref addPosePenalty mid_end.hpp:201-260) and ref_i are the subsampled A*
waypoints.  Solved with the same jit L-BFGS; the solution vector
x = [τ | ξ] warm-starts the back end (ref mid_end.cpp:75 → opt_x).

**Attitude-reference penalty** (ref mid_end.hpp:340-348 costaltitude /
351-369 gradaltitude / 394-421 WC2 + addTimeIntPenalty 424-595): the A* SE(3)
search assigns each waypoint a collision-free (roll, pitch); the mid-end
penalizes deviation of the flatness-mapped attitude R(q(t)) from those
references inside a WC2 window centered on each waypoint (weight 1 at the
junction, falling to 0 at mid-piece).  The rotation distance is

    costaltitude(q, R_ref) = 2·(3 − tr(R_refᵀ R(q)))

— the reference's expanded quaternion polynomial is exactly this trace form
(mid_end.hpp:340-348; its hand-derived c1 cross term drops a factor of 2, a
transcription slip we do not reproduce).  Gradients via autodiff replace
gradaltitude + backwardthreadsafe entirely.  This is the mechanism that gets
a long box / L-shape *rolled* through a slit (demo5/demo6): tracking the A*
attitude shapes the acceleration profile so the flatness-mapped body tilts
match the feasible pose at each gap.

NOTE the reference's released costFunction (mid_end.hpp:287) wires only
addPosePenalty; addTimeIntPenalty (attitude + vel/ω) is defined but not
invoked.  We wire the attitude term (it is required for the SE(3) demos);
the mid-end vel/ω terms stay available behind ``weight_v_mid``/
``weight_omg_mid`` (0 disables, the released behavior).

NOTE the reference's addPosePenalty gradT line multiplies the penalty
*value* into the chain-rule term (mid_end.hpp:256), inconsistent with its
own gradC.  We differentiate the stated cost exactly (autodiff).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from isdf_tpu.core import minco, timemap
from isdf_tpu.core import flatness as fl
from isdf_tpu.core.poly import PolyTraj, beta
from isdf_tpu.core.smoothing import smoothed_l1
from isdf_tpu.core.so3 import quat_to_rot, log_rot, exp_rotvec
from isdf_tpu.opt import lbfgs
from isdf_tpu.opt.backend import pack, unpack, build_traj
from isdf_tpu.opt.attitude import (
    wc2, attitude_cost, attitude_penalty, pad_attitude_refs,
)


def make_cost_fn(head, tail, N: int, ref_points, rho_mid: float,
                 weight_pr: float, integral_res: int = 64,
                 att=None, weight_ar: float = 0.0,
                 smooth_fac: float = 1e-2, params=None,
                 bridge: bool = True):
    """ref_points: (N−1, 3) waypoint attractors (the A* subsample).
    att: optional (N+1, 3, 3) junction attitude references (see
    pad_attitude_refs); enables the attitude-tracking term with weight_ar."""

    def raw_cost(x):
        traj, T, q = build_traj(x, N, head, tail)
        e = minco.energy(traj.coeffs, T)
        t_cost = rho_mid * jnp.sum(T)
        # sample the start of each interior piece (segment i+1 at local
        # time α·T, α = 1/integralRes — ref mid_end.hpp:230-238)
        alpha = 1.0 / integral_res
        seg = jnp.arange(1, N)
        s = alpha * T[seg]
        b = beta(s, 0)                                   # (N-1, 6)
        pos = jnp.einsum("nk,nkd->nd", b, traj.coeffs[seg])
        diff = pos - ref_points
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
        attract = weight_pr * jnp.sum(dist**3)
        total = e + t_cost + attract
        if att is not None and weight_ar > 0.0:
            total = total + attitude_penalty(
                traj, params, att, weight_ar, smooth_fac, integral_res,
                bridge=bridge,
            )
        return total

    def cost_and_grad(x, aux):
        f, g = jax.value_and_grad(raw_cost)(x)
        return f, g, aux

    return cost_and_grad, raw_cost


def get_ori_traj(
    conf,
    head,
    tail,
    waypoints,
    T0,
    rot_refs=None,
    max_iters: int = 200,
    params=None,
):
    """(ref OriTraj::getOriTraj) → (PolyTraj, opt_x warm start, result).

    rot_refs: optional (N−1, 3, 3) per-waypoint attitude references from the
    A* SE(3) search (ref rot_list, plan_manager.cpp:232-254)."""
    N = T0.shape[0]
    q0 = jnp.asarray(waypoints)
    x0 = pack(timemap.T_to_tau(T0), q0)
    att = None
    if rot_refs is not None and conf.weight_ar > 0.0:
        att = pad_attitude_refs(rot_refs, x0.dtype)
        if params is None:
            params = fl.FlatParams.from_config(conf)
    cost_and_grad, _ = make_cost_fn(
        head, tail, N, q0, conf.rho_mid_end, conf.weight_pr,
        conf.integralIntervs,
        att=att, weight_ar=conf.weight_ar,
        smooth_fac=conf.smoothingEps, params=params,
        bridge=conf.attitude_bridge,
    )
    res = lbfgs.minimize(
        cost_and_grad, x0, None,
        m=conf.mem_size, max_iters=max_iters,
        g_epsilon=max(conf.g_epsilon, 1e-7), past=conf.past,
        rel_cost_tol=conf.relCostTolMidEnd,
    )
    traj, _, _ = build_traj(res.x, N, head, tail)
    return traj, res.x, res
