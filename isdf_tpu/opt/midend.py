"""Mid-end warm-start trajectory generator — the ``OriTraj`` equivalent
(ref src/planner_algorithm/include/planner_algorithm/mid_end.hpp:341 +
mid_end.cpp:3-133).

Fits a MINCO trajectory through the A* waypoints minimizing
  energy + ρ_mid Σ T + w_pr Σ_i ‖pos_i − ref_i‖³
where pos_i samples the start of piece i+1 (local time T_{i+1}/integralRes —
ref addPosePenalty mid_end.hpp:201-260) and ref_i are the subsampled A*
waypoints.  Solved with the same jit L-BFGS; the solution vector
x = [τ | ξ] warm-starts the back end (ref mid_end.cpp:75 → opt_x).

NOTE the reference's gradT line multiplies the penalty *value* into the
chain-rule term (mid_end.hpp:256: ``gradT += w·(cost_tmp_p · gradViolaPt)``),
inconsistent with its own gradC.  We differentiate the stated cost exactly
(autodiff), which is the mathematically consistent variant.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from isdf_tpu.core import minco, timemap
from isdf_tpu.core.poly import PolyTraj, beta
from isdf_tpu.opt import lbfgs
from isdf_tpu.opt.backend import pack, unpack, build_traj


def make_cost_fn(head, tail, N: int, ref_points, rho_mid: float,
                 weight_pr: float, integral_res: int = 64):
    """ref_points: (N−1, 3) waypoint attractors (the A* subsample)."""

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
        return e + t_cost + attract

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
    max_iters: int = 200,
):
    """(ref OriTraj::getOriTraj) → (PolyTraj, opt_x warm start, result)."""
    N = T0.shape[0]
    q0 = jnp.asarray(waypoints)
    x0 = pack(timemap.T_to_tau(T0), q0)
    cost_and_grad, _ = make_cost_fn(
        head, tail, N, q0, conf.rho_mid_end, conf.weight_pr,
        conf.integralIntervs,
    )
    res = lbfgs.minimize(
        cost_and_grad, x0, None,
        m=conf.mem_size, max_iters=max_iters,
        g_epsilon=max(conf.g_epsilon, 1e-7), past=conf.past,
        rel_cost_tol=conf.relCostTolMidEnd,
    )
    traj, _, _ = build_traj(res.x, N, head, tail)
    return traj, res.x, res
