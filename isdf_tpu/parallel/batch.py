"""Scenario-parallel batch engine: thousands of independent (map × shape ×
goal) trajectory solves sharded over a TPU mesh.

This is the axis of parallelism the reference does not have (SURVEY.md §2.5:
its only parallelism is OpenMP within one solve).  Design per BASELINE.json:
  * mesh axes ("dp", "sp"): scenarios shard over "dp"; each scenario's
    obstacle points shard over "sp" — the swept-SDF penalty's point reduction
    becomes an XLA-inserted psum over ICI (the "annotate shardings, let XLA
    insert collectives" recipe).
  * the whole L-BFGS outer loop is vmapped, so one jit program advances every
    scenario's optimizer in lockstep; scenarios that converge early keep
    iterating on a converged state (masked no-ops) — weak-scaling friendly.
  * multi-host: the same code under jax.distributed with a global mesh; the
    scenario axis spans DCN, "sp" stays intra-host on ICI.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from isdf_tpu.core import timemap
from isdf_tpu.core import flatness as fl
from isdf_tpu.opt import backend, lbfgs


class ScenarioBatch(NamedTuple):
    """Stacked independent planning scenarios (B leading axis)."""

    head: jax.Array        # (B, 3, 3)
    tail: jax.Array        # (B, 3, 3)
    q0: jax.Array          # (B, N-1, 3)
    T0: jax.Array          # (B, N)
    points: jax.Array      # (B, P, 3) obstacle points (padded)
    mask: jax.Array        # (B, P)


def make_mesh(n_devices: Optional[int] = None, sp: int = 1) -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    dp = n_devices // sp
    arr = np.array(devs[:n_devices]).reshape(dp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


def shard_batch(batch: ScenarioBatch, mesh: Mesh) -> ScenarioBatch:
    """Place the batch: scenarios over dp; obstacle points over (dp, sp)."""
    s_b = NamedSharding(mesh, P("dp"))
    s_pts = NamedSharding(mesh, P("dp", "sp"))
    return ScenarioBatch(
        head=jax.device_put(batch.head, s_b),
        tail=jax.device_put(batch.tail, s_b),
        q0=jax.device_put(batch.q0, s_b),
        T0=jax.device_put(batch.T0, s_b),
        points=jax.device_put(batch.points, s_pts),
        mask=jax.device_put(batch.mask, s_pts),
    )


def _single_cost_fn(shape, params, w, conf):
    def cost_and_grad(x, aux, head, tail, points, mask, N):
        f = backend.make_cost_fn(
            shape, params, w, head, tail, N, points, mask,
            integral_res=conf.integralIntervs,
            coarse_n=conf.sweep_coarse_samples,
            refine_rounds=conf.sweep_refine_rounds,
        )
        return f(x, aux)

    return cost_and_grad


@partial(jax.jit, static_argnames=("shape", "conf"))
def batched_cost_and_grad(shape, conf, batch: ScenarioBatch):
    """One vmapped cost+grad evaluation across all scenarios — the
    "training step" analogue used by the multi-chip dryrun."""
    params = fl.FlatParams.from_config(conf)
    w = backend.BackendWeights.from_config(conf)
    N = batch.T0.shape[1]

    def one(head, tail, q0, T0, points, mask):
        x0 = backend.pack(timemap.T_to_tau(T0), q0)
        cg = backend.make_cost_fn(
            shape, params, w, head, tail, N, points, mask,
            integral_res=conf.integralIntervs,
            coarse_n=conf.sweep_coarse_samples,
            refine_rounds=conf.sweep_refine_rounds,
        )
        t0 = jnp.zeros(points.shape[0], x0.dtype)
        f, g, t_star = cg(x0, t0)
        return f, g

    return jax.vmap(one)(
        batch.head, batch.tail, batch.q0, batch.T0, batch.points, batch.mask
    )


@partial(jax.jit, static_argnames=("shape", "conf", "max_iters"))
def batched_solve(shape, conf, batch: ScenarioBatch, max_iters: int = 50):
    """Full batched back-end solve: every scenario's L-BFGS loop in one jit
    program.  Returns (coeffs (B,N,6,3), T (B,N), final costs, iters)."""
    params = fl.FlatParams.from_config(conf)
    w = backend.BackendWeights.from_config(conf)
    N = batch.T0.shape[1]

    def one(head, tail, q0, T0, points, mask):
        x0 = backend.pack(timemap.T_to_tau(T0), q0)
        cg = backend.make_cost_fn(
            shape, params, w, head, tail, N, points, mask,
            integral_res=conf.integralIntervs,
            coarse_n=conf.sweep_coarse_samples,
            refine_rounds=conf.sweep_refine_rounds,
        )
        t0 = jnp.zeros(points.shape[0], x0.dtype)
        res = lbfgs.minimize_lockstep(
            cg, x0, t0, m=conf.mem_size, max_iters=max_iters,
            g_epsilon=1e-7, past=conf.past, rel_cost_tol=conf.relCostTol,
        )
        traj, T, _ = backend.build_traj(res.x, N, head, tail)
        return traj.coeffs, T, res.f, res.n_iters

    return jax.vmap(one)(
        batch.head, batch.tail, batch.q0, batch.T0, batch.points, batch.mask
    )


def _chunk_one(shape, conf, chunk, head, tail, q0, T0, points, mask, t0,
               state):
    params = fl.FlatParams.from_config(conf)
    w = backend.BackendWeights.from_config(conf)
    N = T0.shape[0]
    x0 = backend.pack(timemap.T_to_tau(T0), q0)
    cg = backend.make_cost_fn(
        shape, params, w, head, tail, N, points, mask,
        integral_res=conf.integralIntervs,
        coarse_n=conf.sweep_coarse_samples,
        refine_rounds=conf.sweep_refine_rounds,
    )
    # lockstep scheduling: under the scenario vmap a nested line-search
    # while_loop would run the BATCH-MAX trial count every iteration (one
    # hard scenario inflates everyone — measured ~20 evals/iter at B=128);
    # minimize_lockstep fixes the program at 2 evals per lockstep iteration
    return lbfgs.minimize_lockstep(
        cg, x0, t0, m=conf.mem_size, max_iters=chunk,
        g_epsilon=1e-7, past=conf.past, rel_cost_tol=conf.relCostTol,
        resume_state=state, trace_len=2 * chunk + 8,
    )


# module-level jits keyed on (shape, conf, chunk): repeated solves with the
# same scenario shapes hit the XLA executable cache instead of re-tracing
# (per-call jax.jit closures would recompile the WHOLE solver every call)
@partial(jax.jit, static_argnames=("shape", "conf", "chunk"))
def _chunk_first(shape, conf, chunk, batch: ScenarioBatch, t_warm):
    return jax.vmap(
        lambda h, t, q, T, p, m, tw: _chunk_one(
            shape, conf, chunk, h, t, q, T, p, m, tw, None)
    )(batch.head, batch.tail, batch.q0, batch.T0, batch.points, batch.mask,
      t_warm)


@partial(jax.jit, static_argnames=("shape", "conf", "chunk"))
def _chunk_cont(shape, conf, chunk, batch: ScenarioBatch, t_warm, state):
    return jax.vmap(
        lambda h, t, q, T, p, m, tw, s: _chunk_one(
            shape, conf, chunk, h, t, q, T, p, m, tw, s)
    )(batch.head, batch.tail, batch.q0, batch.T0, batch.points, batch.mask,
      t_warm, state)


@partial(jax.jit, static_argnames=("N",))
def _finish_batch(N, head, tail, x):
    def finish(h, t, xx):
        traj, T, _ = backend.build_traj(xx, N, h, t)
        return traj.coeffs, T

    return jax.vmap(finish)(head, tail, x)


def batched_solve_chunked(shape, conf, batch: ScenarioBatch,
                          max_iters: int = 50, chunk: int = 8,
                          callback=None, t_warm0=None):
    """Chunked batched solve: `chunk` L-BFGS iterations per device program,
    full solver state carried across calls.  Keeps single XLA executions
    short (very long device programs can trip runtime watchdogs) and gives
    between-chunk observability.  t_warm0 (B, P) optionally seeds the
    per-point argmin-time warm starts (the audited re-solve path).
    Returns (coeffs, T, costs, iters)."""
    N = batch.T0.shape[1]
    if t_warm0 is None:
        t_warm0 = jnp.zeros(batch.points.shape[:2], batch.points.dtype)
        if hasattr(batch.points, "sharding"):
            t_warm0 = jax.device_put(t_warm0, batch.mask.sharding)
    res = _chunk_first(shape, conf, chunk, batch, t_warm0)
    iters_done = chunk
    while iters_done < max_iters:
        if callback is not None:
            callback(res)
        if bool(jnp.all(res.converged)):
            break
        res = _chunk_cont(shape, conf, chunk, batch, t_warm0, res.state)
        iters_done += chunk

    coeffs, T = _finish_batch(N, batch.head, batch.tail, res.x)
    return coeffs, T, res.f, res.n_iters


@partial(jax.jit, static_argnames=("shape", "conf", "coarse_n"))
def _batched_audit(shape, conf, batch: ScenarioBatch, coeffs, T,
                   coarse_n: int):
    """High-time-resolution batched swept-SDF audit of solved trajectories:
    per-scenario sweep over ALL obstacle points at `coarse_n` time samples
    (≫ the solve's sweep_coarse_samples, so thin-wall crossing dips the
    optimizer's scan aliased over are caught).  Returns (sdf, t*) (B, P)."""
    from isdf_tpu.core.poly import PolyTraj
    from isdf_tpu.sweep import sweep_sdf

    params = fl.FlatParams.from_config(conf)

    def one(cb, Tb, points):
        traj = PolyTraj(Tb, cb)
        sdf, t_star, _ = sweep_sdf(
            shape, traj, params, points, coarse_n=coarse_n,
            refine_rounds=conf.sweep_refine_rounds,
        )
        return sdf, t_star

    return jax.vmap(one)(coeffs, T, batch.points)


@partial(jax.jit, static_argnames=("N",))
def _batched_junctions(N, coeffs, T):
    from isdf_tpu.core.poly import PolyTraj

    def one(cb, Tb):
        return PolyTraj(Tb, cb).junction_positions()[1:-1]

    return jax.vmap(one)(coeffs, T)


def batched_solve_audited(shape, conf, batch: ScenarioBatch,
                          max_iters: int = 50, chunk: int = 8,
                          audit_coarse_n: int = 512, margin: float = 1e-3,
                          reserve_points=None, reserve_mask=None,
                          inject_budget: int = 64):
    """Batched solve + the safety audit/inject/re-solve loop — the batched
    twin of PlannerManager.plan's step 6 (plan/manager.py:282-319; ref
    plan_manager.cpp:246-254).  Per round: (a) a high-resolution
    argmin-time scan over every scenario's full point set (catches dips
    the solve's coarser scan aliased over), (b) optionally, the same scan
    over a per-scenario RESERVE point pool — voxels the solve never saw —
    with the `inject_budget` nearest-grazing reserve points swapped into
    fixed extra point slots, and (c) a warm re-solve in which every
    grazing point's t* is seeded from the audit scan.  The reserve pool is
    the batched stand-in for the single-plan path's full-voxel-map
    grazing-neighborhood injection (VERDICT r4 weak #6): scenario batches
    carry points, not maps, so callers hand the engine the voxel source
    (e.g. all occupied voxels in the flight corridor AABB) and the audit
    promotes the ones that matter.  Scenarios with no violations re-solve
    from their own converged state in lockstep (masked no-ops).

    reserve_points: (B, R, 3) optional; reserve_mask: (B, R).
    Returns (coeffs, T, costs, iters, audit): audit = dict with the
    violation count per round (solve-set + reserve) and the final min-SDF
    per scenario over BOTH sets.
    """
    coeffs, T, costs, iters = batched_solve_chunked(
        shape, conf, batch, max_iters=max_iters, chunk=chunk)
    N = batch.T0.shape[1]
    B, P = batch.mask.shape
    history = []
    sdf = None
    min_sdf_reserve = None
    near_thresh = max(float(conf.safety_hor) * 0.5, margin)
    solve_batch = batch      # grows by inject_budget slots on first inject
    rounds = max(int(conf.safety_replan_rounds), 1)
    for rnd in range(rounds + 1):   # final pass audits the last re-solve
        sdf, t_star = _batched_audit(
            shape, conf, solve_batch, coeffs, T, audit_coarse_n)
        viol = int(np.asarray((sdf <= margin) & solve_batch.mask).sum())
        inj = None
        if reserve_points is not None:
            if reserve_mask is None:
                reserve_mask = jnp.ones(reserve_points.shape[:2], bool)
            sdf_r, t_star_r = _batched_audit(
                shape, conf, batch._replace(points=reserve_points),
                coeffs, T, audit_coarse_n)
            sdf_r = jnp.where(reserve_mask, sdf_r, jnp.inf)
            viol += int(np.asarray(sdf_r <= margin).sum())
            min_sdf_reserve = jnp.min(sdf_r, axis=1)
            # promote the K nearest-grazing reserve points into the extra
            # slots (fixed K keeps the re-solve executable's shape stable)
            K = min(int(inject_budget), reserve_points.shape[1])
            order = jnp.argsort(sdf_r, axis=1)[:, :K]           # (B, K)
            take = jnp.take_along_axis
            inj_pts = take(reserve_points, order[:, :, None], axis=1)
            inj_sdf = take(sdf_r, order, axis=1)
            inj_t = take(t_star_r, order, axis=1)
            inj_mask = inj_sdf <= near_thresh                    # (B, K)
            inj = (inj_pts, inj_mask, jnp.where(inj_mask, inj_t, 0.0))
        history.append(viol)
        if viol == 0 or rnd == rounds:
            break
        near = (sdf <= near_thresh) & solve_batch.mask
        t_warm = jnp.where(near, t_star, 0.0)
        q0 = _batched_junctions(N, coeffs, T)
        solve_batch = solve_batch._replace(q0=q0, T0=T)
        if inj is not None:
            inj_pts, inj_mask, inj_t = inj
            base_pts = solve_batch.points[:, :P]
            base_mask = solve_batch.mask[:, :P]
            solve_batch = solve_batch._replace(
                points=jnp.concatenate([base_pts, inj_pts], axis=1),
                mask=jnp.concatenate([base_mask, inj_mask], axis=1))
            t_warm = jnp.concatenate([t_warm[:, :P], inj_t], axis=1)
        coeffs, T, costs, iters = batched_solve_chunked(
            shape, conf, solve_batch, max_iters=max_iters, chunk=chunk,
            t_warm0=t_warm)
    min_sdf = jnp.min(jnp.where(solve_batch.mask, sdf, jnp.inf), axis=1)
    if min_sdf_reserve is not None:
        min_sdf = jnp.minimum(min_sdf, min_sdf_reserve)
    return coeffs, T, costs, iters, {
        "violations_per_round": history,
        "min_sdf": np.asarray(min_sdf),
    }


def make_random_batch(conf, B: int, N: int = 4, n_points: int = 128,
                      seed: int = 0, dtype=jnp.float32) -> ScenarioBatch:
    """Synthetic but nontrivial scenario batch (random goals + obstacle
    clusters along the straight line) for benchmarks and dryruns."""
    rng = np.random.default_rng(seed)
    goals = rng.uniform(4.0, 8.0, size=(B, 3)) * np.array([1.0, 0.5, 0.3])
    head = np.zeros((B, 3, 3))
    tail = np.zeros((B, 3, 3))
    tail[:, :, 0] = goals
    fracs = np.linspace(0, 1, N + 1)[1:-1]
    q0 = goals[:, None, :] * fracs[None, :, None]
    q0 = q0 + rng.normal(scale=0.2, size=q0.shape)
    T0 = np.full((B, N), conf.inittime)
    t = rng.uniform(0.1, 0.9, size=(B, n_points, 1))
    points = goals[:, None, :] * t + rng.normal(scale=0.8, size=(B, n_points, 3))
    mask = np.ones((B, n_points), dtype=bool)
    return ScenarioBatch(
        head=jnp.asarray(head, dtype), tail=jnp.asarray(tail, dtype),
        q0=jnp.asarray(q0, dtype), T0=jnp.asarray(T0, dtype),
        points=jnp.asarray(points, dtype), mask=jnp.asarray(mask),
    )
