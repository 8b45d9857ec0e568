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
        res = lbfgs.minimize(
            cg, x0, t0, m=conf.mem_size, max_iters=max_iters,
            g_epsilon=1e-7, past=conf.past, rel_cost_tol=conf.relCostTol,
        )
        traj, T, _ = backend.build_traj(res.x, N, head, tail)
        return traj.coeffs, T, res.f, res.n_iters

    return jax.vmap(one)(
        batch.head, batch.tail, batch.q0, batch.T0, batch.points, batch.mask
    )


def _chunk_one(shape, conf, chunk, head, tail, q0, T0, points, mask, state):
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
    t0 = jnp.zeros(points.shape[0], x0.dtype)
    return lbfgs.minimize(
        cg, x0, t0, m=conf.mem_size, max_iters=chunk,
        g_epsilon=1e-7, past=conf.past, rel_cost_tol=conf.relCostTol,
        resume_state=state, trace_len=chunk,
    )


# module-level jits keyed on (shape, conf, chunk): repeated solves with the
# same scenario shapes hit the XLA executable cache instead of re-tracing
# (per-call jax.jit closures would recompile the WHOLE solver every call)
@partial(jax.jit, static_argnames=("shape", "conf", "chunk"))
def _chunk_first(shape, conf, chunk, batch: ScenarioBatch):
    return jax.vmap(
        lambda h, t, q, T, p, m: _chunk_one(
            shape, conf, chunk, h, t, q, T, p, m, None)
    )(batch.head, batch.tail, batch.q0, batch.T0, batch.points, batch.mask)


@partial(jax.jit, static_argnames=("shape", "conf", "chunk"))
def _chunk_cont(shape, conf, chunk, batch: ScenarioBatch, state):
    return jax.vmap(
        lambda h, t, q, T, p, m, s: _chunk_one(
            shape, conf, chunk, h, t, q, T, p, m, s)
    )(batch.head, batch.tail, batch.q0, batch.T0, batch.points, batch.mask,
      state)


@partial(jax.jit, static_argnames=("N",))
def _finish_batch(N, head, tail, x):
    def finish(h, t, xx):
        traj, T, _ = backend.build_traj(xx, N, h, t)
        return traj.coeffs, T

    return jax.vmap(finish)(head, tail, x)


def batched_solve_chunked(shape, conf, batch: ScenarioBatch,
                          max_iters: int = 50, chunk: int = 8,
                          callback=None):
    """Chunked batched solve: `chunk` L-BFGS iterations per device program,
    full solver state carried across calls.  Keeps single XLA executions
    short (very long device programs can trip runtime watchdogs) and gives
    between-chunk observability.  Returns (coeffs, T, costs, iters)."""
    N = batch.T0.shape[1]
    res = _chunk_first(shape, conf, chunk, batch)
    iters_done = chunk
    while iters_done < max_iters:
        if callback is not None:
            callback(res)
        if bool(jnp.all(res.converged)):
            break
        res = _chunk_cont(shape, conf, chunk, batch, res.state)
        iters_done += chunk

    coeffs, T = _finish_batch(N, batch.head, batch.tail, res.x)
    return coeffs, T, res.f, res.n_iters


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
