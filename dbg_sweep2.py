"""Bisect the B=128 swept-penalty cost: coarse vs zoom vs grad, K/rounds."""
import sys, time
import jax
from isdf_tpu.utils.cache import setup_compilation_cache
setup_compilation_cache()

import jax.numpy as jnp
import numpy as np
from isdf_tpu.config import Config
from isdf_tpu.shapes import make_shape
from isdf_tpu.parallel import batch as pb
from isdf_tpu.opt import backend
from isdf_tpu.core import minco
from isdf_tpu.core import flatness as fl
from isdf_tpu.core.poly import PolyTraj
import importlib
ss = importlib.import_module("isdf_tpu.sweep.sweep_sdf")

conf = Config(
    integralIntervs=32, sweep_coarse_samples=64, sweep_refine_rounds=12,
    vmax=5.0, omgmax=5.0, thetamax=1.5, safety_hor=0.4, mem_size=8,
)
shape = make_shape("CappedCone", conf)
B, N, P = 128, 4, 512
sb = pb.make_random_batch(conf, B=B, N=N, n_points=P, dtype=jnp.float32)
params = fl.FlatParams.from_config(conf)
w = backend.BackendWeights.from_config(conf)


def bench(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms", flush=True)
    return out


def traj_of(q, T, h, t):
    return PolyTraj(T, minco.solve(q, T, h, t))


# A. warm sweep forward only (both branches), default K=8 r=12
def sw_fwd(q, T, h, t, pts):
    traj = traj_of(q, T, h, t)
    tw = jnp.zeros(pts.shape[0], q.dtype)
    d, ts_, g = ss.sweep_sdf_warm(shape, traj, params, pts, tw,
                                  coarse_n=64, refine_rounds=12)
    return d.sum()
bench("A sweep_warm fwd r12k8", jax.jit(jax.vmap(sw_fwd)),
      sb.q0, sb.T0, sb.head, sb.tail, sb.points)

# B. cold sweep fwd (single branch: coarse+zoom)
def sw_cold(q, T, h, t, pts):
    traj = traj_of(q, T, h, t)
    d, ts_, g = ss.sweep_sdf(shape, traj, params, pts,
                             coarse_n=64, refine_rounds=12)
    return d.sum()
bench("B sweep_cold fwd r12", jax.jit(jax.vmap(sw_cold)),
      sb.q0, sb.T0, sb.head, sb.tail, sb.points)

# C. coarse only (rounds=1)
def sw_r1(q, T, h, t, pts):
    traj = traj_of(q, T, h, t)
    d, ts_, g = ss.sweep_sdf(shape, traj, params, pts,
                             coarse_n=64, refine_rounds=1)
    return d.sum()
bench("C sweep_cold fwd r1", jax.jit(jax.vmap(sw_r1)),
      sb.q0, sb.T0, sb.head, sb.tail, sb.points)

# D. zoom with K=32, rounds=4 (same eval count as r12k8, fewer steps)
def sw_k32(q, T, h, t, pts):
    traj = traj_of(q, T, h, t)
    total = traj.total_duration
    ts_ = jnp.linspace(0.0, total, 64)
    xs, Rs = ss.traj_states(traj, params, ts_)
    t0, _ = ss._coarse_seed(shape, pts, xs, Rs, ts_, False)
    t_star, d = ss._zoom(shape, traj, params, pts, t0, total / 63, 4, k=32)
    return d.sum()
bench("D coarse + zoom r4k32", jax.jit(jax.vmap(sw_k32)),
      sb.q0, sb.T0, sb.head, sb.tail, sb.points)

# E. the pvaj_all hot call alone: 24 sequential rounds of (P, 8)
def pv(q, T, h, t, pts):
    traj = traj_of(q, T, h, t)
    from isdf_tpu.sweep.fast_eval import sdf_at_time_fast
    def body(c, _):
        tt = c
        d = sdf_at_time_fast(shape, traj, params, pts[:, None, :],
                             tt[:, None] + jnp.linspace(0, 0.01, 8)[None, :])
        return jnp.min(d, axis=1), None
    t0 = jnp.zeros(pts.shape[0], q.dtype)
    out, _ = jax.lax.scan(body, t0, None, length=24)
    return out.sum()
bench("E 24x seq (P,8) evals", jax.jit(jax.vmap(pv)),
      sb.q0, sb.T0, sb.head, sb.tail, sb.points)
