"""Decompose the B=128 cost+grad eval: which part eats the 1.3 s?"""
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
from isdf_tpu.core import minco, timemap
from isdf_tpu.core import flatness as fl
from isdf_tpu.core.poly import PolyTraj

conf = Config(
    integralIntervs=32, sweep_coarse_samples=64, sweep_refine_rounds=12,
    vmax=5.0, omgmax=5.0, thetamax=1.5, safety_hor=0.4, mem_size=8,
)
shape = make_shape("CappedCone", conf)
B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
N, P = 4, 512
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


tau = jax.vmap(timemap.T_to_tau)(sb.T0)
x = jax.vmap(backend.pack)(tau, sb.q0)

# 1. minco solve fwd
f1 = jax.jit(jax.vmap(lambda q, T, h, t: minco.solve(q, T, h, t)))
coeffs = bench("minco.solve fwd", f1, sb.q0, sb.T0, sb.head, sb.tail)

# 2. minco solve + energy, value_and_grad
def en(q, T, h, t):
    c = minco.solve(q, T, h, t)
    return minco.energy(c, T)
f2 = jax.jit(jax.vmap(jax.value_and_grad(en, argnums=(0, 1))))
bench("minco solve+energy vag", f2, sb.q0, sb.T0, sb.head, sb.tail)

# 3. integral penalty value+grad (through solve)
def ip(q, T, h, t):
    c = minco.solve(q, T, h, t)
    traj = PolyTraj(T, c)
    return backend.integral_penalty(traj, params, w, conf.integralIntervs)
f3 = jax.jit(jax.vmap(jax.value_and_grad(ip, argnums=(0, 1))))
bench("integral_penalty vag", f3, sb.q0, sb.T0, sb.head, sb.tail)

# 4. swept penalty value+grad (through solve)
def sp(q, T, h, t, pts, mask):
    c = minco.solve(q, T, h, t)
    traj = PolyTraj(T, c)
    t0 = jnp.zeros(pts.shape[0], q.dtype)
    cost, _ = backend.swept_penalty(
        shape, traj, params, w, pts, mask, t0,
        conf.sweep_coarse_samples, conf.sweep_refine_rounds)
    return cost
f4 = jax.jit(jax.vmap(jax.value_and_grad(sp, argnums=(0, 1))))
bench("swept_penalty vag", f4, sb.q0, sb.T0, sb.head, sb.tail,
      sb.points, sb.mask)

# 5. full cost_and_grad for reference
bench("full cost_and_grad", lambda: pb.batched_cost_and_grad(shape, conf, sb))
