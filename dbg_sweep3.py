"""Isolate: is the 230ms from the (rounds, k) choice or the sweep_sdf wrapper?"""
import time, importlib
import jax
from isdf_tpu.utils.cache import setup_compilation_cache
setup_compilation_cache()

import jax.numpy as jnp
import numpy as np
from isdf_tpu.config import Config
from isdf_tpu.shapes import make_shape
from isdf_tpu.parallel import batch as pb
from isdf_tpu.core import minco
from isdf_tpu.core import flatness as fl
from isdf_tpu.core.poly import PolyTraj

ss = importlib.import_module("isdf_tpu.sweep.sweep_sdf")

conf = Config(integralIntervs=32, sweep_coarse_samples=64,
              sweep_refine_rounds=12, vmax=5.0, omgmax=5.0, thetamax=1.5,
              safety_hor=0.4, mem_size=8)
shape = make_shape("CappedCone", conf)
B, N, P = 128, 4, 512
sb = pb.make_random_batch(conf, B=B, N=N, n_points=P, dtype=jnp.float32)
params = fl.FlatParams.from_config(conf)


def bench(name, fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    reps = 5
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter()-t0)/reps*1e3:.1f} ms", flush=True)


def make(rounds, k, via_wrapper):
    def f(q, T, h, t, pts):
        traj = PolyTraj(T, minco.solve(q, T, h, t))
        if via_wrapper:
            d, ts_, g = ss.sweep_sdf(shape, traj, params, pts,
                                     coarse_n=64, refine_rounds=rounds)
            return d.sum()
        total = traj.total_duration
        ts_ = jnp.linspace(0.0, total, 64)
        xs, Rs = ss.traj_states(traj, params, ts_)
        t0, _ = ss._coarse_seed(shape, pts, xs, Rs, ts_, False)
        t_star, d = ss._zoom(shape, traj, params, pts, t0, total / 63,
                             rounds, k=k)
        return d.sum()
    return jax.jit(jax.vmap(f))

bench("manual r12 k8 ", make(12, 8, False),
      sb.q0, sb.T0, sb.head, sb.tail, sb.points)
bench("manual r4  k8 ", make(4, 8, False),
      sb.q0, sb.T0, sb.head, sb.tail, sb.points)
bench("manual r12 k32", make(12, 32, False),
      sb.q0, sb.T0, sb.head, sb.tail, sb.points)
bench("wrapper r4 def", make(4, 8, True),
      sb.q0, sb.T0, sb.head, sb.tail, sb.points)
bench("wrapper r12   ", make(12, 8, True),
      sb.q0, sb.T0, sb.head, sb.tail, sb.points)
