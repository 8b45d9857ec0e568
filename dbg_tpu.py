"""Microbench: pallas vs XLA coarse scan on the real TPU."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from isdf_tpu.config import Config
from isdf_tpu.core import flatness as fl, minco
from isdf_tpu.core.poly import PolyTraj
from isdf_tpu.shapes import make_shape
from isdf_tpu.sweep.pallas_scan import coarse_scan
from isdf_tpu.sweep.sweep_sdf import traj_states

conf = Config()
params = fl.FlatParams.from_config(conf)
dtype = jnp.float32
rng = np.random.default_rng(0)

N = 6
q = jnp.asarray(np.linspace(1, 9, N - 1)[:, None] * np.array([1.0, 0.3, 0.15])
                + rng.normal(scale=0.3, size=(N - 1, 3)), dtype)
T = jnp.asarray(rng.uniform(1.2, 2.2, size=N), dtype)
head = jnp.zeros((3, 3), dtype)
tail = jnp.zeros((3, 3), dtype).at[:, 0].set(jnp.asarray([10.0, 3.0, 1.5], dtype))
traj = PolyTraj(T, minco.solve(q, T, head, tail))

for shape_name in ["CappedCone", "Ball", "TwistBox"]:
    shape = make_shape(shape_name, conf)
    for P, Tc in [(32768, 64), (32768, 128), (131072, 64)]:
        pts = jnp.asarray(rng.uniform(-1, 11, size=(P, 3)), dtype)
        ts = jnp.linspace(0.0, traj.total_duration, Tc).astype(dtype)
        xs, Rs = traj_states(traj, params, ts)
        xs, Rs = xs.astype(dtype), Rs.astype(dtype)
        for use_pallas in [False, True]:
            try:
                f = jax.jit(lambda p: coarse_scan(shape, p, xs, Rs,
                                                  use_pallas=use_pallas))
                d, j = f(pts)
                jax.block_until_ready(d)
                iters = 30
                t0 = time.perf_counter()
                for _ in range(iters):
                    d, j = f(pts)
                jax.block_until_ready(d)
                dt = (time.perf_counter() - t0) / iters
                print(f"{shape_name:12s} P={P:7d} T={Tc:4d} "
                      f"pallas={use_pallas!s:5s}  {dt*1e3:8.3f} ms  "
                      f"{P*Tc/dt/1e9:8.2f} Geval/s")
            except Exception as e:
                print(f"{shape_name} P={P} T={Tc} pallas={use_pallas} FAILED: "
                      f"{type(e).__name__}: {str(e)[:200]}")
