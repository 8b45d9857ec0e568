"""Grid-kernel throughput probe (bench config: 64^3 torus, P=32768,
coarse 64, rounds 12). Usage: python scratch/probe_grid_tpu.py [k ...]"""
import sys; sys.path.append("/root/repo")  # append, not PYTHONPATH: the repo's native/ dir would shadow the axon plugin deps
import sys, time
import numpy as np
import jax, jax.numpy as jnp

from isdf_tpu.config import Config
from isdf_tpu.core import flatness as fl, minco
from isdf_tpu.core.poly import PolyTraj
from isdf_tpu.shapes.gridsdf import grid_shape
from isdf_tpu.sweep.pallas_grid_zoom import (
    grid_sweep_warm_fused, grid_sweep_inputs)

conf = Config(integralIntervs=32, sweep_coarse_samples=64,
              sweep_refine_rounds=12, vmax=5.0, omgmax=5.0, thetamax=1.5,
              safety_hor=0.4, mem_size=8)
params = fl.FlatParams.from_config(conf)
rng = np.random.default_rng(0)
N = 6
q = jnp.asarray(np.linspace(1, 9, N - 1)[:, None] * np.array([1.0, 0.3, 0.15])
                + rng.normal(scale=0.3, size=(N - 1, 3)), jnp.float32)
T = jnp.asarray(rng.uniform(1.2, 2.2, size=N), jnp.float32)
head = jnp.zeros((3, 3), jnp.float32)
tail = jnp.zeros((3, 3), jnp.float32).at[:, 0].set(
    jnp.asarray([10.0, 3.0, 1.5], jnp.float32))
traj = PolyTraj(T, minco.solve(q, T, head, tail))

gn, gres = 64, 0.04
gorigin = np.full(3, -0.5 * gn * gres)
ii = np.stack(np.meshgrid(*[np.arange(gn)] * 3, indexing="ij"), axis=-1)
gp = gorigin + ii * gres
gxy = np.sqrt(gp[..., 0] ** 2 + gp[..., 1] ** 2) - 0.6
gfield = np.sqrt(gxy ** 2 + gp[..., 2] ** 2) - 0.25
gshape = grid_shape("probe_torus64", gfield, gorigin, gres)

P = 32768
pts = jnp.asarray(rng.uniform(-1, 11, size=(P, 3)), jnp.float32)
tw0 = jnp.zeros((P,), jnp.float32)
dims, dims_c, fieldZ, fieldZc, geo = grid_sweep_inputs(gshape.grid)
durs = traj.durations
starts = jnp.cumsum(durs) - durs

for karg in ([int(a) for a in sys.argv[1:]] or [8]):
    fn = jax.jit(lambda p, tw: grid_sweep_warm_fused(
        dims, dims_c, params, fieldZ, fieldZc, geo, p, tw, starts, durs,
        traj.coeffs, coarse_n=64, rounds=12, k=karg))
    t_s, d_s, g_s = fn(pts, tw0)
    jax.block_until_ready(d_s)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        it = 10
        for _ in range(it):
            t_s, d_s, g_s = fn(pts, t_s)
        jax.block_until_ready(d_s)
        dt = (time.perf_counter() - t0) / it
        best = dt if best is None else min(best, dt)
    print(f"k={karg}: {P/best/1e6:.3f}M q/s  ({best*1e3:.2f} ms/call)")
