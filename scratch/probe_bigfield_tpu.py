"""Oversized-field (>8 MiB VMEM budget) sweep throughput: pooled-search
kernel + one-eval XLA epilogue vs the old full-gather fallback."""
import sys; sys.path.append("/root/repo")
import time
import numpy as np
import jax, jax.numpy as jnp

from isdf_tpu.config import Config
from isdf_tpu.core import flatness as fl, minco
from isdf_tpu.core.poly import PolyTraj
from isdf_tpu.shapes.gridsdf import grid_shape
from isdf_tpu.sweep.sweep_sdf import (
    sweep_sdf_warm, _field_vmem_bytes, _PALLAS_FIELD_VMEM_BUDGET)

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

gn = 192            # 192^3 bf16 z-major ≈ 14 MiB — over the 8 MiB budget
gres = 0.013
gorigin = np.full(3, -0.5 * gn * gres)
ii = np.stack(np.meshgrid(*[np.arange(gn)] * 3, indexing="ij"), axis=-1)
gp = gorigin + ii * gres
gxy = np.sqrt(gp[..., 0] ** 2 + gp[..., 1] ** 2) - 0.6
gfield = (np.sqrt(gxy ** 2 + gp[..., 2] ** 2) - 0.25).astype(np.float32)
gshape = grid_shape("probe_torus192", gfield, gorigin, gres)
print("field kernel bytes:", _field_vmem_bytes(gshape) / 2**20, "MiB; budget",
      _PALLAS_FIELD_VMEM_BUDGET / 2**20)

P = 32768
pts = jnp.asarray(rng.uniform(-1, 11, size=(P, 3)), jnp.float32)
tw0 = jnp.zeros((P,), jnp.float32)

for name, use_pallas in (("pooled-kernel", None), ("xla-gather-fallback", False)):
    fn = jax.jit(lambda p, tw: sweep_sdf_warm(
        gshape, traj, params, p, tw, coarse_n=64, refine_rounds=12,
        use_pallas=use_pallas))
    s, t_s, g = fn(pts, tw0)
    jax.block_until_ready(s)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        it = 5 if use_pallas is None else 1
        for _ in range(it):
            s, t_s, g = fn(pts, t_s)
        jax.block_until_ready(s)
        dt = (time.perf_counter() - t0) / it
        best = dt if best is None else min(best, dt)
    print(f"{name}: {P/best/1e6:.3f}M q/s  ({best*1e3:.1f} ms/call)")
