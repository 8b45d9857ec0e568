"""Probe: single-program batched_solve vs chunked path on the real chip."""
import os, sys, time
import jax

cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import jax.numpy as jnp
import numpy as np
from isdf_tpu.config import Config
from isdf_tpu.shapes import make_shape
from isdf_tpu.parallel import batch as pb

conf = Config(
    integralIntervs=32, sweep_coarse_samples=64, sweep_refine_rounds=12,
    vmax=5.0, omgmax=5.0, thetamax=1.5, safety_hor=0.4, mem_size=8,
)
shape = make_shape("CappedCone", conf)
dtype = jnp.float32
B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 24
mode = sys.argv[3] if len(sys.argv) > 3 else "single"

sb = pb.make_random_batch(conf, B=B, N=4, n_points=512, dtype=dtype)

t0 = time.perf_counter()
if mode == "single":
    out = pb.batched_solve(shape, conf, sb, max_iters=iters)
    jax.block_until_ready(out[2])
    print(f"compile+first run: {time.perf_counter()-t0:.1f}s")
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = pb.batched_solve(shape, conf, sb, max_iters=iters)
        jax.block_until_ready(out[2])
    dt = (time.perf_counter() - t0) / reps
else:
    out = pb.batched_solve_chunked(shape, conf, sb, max_iters=iters, chunk=2)
    jax.block_until_ready(out[2])
    print(f"compile+first run: {time.perf_counter()-t0:.1f}s")
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        out = pb.batched_solve_chunked(shape, conf, sb, max_iters=iters, chunk=2)
        jax.block_until_ready(out[2])
    dt = (time.perf_counter() - t0) / reps
print(f"mode={mode} B={B} iters={iters}: {dt*1e3:.1f} ms/solve-batch, {B/dt:.2f} plans/s")
