"""Probe: where does the B=128 chunked solve time go?"""
import os, sys, time
import jax
from isdf_tpu.utils.cache import setup_compilation_cache
setup_compilation_cache()

import jax.numpy as jnp
from isdf_tpu.config import Config
from isdf_tpu.shapes import make_shape
from isdf_tpu.parallel import batch as pb
from isdf_tpu.opt import backend
from isdf_tpu.core import timemap
from isdf_tpu.core import flatness as fl

conf = Config(
    integralIntervs=32, sweep_coarse_samples=64, sweep_refine_rounds=12,
    vmax=5.0, omgmax=5.0, thetamax=1.5, safety_hor=0.4, mem_size=8,
)
shape = make_shape("CappedCone", conf)
B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
sb = pb.make_random_batch(conf, B=B, N=4, n_points=512, dtype=jnp.float32)

# 1. single vmapped cost+grad eval
t0 = time.perf_counter()
f, g = pb.batched_cost_and_grad(shape, conf, sb)
jax.block_until_ready(f)
print(f"cost_and_grad compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
for _ in range(2):
    t0 = time.perf_counter()
    f, g = pb.batched_cost_and_grad(shape, conf, sb)
    jax.block_until_ready(f)
    print(f"cost_and_grad warm: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)

# 2. one chunk (2 iters)
t0 = time.perf_counter()
res = pb._chunk_first(shape, conf, 2, sb)
jax.block_until_ready(res.f)
print(f"chunk_first(2) compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
res = pb._chunk_first(shape, conf, 2, sb)
jax.block_until_ready(res.f)
print(f"chunk_first(2) warm: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)

# 3. continuation chunk
t0 = time.perf_counter()
res2 = pb._chunk_cont(shape, conf, 2, sb, res.state)
jax.block_until_ready(res2.f)
print(f"chunk_cont(2) compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
for _ in range(2):
    t0 = time.perf_counter()
    res2 = pb._chunk_cont(shape, conf, 2, sb, res2.state)
    jax.block_until_ready(res2.f)
    print(f"chunk_cont(2) warm: {(time.perf_counter()-t0)*1e3:.1f} ms", flush=True)
