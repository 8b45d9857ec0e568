import time, numpy as np, jax, jax.numpy as jnp
from isdf_tpu.config import Config
from isdf_tpu.parallel import batch as pb
from isdf_tpu.shapes import make_shape
conf = Config(integralIntervs=32, sweep_coarse_samples=64, sweep_refine_rounds=12,
              vmax=5.0, omgmax=5.0, thetamax=1.5, safety_hor=0.4, mem_size=8)
shape = make_shape("CappedCone", conf)
sb = pb.make_random_batch(conf, B=256, N=4, n_points=512, dtype=jnp.float32)
t0=time.perf_counter()
f, g = pb.batched_cost_and_grad(shape, conf, sb)
jax.block_until_ready(f)
print("cost+grad ok", time.perf_counter()-t0, "s; finite:", bool(jnp.all(jnp.isfinite(f))), flush=True)
t0=time.perf_counter()
f, g = pb.batched_cost_and_grad(shape, conf, sb)
jax.block_until_ready(f)
print("steady:", time.perf_counter()-t0, flush=True)
# now one chunk of 2 iterations
t0=time.perf_counter()
out = pb.batched_solve_chunked(shape, conf, sb, max_iters=2, chunk=2)
jax.block_until_ready(out[2])
print("chunk2 ok", time.perf_counter()-t0, flush=True)
