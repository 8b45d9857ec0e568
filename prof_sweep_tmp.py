import time, numpy as np
import jax, jax.numpy as jnp
from isdf_tpu.core import flatness as fl
from isdf_tpu.core.so3 import quat_to_rot
from isdf_tpu.shapes import make_shape
from isdf_tpu.config import Config

dtype = jnp.float32
params = fl.FlatParams()
shape = make_shape("CappedCone", Config())
rng = np.random.default_rng(0)

def timeit(f, *a, n=5):
    r = f(*a); jax.block_until_ready(r)
    t0=time.perf_counter()
    for _ in range(n): r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/n

for P in (32768, 262144):
    va = jnp.asarray(rng.normal(size=(P,3)),dtype)
    REPS = 50
    @jax.jit
    def flat_loop(v):
        def body(i, acc):
            vv = v + acc[:, :1] * 1e-9
            quat = fl.tilt_quat(vv, vv*0.5, params)
            R = quat_to_rot(quat)
            prel = jnp.einsum("...ji,...j->...i", R, vv)
            return acc + jnp.concatenate([shape.sdf(prel)[:,None], prel], axis=1)*1e-6
        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((v.shape[0],4), dtype))
    dt = timeit(flat_loop, va)
    print(f"P={P}: state-eval chain inside fori: {P*REPS/dt/1e6:.1f} M evals/s  ({dt*1e3:.2f} ms/call)", flush=True)
