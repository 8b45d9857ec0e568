import time, numpy as np
import jax, jax.numpy as jnp
from isdf_tpu.config import Config
from isdf_tpu.core import flatness as fl, minco
from isdf_tpu.core.so3 import quat_to_rot
from isdf_tpu.core.poly import PolyTraj
from isdf_tpu.shapes import make_shape
from isdf_tpu.sweep.fast_eval import sdf_at_time_fast, _FACT, _POW

dtype = jnp.float32
conf = Config()
shape = make_shape("CappedCone", conf)
params = fl.FlatParams.from_config(conf)
rng = np.random.default_rng(0)
N=6
q = jnp.asarray(np.linspace(1,9,N-1)[:,None]*np.array([1.,.3,.15])+rng.normal(scale=.3,size=(N-1,3)), dtype)
T = jnp.asarray(rng.uniform(1.2,2.2,size=N), dtype)
head = jnp.zeros((3,3),dtype); tail = jnp.zeros((3,3),dtype).at[:,0].set(jnp.asarray([10.,3.,1.5],dtype))
traj = PolyTraj(T, minco.solve(q,T,head,tail))
P=32768; K=8
pts = jnp.asarray(rng.uniform(-1,11,size=(P,3)),dtype)
t0w = jnp.asarray(rng.uniform(0,10,size=(P,)),dtype)

def timeit(f,*a,n=10):
    r=f(*a); jax.block_until_ready(r)
    t0=time.perf_counter()
    for _ in range(n): r=f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/n

# loop of 12 zoom-like rounds fully inside jit (current structure)
REPS=12
@jax.jit
def zoom_cur(p, t0):
    offs = jnp.linspace(-1.,1.,K).astype(dtype)
    def body(c,_):
        t,w = c
        cand = jnp.clip(t[:,None]+w[:,None]*offs[None,:],0.,10.).astype(dtype)
        d = sdf_at_time_fast(shape, traj, params, p[:,None,:], cand)
        j = jnp.argmin(d,axis=1)
        tn = jnp.take_along_axis(cand,j[:,None],1)[:,0]
        return (tn,(w*(2./(K-1))).astype(dtype)), None
    (t,_),_ = jax.lax.scan(body,(t0,jnp.full_like(t0,0.2)),None,length=REPS)
    return t
print("zoom12 current:", round(P/timeit(zoom_cur,pts,t0w)/1e6,3),"Mq/s", flush=True)

# variant: orders 0..2 only + mult-sum
def pvaj3(traj, t):
    durations = traj.durations.astype(dtype)
    cum = jnp.cumsum(durations); starts = cum - durations
    tc = jnp.clip(t, 0., cum[-1])
    idx = jnp.clip(jnp.searchsorted(cum, jax.lax.stop_gradient(tc)),0,N-1)
    oh = jax.nn.one_hot(idx, N, dtype=dtype)
    s = jnp.clip(t[...,None]-starts, 0., durations)
    one = jnp.ones_like(s); pows=[one]
    for _ in range(5): pows.append(pows[-1]*s)
    P6 = jnp.stack(pows,-1)
    coeffs = traj.coeffs.astype(dtype)
    outs=[]
    for d in range(3):
        fact = jnp.asarray(_FACT[d],dtype)
        b = fact*P6[..., _POW[d]]
        pp = (b[...,None]*coeffs).sum(-2)
        outs.append((oh[...,None]*pp).sum(-2))
    return outs
@jax.jit
def zoom_v2(p, t0):
    offs = jnp.linspace(-1.,1.,K).astype(dtype)
    def body(c,_):
        t,w = c
        cand = jnp.clip(t[:,None]+w[:,None]*offs[None,:],0.,10.).astype(dtype)
        pos, vel, acc = pvaj3(traj, cand)
        quat = fl.tilt_quat(vel, acc, params)
        R = quat_to_rot(quat)
        prel = jnp.einsum("...ji,...j->...i", R, p[:,None,:]-pos)
        d = shape.sdf(prel)
        j = jnp.argmin(d,axis=1)
        tn = jnp.take_along_axis(cand,j[:,None],1)[:,0]
        return (tn,(w*(2./(K-1))).astype(dtype)), None
    (t,_),_ = jax.lax.scan(body,(t0,jnp.full_like(t0,0.2)),None,length=REPS)
    return t
print("zoom12 v2(3ord,multsum):", round(P/timeit(zoom_v2,pts,t0w)/1e6,3),"Mq/s", flush=True)
d = jnp.max(jnp.abs(zoom_cur(pts,t0w)-zoom_v2(pts,t0w)))
print("tstar diff:", float(d), flush=True)
