"""Pallas TPU kernel for the swept-SDF coarse time scan.

The coarse pass computes the (P, T) body-SDF table from shared trajectory
poses and reduces it to per-point (min, argmin).  XLA's fusion already does
this well for analytic shapes; this kernel exists to (a) keep the whole
table in VMEM (never materializing P×T in HBM — the same blockwise-reduce
trick as streaming attention softmax, SURVEY.md §5 "blockwise-scanned
running-min"), and (b) serve as the template for grid-SDF shapes where the
XLA gather path is weak.

The shape's ``sdf`` closure traces inside the kernel body (Pallas runs jnp
elementwise ops on the VPU); array constants captured by the closure (e.g.
a cone's axis endpoints) are lifted into kernel inputs via
``jax.closure_convert``.  Rotation is applied as unrolled multiply-adds
(no 3×3 dot_general in the kernel).

Falls back transparently: ``coarse_scan(..., use_pallas=False)`` is the
pure-XLA twin used on CPU/interpret tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P_BLK = 256


def _kernel(sdf_fn, n_consts, pts_ref, xs_ref, rs_ref, *refs):
    const_refs = refs[:n_consts]
    dmin_ref, jmin_ref = refs[n_consts], refs[n_consts + 1]
    p = pts_ref[:]                       # (P_BLK, 3)
    xs = xs_ref[:]                       # (T, 3)
    rs = rs_ref[:]                       # (T, 9) row-major R
    consts = [r[:] for r in const_refs]

    diff = p[:, None, :] - xs[None, :, :]            # (P_BLK, T, 3)
    # p_rel_i = Σ_j R[t, j, i] diff[b, t, j]  (Rᵀ·diff), unrolled over 3
    prel = jnp.stack(
        [
            rs[None, :, 0] * diff[..., 0]
            + rs[None, :, 3] * diff[..., 1]
            + rs[None, :, 6] * diff[..., 2],
            rs[None, :, 1] * diff[..., 0]
            + rs[None, :, 4] * diff[..., 1]
            + rs[None, :, 7] * diff[..., 2],
            rs[None, :, 2] * diff[..., 0]
            + rs[None, :, 5] * diff[..., 1]
            + rs[None, :, 8] * diff[..., 2],
        ],
        axis=-1,
    )
    d = sdf_fn(prel, *consts)                        # (P_BLK, T)
    # shapes may carry f64 constants under x64 mode — pin the output dtype
    dmin_ref[:] = jnp.min(d, axis=1).astype(dmin_ref.dtype)
    jmin_ref[:] = jnp.argmin(d, axis=1).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("shape", "use_pallas", "interpret")
)
def coarse_scan(shape, pts, xs, Rs, use_pallas: bool = True,
                interpret: bool = False):
    """(min over t of SDF, argmin index) for each point.

    pts (P, 3), xs (T, 3), Rs (T, 3, 3) → ((P,), (P,) int32).
    P must be a multiple of P_BLK when use_pallas (pad upstream).
    """
    if not use_pallas:
        diff = pts[:, None, :] - xs[None, :, :]
        prel = jnp.einsum("tji,ptj->pti", Rs, diff)
        d = shape.sdf(prel)
        return jnp.min(d, axis=1), jnp.argmin(d, axis=1).astype(jnp.int32)

    P = pts.shape[0]
    T = xs.shape[0]
    dtype = pts.dtype
    rs_flat = Rs.reshape(T, 9).astype(dtype)

    # lift closure-captured array constants into explicit inputs: trace the
    # SDF to a jaxpr, ship its consts as kernel operands, replay inside
    example = jax.ShapeDtypeStruct((P_BLK, T, 3), dtype)
    closed = jax.make_jaxpr(lambda q: shape.sdf(q))(example)
    const_shapes = [jnp.shape(c) for c in closed.consts]

    def sdf_fn(q, *cs):
        cs = [c.reshape(s) for c, s in zip(cs, const_shapes)]
        return jax.core.eval_jaxpr(closed.jaxpr, cs, q)[0]

    consts = [jnp.atleast_1d(jnp.asarray(c)) for c in closed.consts]
    const_specs = []
    for c in consts:
        shp = c.shape
        const_specs.append(
            pl.BlockSpec(shp, (lambda nd: (lambda i: (0,) * nd))(len(shp)),
                         memory_space=pltpu.VMEM)
        )

    grid = (P // P_BLK,)
    return pl.pallas_call(
        functools.partial(_kernel, sdf_fn, len(consts)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((P_BLK, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 9), lambda i: (0, 0), memory_space=pltpu.VMEM),
            *const_specs,
        ],
        out_specs=(
            pl.BlockSpec((P_BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((P_BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((P,), dtype),
            jax.ShapeDtypeStruct((P,), jnp.int32),
        ),
        interpret=interpret,
    )(pts, xs, rs_flat, *consts)
