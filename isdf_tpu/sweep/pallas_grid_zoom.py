"""Pallas TPU kernel: fused zoom refinement for GRID-backed (mesh) shapes.

The analytic fused sweep (pallas_zoom.py) cannot serve mesh robots — their
SDF is a baked voxel grid and vectorized gathers don't exist on TPU.  The
XLA gather path runs at ~14M trilinear lookups/s (measured, BASELINE.md
"grid-shape sweep"), throttling the grid sweep to 0.06M queries/s.  This
kernel recasts the lookup as the same gather-free two-hot algebra as
pallas_grid.py's coarse scan, but fused across ALL zoom rounds:

  per candidate column-block (queries in lanes):
    wx (Nx, B)   two-hot x-interpolation weights        (VPU build)
    A  = field2dᵀ @ wx → (L, B)  x-interpolated slabs    (MXU, bf16)
    d  = Σ_l A · wy(l) · wz(l)  lane-masked (y, z) pick  (VPU, bf16)

The trajectory pose chain runs in the same (k, B) lanes layout as the
analytic kernel (pvaj Horner from SMEM + flatness tilt), so the only grid
cost is the slab product — O(Nx·L) per query, traded for zero gathers.
Values steer the argmin only (bf16 is ample); callers re-evaluate f32
differentiably at t* outside.

Ref for behavior: sw_manager.hpp:1000-1062 gradientDescent +
Shape.hpp:481-600 getonlySDFNum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from isdf_tpu.sweep.pallas_zoom import (
    _load_coeff_tables, _pvaj_rows, _plateau_rows, _round_up)
from isdf_tpu.sweep.fast_eval import pose_components, rel_components

B_PTS = 256  # query lanes per block


def _make_grid_zoom_kernel(params, rounds: int, k: int, N: int,
                           n_coef: int, nx: int, ny: int, nz: int,
                           nzp: int, L: int):
    def kernel(pts_ref, t0_ref, w0_ref, starts_ref, durs_ref, coeffs_ref,
               geo_ref, fieldT_ref, tstar_ref, dstar_ref):
        dtype = t0_ref.dtype
        blk = t0_ref.shape[-1]
        pts2 = pts_ref[...].reshape(3, blk)
        px = pts2[0:1, :]
        py = pts2[1:2, :]
        pz = pts2[2:3, :]
        starts = [starts_ref[n] for n in range(N)]
        durs = [durs_ref[n] for n in range(N)]
        cum = []
        acc_t = None
        for n in range(N):
            acc_t = durs[n] if acc_t is None else acc_t + durs[n]
            cum.append(acc_t)
        total = cum[N - 1]
        cd_tab = _load_coeff_tables(
            lambda n, kk, ax: coeffs_ref[n, kk, ax], N, n_coef)
        ox, oy, oz, inv_res, res = (geo_ref[i] for i in range(5))

        ioff = jax.lax.broadcasted_iota(jnp.int32, (k, blk), 0).astype(dtype)
        offs = ioff * (2.0 / (k - 1)) - 1.0

        # lane/sublane iotas for weight construction
        x_iota = jax.lax.broadcasted_iota(jnp.int32, (nx if nx % 8 == 0
                                                      else _round_up(nx, 8),
                                                      blk), 0)
        nxp = x_iota.shape[0]
        l_iota = jax.lax.broadcasted_iota(jnp.int32, (L, blk), 0)
        iy_l = l_iota // nzp
        iz_l = l_iota - iy_l * nzp

        def grid_eval(cand):
            """SDF at candidate times (k, B) via two-hot slab algebra."""
            pos, vel, acc = _pvaj_rows(starts, durs, cum, cd_tab, cand)
            x3, R = pose_components(pos, vel, acc, params)
            rx, ry, rz = rel_components((px, py, pz), x3, R)
            gx = (rx - ox) * inv_res
            gy = (ry - oy) * inv_res
            gz = (rz - oz) * inv_res

            def axis(g, n):
                gc = jnp.clip(g, 0.0, (n - 1) - 1e-5)
                i0 = jnp.clip(gc.astype(jnp.int32), 0, n - 2)
                return i0, gc - i0.astype(dtype)

            def over(g, n):
                return (jnp.maximum(g - (n - 1), 0.0)
                        + jnp.minimum(g, 0.0))

            d_rows = []
            for c in range(k):
                gxc = gx[c:c + 1, :]
                gyc = gy[c:c + 1, :]
                gzc = gz[c:c + 1, :]
                i0x, fx = axis(gxc, nx)
                i0y, fy = axis(gyc, ny)
                i0z, fz = axis(gzc, nz)
                # f32 slab algebra (bf16 variants measured SLOWER — the
                # (L, B) cast passes outweigh the halved MXU/VPU work;
                # BASELINE.md "grid-shape sweep")
                wx = (jnp.where(x_iota == i0x, 1.0 - fx, 0.0)
                      + jnp.where(x_iota == i0x + 1, fx, 0.0))
                A = jax.lax.dot_general(
                    fieldT_ref[...], wx.astype(jnp.float32),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)   # (L, B)
                wy = (jnp.where(iy_l == i0y, 1.0 - fy, 0.0)
                      + jnp.where(iy_l == i0y + 1, fy, 0.0))
                wz = (jnp.where(iz_l == i0z, 1.0 - fz, 0.0)
                      + jnp.where(iz_l == i0z + 1, fz, 0.0))
                inner = jnp.sum(A * wy * wz, axis=0, keepdims=True)
                ov2 = (over(gxc, nx) ** 2 + over(gyc, ny) ** 2
                       + over(gzc, nz) ** 2)
                outside = jnp.sqrt(ov2 * (res * res) + 1e-12)
                d_rows.append(inner + outside)
            return jnp.concatenate(d_rows, axis=0)      # (k, B)

        t = t0_ref[...].reshape(1, blk)
        w = w0_ref[...].reshape(1, blk)
        shrink = 2.0 / (k - 1)
        dm = None
        for _ in range(rounds):
            cand = jnp.clip(t + w * offs, 0.0, total)
            d = grid_eval(cand)
            t, dm = _plateau_rows(d, cand, k)
            w = w * shrink
        tstar_ref[...] = t.reshape(tstar_ref.shape)
        dstar_ref[...] = dm.reshape(dstar_ref.shape)

    return kernel


@functools.lru_cache(maxsize=None)
def _grid_zoom_callable(grid_dims, params, rounds, k, N, n_coef, L,
                        fshape, blk, interpret):
    """pallas invocation for one static config; sequential_vmap makes it
    legal (if per-scenario sequential) under the batched solver's vmap."""
    nx, ny, nz, nzp = grid_dims
    kern = _make_grid_zoom_kernel(
        params, rounds, k, N, n_coef, nx, ny, nz, nzp, L)

    @jax.custom_batching.sequential_vmap
    def call(ptsT, t0, w0, starts, durs, coeffs, geo, fieldT):
        Pp = ptsT.shape[-1]
        return pl.pallas_call(
            kern,
            grid=(Pp // blk,),
            in_specs=[
                pl.BlockSpec((3, blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((N,), lambda i: (0,), memory_space=pltpu.SMEM),
                pl.BlockSpec((N,), lambda i: (0,), memory_space=pltpu.SMEM),
                pl.BlockSpec((N, n_coef, 3), lambda i: (0, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((5,), lambda i: (0,), memory_space=pltpu.SMEM),
                pl.BlockSpec(fshape, lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, blk), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((1, Pp), jnp.float32),
                jax.ShapeDtypeStruct((1, Pp), jnp.float32),
            ),
            interpret=interpret,
        )(ptsT, t0, w0, starts, durs, coeffs, geo, fieldT)

    return call


@functools.partial(
    jax.jit,
    static_argnames=("grid_dims", "params", "rounds", "k", "interpret"),
)
def grid_zoom_refine(grid_dims, params, fieldT, geo, pts, t0, w0,
                     starts, durs, coeffs, rounds: int = 12, k: int = 8,
                     interpret: bool = False):
    """Fused grid zoom: seeds (t0, w0) per point → (t* (P,), d* (P,)).

    grid_dims: (nx, ny, nz, nzp) static; fieldT: (L, NxP) f32 transposed
    padded field (pad_grid layout, transposed); geo: (5,) f32
    [origin_xyz, 1/res, res].
    """
    pts = jax.lax.stop_gradient(pts)
    t0 = jax.lax.stop_gradient(t0).astype(jnp.float32)
    w0 = jax.lax.stop_gradient(w0).astype(jnp.float32)
    starts = jax.lax.stop_gradient(starts).astype(jnp.float32)
    durs = jax.lax.stop_gradient(durs).astype(jnp.float32)
    coeffs = jax.lax.stop_gradient(coeffs).astype(jnp.float32)

    dtype = pts.dtype
    P = pts.shape[0]
    N = durs.shape[0]
    n_coef = coeffs.shape[1]
    L = fieldT.shape[0]
    blk = min(B_PTS, _round_up(max(P, 128), 128))
    Pp = _round_up(max(P, blk), blk)
    ptsT = pts.astype(jnp.float32).T
    if Pp != P:
        pad = Pp - P
        ptsT = jnp.pad(ptsT, ((0, 0), (0, pad)))
        t0 = jnp.pad(t0, (0, pad))
        w0 = jnp.pad(w0, (0, pad), constant_values=1.0)

    call = _grid_zoom_callable(
        grid_dims, params, rounds, k, N, n_coef, L, fieldT.shape, blk,
        interpret)
    t_star, d_star = call(ptsT, t0[None, :], w0[None, :], starts, durs,
                          coeffs, geo, fieldT)
    return t_star[0, :P].astype(dtype), d_star[0, :P].astype(dtype)


def grid_zoom_inputs(pg):
    """(grid_dims, fieldT, geo) from a PaddedGrid (pallas_grid.pad_grid)."""
    fieldT = jnp.asarray(pg.field2d.T)                  # (L, NxP)
    geo = jnp.asarray(
        [pg.origin[0], pg.origin[1], pg.origin[2], 1.0 / pg.res, pg.res],
        jnp.float32)
    return (pg.nx, pg.ny, pg.nz, pg.nzp), fieldT, geo
