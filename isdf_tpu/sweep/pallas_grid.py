"""Pallas TPU kernel: swept-SDF coarse time scan for GRID-backed shapes.

Mesh robots (ref Generalshape, Shape.cpp:27-151) are baked SDF voxel grids
(shapes/gridsdf.py); evaluating them is a trilinear interpolation — 8
gathers per query.  The XLA gather path scalarizes on TPU; this kernel is
gather-FREE: it recasts trilinear interpolation as
  * a two-hot (P_BLK, Nx) × (Nx, Ny·Nz) matmul along x (MXU — the gather
    becomes a matrix product against the whole field), then
  * a lane-decomposed two-hot mask product along y and z (VPU): with the
    field flattened to lanes l = iy·Nz + iz, the bilinear (y, z) corner
    selection is  Σ_l A[q, l]·wy(l//Nz)·wz(l%Nz).
The T coarse time steps loop inside the kernel with a running (min, argmin)
in VMEM — the P×T table never exists in HBM (same blockwise-reduce trick as
streaming-softmax attention).

The trajectory enters as per-time affine maps grid = M(t)·p + c(t) with
M = Rᵀ(t)/res, c = −M·x(t) − origin/res (precomputed by XLA, read from
SMEM).  Outside the grid the field falls back to boundary value + distance
to the grid box, bit-matching shapes/gridsdf._interp.

Ref for behavior: sw_manager.hpp:677-747 getSDFofSweptVolume coarse pass +
Shape.hpp:481-600 getonlySDFNum trilinear lookup.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P_BLK = 128


class PaddedGrid(NamedTuple):
    """Host-side padded field + geometry for the kernel (hashable by id —
    build once per shape via ``pad_grid`` and reuse)."""

    field2d: np.ndarray      # (NxP, NyP·NzP) f32, zero-padded
    nx: int                  # true dims
    ny: int
    nz: int
    nyp: int
    nzp: int
    origin: np.ndarray       # (3,) f64
    res: float


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_grid(field: np.ndarray, origin, res: float) -> PaddedGrid:
    """Pad the (Nx, Ny, Nz) field so the kernel's flattened (y, z) lane
    dimension is a multiple of 128 and x a multiple of 8 (f32 tiles).
    Padded cells are never selected (indices clamp to true dims); zeros."""
    nx, ny, nz = field.shape
    nzp = 1 << int(np.ceil(np.log2(max(nz, 2))))       # pow2 so l%NzP is cheap
    nzp = max(nzp, 8)
    lane_mult = max(128 // nzp, 1)
    nyp = _round_up(ny, lane_mult)
    nxp = _round_up(nx, 8)
    f = np.zeros((nxp, nyp, nzp), dtype=np.float32)
    f[:nx, :ny, :nz] = np.asarray(field, np.float32)
    return PaddedGrid(
        field2d=f.reshape(nxp, nyp * nzp), nx=nx, ny=ny, nz=nz,
        nyp=nyp, nzp=nzp, origin=np.asarray(origin, np.float64),
        res=float(res),
    )


def _kernel(nx, ny, nz, nzp, T, pts_ref, m_ref, c_ref, field_ref,
            dmin_ref, jmin_ref):
    p = pts_ref[:]                                     # (P_BLK, 3)
    px, py, pz = p[:, 0:1], p[:, 1:2], p[:, 2:3]       # (P_BLK, 1)
    L = field_ref.shape[1]
    dt = dmin_ref.dtype

    l_iota = jax.lax.broadcasted_iota(jnp.int32, (P_BLK, L), 1)
    iy_l = l_iota // nzp
    iz_l = l_iota - iy_l * nzp
    x_iota = jax.lax.broadcasted_iota(jnp.int32, (P_BLK, field_ref.shape[0]), 1)

    def interp_at(t):
        # grid coords g = M(t)·p + c(t)
        def row(i):
            return (m_ref[t, 3 * i] * px + m_ref[t, 3 * i + 1] * py
                    + m_ref[t, 3 * i + 2] * pz + c_ref[t, i])

        gx, gy, gz = row(0), row(1), row(2)            # (P_BLK, 1)

        def axis(g, n):
            gc = jnp.clip(g, 0.0, (n - 1) - 1e-5)
            i0 = jnp.clip(jnp.floor(gc).astype(jnp.int32), 0, n - 2)
            return i0, gc - i0.astype(gc.dtype)

        i0x, fx = axis(gx, nx)
        i0y, fy = axis(gy, ny)
        i0z, fz = axis(gz, nz)

        wx = (jnp.where(x_iota == i0x, 1.0 - fx, 0.0)
              + jnp.where(x_iota == i0x + 1, fx, 0.0)).astype(dt)
        A = jnp.dot(wx, field_ref[:], preferred_element_type=jnp.float32)
        wy = (jnp.where(iy_l == i0y, 1.0 - fy, 0.0)
              + jnp.where(iy_l == i0y + 1, fy, 0.0))
        wz = (jnp.where(iz_l == i0z, 1.0 - fz, 0.0)
              + jnp.where(iz_l == i0z + 1, fz, 0.0))
        inner = jnp.sum(A * wy * wz, axis=1, keepdims=True)  # (P_BLK, 1)

        # outside fallback (world units) — matches gridsdf._interp
        res = c_ref[t, 3]                              # res smuggled in c[3]
        def over(g, n):
            return jnp.maximum(g - (n - 1), 0.0) + jnp.minimum(g, 0.0)

        ov2 = (over(gx, nx) ** 2 + over(gy, ny) ** 2 + over(gz, nz) ** 2)
        outside = jnp.sqrt(ov2 * (res * res) + 1e-12)
        return inner + outside

    def body(t, carry):
        dmin, jmin = carry
        d = interp_at(t)
        better = d < dmin
        return (jnp.where(better, d, dmin),
                jnp.where(better, t, jmin))

    d0 = interp_at(0)
    j0 = jnp.zeros((P_BLK, 1), jnp.int32)
    dmin, jmin = jax.lax.fori_loop(1, T, body, (d0, j0))
    dmin_ref[:] = dmin.astype(dmin_ref.dtype)
    jmin_ref[:] = jmin


@functools.partial(
    jax.jit, static_argnames=("dims", "interpret")
)
def _grid_coarse_scan_padded(field2d, dims, pts, Ms, cs, interpret=False):
    nx, ny, nz, nzp = dims
    P = pts.shape[0]
    T = Ms.shape[0]
    grid = (P // P_BLK,)
    kern = functools.partial(_kernel, nx, ny, nz, nzp, T)
    fshape = field2d.shape
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((P_BLK, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, 9), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((T, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(fshape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((P_BLK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P_BLK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((P, 1), pts.dtype),
            jax.ShapeDtypeStruct((P, 1), jnp.int32),
        ),
        interpret=interpret,
    )(pts, Ms, cs, field2d)


def grid_coarse_scan(pg: PaddedGrid, pts, xs, Rs, interpret: bool = False):
    """(min over t of grid-SDF, argmin t index) for each point — the Pallas
    production path for grid shapes.

    pts (P, 3) world points, xs (T, 3) positions, Rs (T, 3, 3) attitudes →
    ((P,), (P,) int32).  Pads P to a multiple of P_BLK internally.  Inputs
    are stop-gradiented (the scan only seeds the argmin; callers re-evaluate
    the SDF differentiably at t*)."""
    pts = jax.lax.stop_gradient(pts)
    xs = jax.lax.stop_gradient(xs)
    Rs = jax.lax.stop_gradient(Rs)
    dtype = pts.dtype
    P = pts.shape[0]
    Pp = _round_up(max(P, P_BLK), P_BLK)
    if Pp != P:
        pts = jnp.concatenate(
            [pts, jnp.zeros((Pp - P, 3), dtype)], axis=0)

    inv_res = 1.0 / pg.res
    # M(t) = Rᵀ/res (row-major), c(t) = −M·x − origin/res; c[:, 3] = res
    Ms = (jnp.swapaxes(Rs, -1, -2) * inv_res).reshape(-1, 9).astype(jnp.float32)
    origin = jnp.asarray(pg.origin, jnp.float32)
    c3 = (-jnp.einsum("tij,tj->ti", Ms.reshape(-1, 3, 3),
                      xs.astype(jnp.float32))
          - origin[None, :] * jnp.float32(inv_res))
    cs = jnp.concatenate(
        [c3, jnp.full((c3.shape[0], 1), pg.res, jnp.float32)], axis=1)

    field2d = jnp.asarray(pg.field2d)
    dims = (pg.nx, pg.ny, pg.nz, pg.nzp)
    dmin, jmin = _grid_coarse_scan_padded(
        field2d, dims, pts.astype(jnp.float32), Ms, cs, interpret=interpret)
    return dmin[:P, 0].astype(dtype), jmin[:P, 0]
