"""Padded voxel-field layout for the grid (mesh-robot) Pallas kernels.

Mesh robots (ref Generalshape, Shape.cpp:27-151) are baked SDF voxel grids
(shapes/gridsdf.py).  ``PaddedGrid``/``pad_grid`` hold the lane-aligned 2-D
flattening every grid consumer shares; the production TPU kernel itself
lives in pallas_grid_zoom.py (grid_sweep_warm_fused — the round-4 fused
coarse+zoom+epilogue kernel; the standalone coarse-scan kernel that used to
live here was superseded by it and removed).

Ref for behavior: Shape.hpp:481-600 getonlySDFNum trilinear lookup.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


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
