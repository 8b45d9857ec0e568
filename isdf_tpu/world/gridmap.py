"""Occupancy grids and Euclidean SDFs of the environment.

Re-design of the reference's map layer (SURVEY.md §2 L2):
  * ``GridMap`` ≈ ``GridMap3D`` (ref src/map_manager/include/GridMap3D.h:10)
    + the occupancy-building part of ``PCSmapManager``
    (ref src/map_manager/src/PCSmap_manager.cpp:106-181): point cloud →
    boolean voxel grid with a hit-count threshold (`sta_threshold`).
  * The ESDF (ref Gridmap3D.cpp:361-533 ``generateESDF3d``/``fillESDF``,
    Felzenszwalb's serial lower-envelope scan) is replaced by the same
    *separable squared distance transform* expressed as a dense min-plus
    reduction per axis — d[i] = min_j (f[j] + (i−j)²) as an O(n²) masked
    minimum that XLA tiles across the VPU, batched over the other two axes.
    Exact same result, no serial loop.
  * Trilinear SDF value+gradient interpolation mirrors
    GridMap3D.h:114-193 ``getSDFValueWithGrad``.

The grid is a small pytree usable inside jit.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class GridMap(NamedTuple):
    occ: jax.Array                 # (X, Y, Z) bool occupancy
    origin: jax.Array              # (3,) world coords of voxel (0,0,0) corner
    resolution: jax.Array          # scalar
    esdf: Optional[jax.Array] = None   # (X, Y, Z) signed distance (world units)

    # -- constructors --------------------------------------------------------
    @staticmethod
    def from_points(
        points: np.ndarray,
        bounds: Optional[Tuple[float, ...]] = None,
        resolution: float = 0.15,
        sta_threshold: int = 1,
        pad: float = 0.0,
    ) -> "GridMap":
        """Point cloud → occupancy (ref PCSmap_manager.cpp:106-181).

        bounds = (xmin, xmax, ymin, ymax, zmin, zmax), reference mapBound;
        None measures the cloud's own bounding box (+pad), which is what the
        reference's PCSmapManager does (PCSmap_manager.cpp:111-143).
        Host-side (runs once per map).
        """
        if bounds is None:
            p = np.asarray(points)
            lo, hi = p.min(axis=0) - pad, p.max(axis=0) + pad
            bounds = (lo[0], hi[0], lo[1], hi[1], lo[2], hi[2])
        bounds = np.asarray(bounds, dtype=np.float64)
        origin = bounds[[0, 2, 4]]
        size = np.maximum(
            np.ceil((bounds[[1, 3, 5]] - origin) / resolution).astype(int), 1
        )
        idx = np.floor((np.asarray(points) - origin) / resolution).astype(int)
        ok = np.all((idx >= 0) & (idx < size), axis=1)
        idx = idx[ok]
        counts = np.zeros(tuple(size), dtype=np.int32)
        np.add.at(counts, (idx[:, 0], idx[:, 1], idx[:, 2]), 1)
        occ = counts >= sta_threshold
        return GridMap(
            occ=jnp.asarray(occ),
            origin=jnp.asarray(origin),
            resolution=jnp.asarray(resolution, dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32),
        )

    # -- geometry ------------------------------------------------------------
    @property
    def shape(self):
        return self.occ.shape

    def world_to_index(self, p):
        return jnp.floor((p - self.origin) / self.resolution).astype(jnp.int32)

    def index_to_world(self, idx):
        """Voxel center (ref GridMap3D.h getGridCubeCenter)."""
        return self.origin + (idx.astype(self.origin.dtype) + 0.5) * self.resolution

    def is_valid_index(self, idx):
        s = jnp.array(self.occ.shape)
        return jnp.all((idx >= 0) & (idx < s), axis=-1)

    def is_occupied_index(self, idx):
        idc = jnp.clip(idx, 0, jnp.array(self.occ.shape) - 1)
        inside = self.is_valid_index(idx)
        return inside & self.occ[idc[..., 0], idc[..., 1], idc[..., 2]]

    def is_occupied(self, p):
        return self.is_occupied_index(self.world_to_index(p))

    def occupied_centers(self) -> np.ndarray:
        """World coords of all occupied voxel centers (host)."""
        idx = np.argwhere(np.asarray(self.occ))
        return np.asarray(self.origin) + (idx + 0.5) * float(self.resolution)

    # -- inflation -----------------------------------------------------------
    def inflated(self, radius_vox: int) -> "GridMap":
        """Dilate occupancy by a box kernel of ±radius_vox (ref
        PCSmap_manager bit-kernel inflation / isIndexOccupiedFlate)."""
        k = 2 * radius_vox + 1
        occ = self.occ.astype(jnp.float32)[None, None]
        kernel = jnp.ones((1, 1, k, k, k), jnp.float32)
        out = jax.lax.conv_general_dilated(
            occ, kernel, (1, 1, 1), "SAME"
        )[0, 0]
        return self._replace(occ=out > 0.5)

    # -- ESDF ----------------------------------------------------------------
    def with_esdf(self) -> "GridMap":
        d2_out = _edt2(self.occ)                     # squared dist to occupied
        d2_in = _edt2(~self.occ)                     # squared dist to free
        res = self.resolution
        esdf = (jnp.sqrt(d2_out) - jnp.sqrt(d2_in)) * res
        return self._replace(esdf=esdf)

    def sdf_value(self, p):
        """Trilinear ESDF interpolation at world points (..., 3)
        (ref GridMap3D.h:114-150)."""
        return _trilinear(self.esdf, self.origin, self.resolution, p)

    def sdf_grad(self, p):
        return jax.grad(lambda q: jnp.sum(self.sdf_value(q)))(p)

    def sdf_value_grad(self, p):
        return self.sdf_value(p), self.sdf_grad(p)


# ---------------------------------------------------------------------------
def _dt_1d_minplus(f):
    """Exact 1-D squared distance transform d[i] = min_j f[j] + (i−j)²,
    as a dense (n, n) min-reduction (TPU-friendly; same result as the
    reference's lower-envelope scan, Gridmap3D.cpp:494-533)."""
    n = f.shape[-1]
    i = jnp.arange(n)
    d = (i[:, None] - i[None, :]).astype(f.dtype) ** 2
    return jnp.min(f[..., None, :] + d, axis=-1)


@jax.jit
def _edt2(occ):
    """Squared Euclidean distance (in voxels) to the nearest True voxel."""
    big = jnp.asarray(1e12, jnp.float32)
    f = jnp.where(occ, 0.0, big).astype(jnp.float32)
    f = _dt_1d_minplus(f)                       # along z
    f = _dt_1d_minplus(jnp.moveaxis(f, 1, 2))   # along y
    f = _dt_1d_minplus(jnp.moveaxis(f, 0, 2))   # along x
    # axes are now (y, z, x) → restore (x, y, z)
    f = jnp.moveaxis(jnp.moveaxis(f, 2, 0), 2, 1)
    return jnp.minimum(f, big)


def _trilinear(field, origin, resolution, p):
    """Trilinear interpolation of a scalar field at world points, clamped at
    the border; differentiable in p."""
    g = (p - origin) / resolution - 0.5
    size = jnp.array(field.shape)
    g = jnp.clip(g, 0.0, (size - 1).astype(g.dtype) - 1e-6)
    i0 = jnp.floor(g).astype(jnp.int32)
    i0 = jnp.clip(i0, 0, size - 2)
    frac = g - i0.astype(g.dtype)

    def gather(ox, oy, oz):
        return field[
            i0[..., 0] + ox, i0[..., 1] + oy, i0[..., 2] + oz
        ]

    fx, fy, fz = frac[..., 0], frac[..., 1], frac[..., 2]
    c000, c100 = gather(0, 0, 0), gather(1, 0, 0)
    c010, c110 = gather(0, 1, 0), gather(1, 1, 0)
    c001, c101 = gather(0, 0, 1), gather(1, 0, 1)
    c011, c111 = gather(0, 1, 1), gather(1, 1, 1)
    c00 = c000 * (1 - fx) + c100 * fx
    c10 = c010 * (1 - fx) + c110 * fx
    c01 = c001 * (1 - fx) + c101 * fx
    c11 = c011 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz
