"""Swept-volume surface extraction.

The ``sw_calculate`` equivalent (ref src/swept_volume/src/sw_calculate.cpp:5
continuation-based sparse marching cubes with memoized per-corner time
minimization, sw_manager.hpp:1078-1193).  TPU re-design: instead of a
host-side continuation frontier with interval caches, evaluate the swept SDF
on the **whole dense grid in one batched device pass** (the argmin-over-time
kernel is exactly sweep/sweep_sdf.py, shared states amortized over all
voxels), then run marching tetrahedra on host (native C++, python fallback).
Dense-on-device beats sparse-on-host here: the grid for a typical swept
volume is ≲ 10⁶ voxels ≈ one sweep_sdf call.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isdf_tpu.sweep import sweep_sdf


def sdf_volume(shape, traj, params, origin, size, resolution: float,
               batch: int = 65536):
    """Dense swept-SDF grid: (X, Y, Z) field over origin + res·index."""
    X, Y, Z = size
    xs = origin[0] + np.arange(X) * resolution
    ys = origin[1] + np.arange(Y) * resolution
    zs = origin[2] + np.arange(Z) * resolution
    pts = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), axis=-1).reshape(-1, 3)
    out = np.empty(len(pts), dtype=np.float64)
    for i in range(0, len(pts), batch):
        chunk = jnp.asarray(pts[i : i + batch])
        sdf, _, _ = sweep_sdf(shape, traj, params, chunk)
        out[i : i + batch] = np.asarray(sdf)
    return out.reshape(X, Y, Z)


def _auto_bounds(traj, shape, resolution, margin=0.5):
    ts = np.linspace(0.0, float(traj.total_duration), 128)
    pos = np.asarray(jax.vmap(traj.pos)(jnp.asarray(ts)))
    r = max(shape.bounds) + margin
    lo = pos.min(axis=0) - r
    hi = pos.max(axis=0) + r
    size = np.ceil((hi - lo) / resolution).astype(int) + 1
    return lo, tuple(int(s) for s in size)


def swept_volume_mesh(shape, traj, params, resolution: float = 0.2,
                      iso: float = 0.0) -> Optional[np.ndarray]:
    """Triangle soup (T, 3, 3) of the swept-volume boundary
    (ref calculateSwept, sw_manager.hpp:225; eps ≈ conf.eps grid size)."""
    origin, size = _auto_bounds(traj, shape, resolution)
    field = sdf_volume(shape, traj, params, origin, size, resolution)

    from isdf_tpu import native

    tris = native.marching_tetrahedra(field, origin, resolution, iso)
    if tris is None:
        tris = _marching_tetrahedra_py(field, origin, resolution, iso)
    return tris


# --- pure-python fallback (same 6-tet decomposition as the C++ core) --------
_TETS = [
    (0, 5, 1, 6), (0, 1, 3, 6), (0, 3, 2, 6),
    (0, 2, 7, 6), (0, 7, 4, 6), (0, 4, 5, 6),
]


def _marching_tetrahedra_py(field, origin, res, iso=0.0):
    X, Y, Z = field.shape
    corners = np.array(
        [[c & 1, (c >> 1) & 1, (c >> 2) & 1] for c in range(8)]
    )
    tris = []

    def lerp(pa, pb, va, vb):
        t = np.clip((iso - va) / (vb - va), 0.0, 1.0)
        return pa + t * (pb - pa)

    for x in range(X - 1):
        for y in range(Y - 1):
            for z in range(Z - 1):
                vals = np.array(
                    [field[x + c[0], y + c[1], z + c[2]] for c in corners]
                )
                if vals.min() >= iso or vals.max() < iso:
                    continue
                pos = (np.array([x, y, z]) + corners) * res + np.asarray(origin)
                for tet in _TETS:
                    tv = vals[list(tet)]
                    tp = pos[list(tet)]
                    inside = [i for i in range(4) if tv[i] < iso]
                    outside = [i for i in range(4) if tv[i] >= iso]
                    if not inside or not outside:
                        continue
                    if len(inside) == 1:
                        i0 = inside[0]
                        tri = [lerp(tp[i0], tp[o], tv[i0], tv[o]) for o in outside]
                        tris.append(tri)
                    elif len(inside) == 3:
                        o0 = outside[0]
                        tri = [lerp(tp[o0], tp[i], tv[o0], tv[i]) for i in inside]
                        tris.append(tri)
                    else:
                        a = lerp(tp[inside[0]], tp[outside[0]], tv[inside[0]], tv[outside[0]])
                        b = lerp(tp[inside[0]], tp[outside[1]], tv[inside[0]], tv[outside[1]])
                        c = lerp(tp[inside[1]], tp[outside[1]], tv[inside[1]], tv[outside[1]])
                        d = lerp(tp[inside[1]], tp[outside[0]], tv[inside[1]], tv[outside[0]])
                        tris.append([a, b, c])
                        tris.append([a, c, d])
    return np.asarray(tris) if tris else np.zeros((0, 3, 3))
