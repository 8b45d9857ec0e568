"""Mesh → SDF pipeline (replaces libigl in the reference's ``Generalshape``).

The reference computes mesh SDFs per query with libigl: sign from the fast
winding number BVH, magnitude from an AABB-tree point-triangle distance
(ref src/utils/src/Shape.cpp:103-151), and *additionally* bakes a dense
self-SDF grid it then samples with trilinear interpolation
(ref Shape.hpp:361-404 initShape, 481-600 getonlySDFNum/getSDFwithGrad1Num).

The TPU build keeps only the baked-grid form (the reference's own hot path
for mesh shapes) and computes the bake itself: exact generalized winding
number (van Oosterom–Strackee solid angles, the same quantity libigl's FWN
approximates) + exact point-triangle distances, both as batched JAX ops —
one (grid-points × faces) sweep on device instead of BVH traversals.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def load_obj(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Minimal OBJ parser: vertices + triangulated faces (fan).

    (ref igl::read_triangle_mesh usage, Shape.cpp:36)"""
    verts, faces = [], []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
            elif line.startswith("f "):
                idx = [int(tok.split("/")[0]) - 1 for tok in line.split()[1:]]
                for k in range(1, len(idx) - 1):
                    faces.append([idx[0], idx[k], idx[k + 1]])
    return np.asarray(verts, dtype=np.float64), np.asarray(faces, dtype=np.int32)


def transform_mesh(V: np.ndarray, poly_params) -> np.ndarray:
    """Apply the yaml pose (trans + euler degrees) to vertices
    (ref Shape.cpp:38-52: V ← R·V + t with R = Rz·Ry·Rx)."""
    from isdf_tpu.shapes.zoo import _pose_from_poly_params

    t, R = _pose_from_poly_params(poly_params)
    return V @ R.T + t


# --- exact point-triangle distance (vectorized Ericson) ---------------------
def _point_tri_dist_sq(p, a, b, c):
    """Squared distances: p (..., 3) vs one triangle per row (..., 3)."""
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    denom_vc = jnp.maximum(d1 - d3, 1e-30)
    v_ab = jnp.clip(d1 / jnp.where(jnp.abs(d1 - d3) > 1e-30, d1 - d3, 1e-30), 0.0, 1.0)
    v_ac = jnp.clip(d2 / jnp.where(jnp.abs(d2 - d6) > 1e-30, d2 - d6, 1e-30), 0.0, 1.0)
    w_bc = jnp.clip(
        (d4 - d3) / jnp.where(jnp.abs((d4 - d3) + (d5 - d6)) > 1e-30,
                              (d4 - d3) + (d5 - d6), 1e-30),
        0.0, 1.0,
    )

    denom = jnp.where(jnp.abs(va + vb + vc) > 1e-30, va + vb + vc, 1e-30)
    v = vb / denom
    w = vc / denom

    # candidate closest points per region
    p_a = a
    p_b = b
    p_c = c
    p_ab = a + v_ab[..., None] * ab
    p_ac = a + v_ac[..., None] * ac
    p_bc = b + w_bc[..., None] * (c - b)
    p_in = a + v[..., None] * ab + w[..., None] * ac

    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    in_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    in_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    in_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)

    closest = p_in
    closest = jnp.where(in_bc[..., None], p_bc, closest)
    closest = jnp.where(in_ac[..., None], p_ac, closest)
    closest = jnp.where(in_ab[..., None], p_ab, closest)
    closest = jnp.where(in_c[..., None], p_c, closest)
    closest = jnp.where(in_b[..., None], p_b, closest)
    closest = jnp.where(in_a[..., None], p_a, closest)
    d = p - closest
    return jnp.sum(d * d, -1)


def _winding_number(p, a, b, c):
    """Generalized winding number at p over triangles (A, 3) — sum of signed
    solid angles / 4π (van Oosterom–Strackee)."""
    ra = a[None] - p[:, None]
    rb = b[None] - p[:, None]
    rc = c[None] - p[:, None]
    la = jnp.linalg.norm(ra, axis=-1)
    lb = jnp.linalg.norm(rb, axis=-1)
    lc = jnp.linalg.norm(rc, axis=-1)
    num = jnp.sum(ra * jnp.cross(rb, rc), axis=-1)
    den = (
        la * lb * lc
        + jnp.sum(ra * rb, -1) * lc
        + jnp.sum(rb * rc, -1) * la
        + jnp.sum(rc * ra, -1) * lb
    )
    omega = 2.0 * jnp.arctan2(num, den)
    return jnp.sum(omega, axis=-1) / (4.0 * jnp.pi)


@jax.jit
def _sdf_chunk(p, va, vb, vc):
    d2 = _point_tri_dist_sq(p[:, None, :], va[None], vb[None], vc[None])
    dist = jnp.sqrt(jnp.min(d2, axis=1) + 1e-30)
    wn = _winding_number(p, va, vb, vc)
    sign = jnp.where(wn > 0.5, -1.0, 1.0)
    return sign * dist


def mesh_sdf(points: np.ndarray, V: np.ndarray, F: np.ndarray,
             chunk: int = 4096) -> np.ndarray:
    """Signed distance of arbitrary points to a triangle mesh (host driver,
    device compute; sign by winding number — robust to imperfect meshes,
    same principle as libigl FWN)."""
    va = jnp.asarray(V[F[:, 0]])
    vb = jnp.asarray(V[F[:, 1]])
    vc = jnp.asarray(V[F[:, 2]])
    out = []
    for i in range(0, len(points), chunk):
        p = jnp.asarray(points[i : i + chunk])
        out.append(np.asarray(_sdf_chunk(p, va, vb, vc)))
    return np.concatenate(out)


def bake_sdf_grid(V: np.ndarray, F: np.ndarray, resolution: float = 0.1,
                  margin: float = 0.5):
    """Dense SDF grid over the mesh bounds + margin
    (ref initShape's num_sdf_map bake, Shape.hpp:361-404).

    Returns (grid (X,Y,Z) float32, origin (3,), resolution)."""
    lo = V.min(axis=0) - margin
    hi = V.max(axis=0) + margin
    size = np.ceil((hi - lo) / resolution).astype(int) + 1
    xs = lo[0] + np.arange(size[0]) * resolution
    ys = lo[1] + np.arange(size[1]) * resolution
    zs = lo[2] + np.arange(size[2]) * resolution
    g = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), axis=-1).reshape(-1, 3)
    sdf = mesh_sdf(g, V, F)
    return sdf.reshape(tuple(size)).astype(np.float32), lo, resolution


def face_normals(V: np.ndarray, F: np.ndarray) -> np.ndarray:
    """Outward unit face normals (ref igl::per_face_normals usage,
    Shape.cpp:20 + hPoly assembly Shape.cpp:66-78)."""
    a, b, c = V[F[:, 0]], V[F[:, 1]], V[F[:, 2]]
    n = np.cross(b - a, c - b)
    ln = np.linalg.norm(n, axis=1, keepdims=True)
    return n / np.maximum(ln, 1e-30)


def h_poly(V: np.ndarray, F: np.ndarray) -> np.ndarray:
    """Half-space representation (F, 4): rows (nx, ny, nz, d) with
    n·p + d = 0 on the face plane (ref Generalshape hPoly, Shape.cpp:66-78).
    """
    n = face_normals(V, F)
    p0 = V[F[:, 1]]
    d = -np.sum(n * p0, axis=1)
    return np.concatenate([n, d[:, None]], axis=1)
