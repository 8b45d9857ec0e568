"""Grid-backed SDF shapes: mesh robots as baked voxel fields.

The on-device form of the reference's numeric self-SDF map
(ref Shape.hpp:481-600 getonlySDFNum/getonlyGrad1Num/getSDFwithGrad1Num:
trilinear interpolation of a precomputed (distance, gradient) grid).  Here
only the distance field is stored; the gradient is the exact autodiff of the
trilinear interpolant.  Outside the grid the field falls back to distance to
the grid's bounding box plus the boundary value — smooth, conservative, and
defined everywhere (the reference returns 1e20 outside, Shape.hpp:600).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from isdf_tpu.shapes.zoo import Shape
from isdf_tpu.shapes import mesh as meshlib


def _interp3(field, origin, res, px, py, pz):
    """Component-form trilinear interpolation + outside fallback.

    Pins constants to the query dtype: under jax_enable_x64 the stored
    field/origin would otherwise promote a float32 query chain to float64
    and break fixed-dtype solver carries (lax.while_loop in opt/lbfgs.py).
    """
    dt = px.dtype
    field = field.astype(dt)
    o = [jnp.asarray(origin[i], dt) for i in range(3)]
    res = jnp.asarray(res, dt)
    n = field.shape

    def axis(p, i):
        g = (p - o[i]) / res
        gc = jnp.clip(g, 0.0, (n[i] - 1) - 1e-5)
        i0 = jnp.clip(jnp.floor(gc).astype(jnp.int32), 0, n[i] - 2)
        return g, i0, gc - i0.astype(dt)

    gx, ix, fx = axis(px, 0)
    gy, iy, fy = axis(py, 1)
    gz, iz, fz = axis(pz, 2)

    # flat single-index gathers: one fused index computation + 8 1-D takes
    # lowers ~1.4× faster on TPU than 3-D advanced indexing (measured,
    # BASELINE.md "grid-shape sweep")
    flat = field.reshape(-1)
    base = (ix * n[1] + iy) * n[2] + iz

    def gat(off):
        return jnp.take(flat, base + off)

    o_x, o_y = n[1] * n[2], n[2]
    c00 = gat(0) * (1 - fx) + gat(o_x) * fx
    c10 = gat(o_y) * (1 - fx) + gat(o_x + o_y) * fx
    c01 = gat(1) * (1 - fx) + gat(o_x + 1) * fx
    c11 = gat(o_y + 1) * (1 - fx) + gat(o_x + o_y + 1) * fx
    c0 = c00 * (1 - fy) + c10 * fy
    c1 = c01 * (1 - fy) + c11 * fy
    inner = c0 * (1 - fz) + c1 * fz

    # outside fallback: clamp-point value + distance to the grid box
    def over(g, i):
        return jnp.maximum(g - (n[i] - 1), 0.0) + jnp.minimum(g, 0.0)

    ov2 = over(gx, 0) ** 2 + over(gy, 1) ** 2 + over(gz, 2) ** 2
    outside = jnp.sqrt(ov2 * (res * res) + 1e-12)
    return inner + outside


def _interp(field, origin, res, p):
    return _interp3(field, origin, res, p[..., 0], p[..., 1], p[..., 2])


def grid_shape(name: str, field, origin, resolution, bounds=None) -> Shape:
    from isdf_tpu.sweep.pallas_grid import pad_grid

    field_np = np.asarray(field)
    origin_np = np.asarray(origin)
    field = jnp.asarray(field)
    origin = jnp.asarray(origin)
    res = jnp.asarray(resolution)
    if bounds is None:
        ext = np.asarray(field.shape) * float(resolution) / 2
        bounds = tuple(float(e) for e in ext)

    def sdf(p):
        return _interp(field, origin, res, p)

    def sdf3(px, py, pz):
        return _interp3(field, origin, res, px, py, pz)

    pg = pad_grid(field_np, origin_np, float(resolution))
    return Shape(name=name, sdf=sdf, bounds=bounds, grid=pg, sdf3=sdf3)


def mesh_shape(
    name: str,
    obj_path: str,
    poly_params=(0.0,) * 6,
    resolution: float = 0.1,
    margin: float = 0.6,
) -> Shape:
    """Load an OBJ robot body, apply its yaml pose, bake the SDF grid, and
    wrap it as a Shape (the ``Generalshape`` replacement — ref Shape.cpp:27).
    """
    V, F = meshlib.load_obj(obj_path)
    V = meshlib.transform_mesh(V, poly_params)
    field, origin, res = meshlib.bake_sdf_grid(V, F, resolution, margin)
    ext = np.abs(V).max(axis=0)
    return grid_shape(name, field, origin, res, bounds=tuple(ext))


def shape_from_config(conf) -> Shape:
    """Shape factory honoring use_objfile_as_body (ref sw_manager initShape:
    named analytic shape if registered, else mesh Generalshape)."""
    from isdf_tpu.shapes.zoo import SHAPE_REGISTRY, make_shape

    name = conf.inputdata.rsplit("/", 1)[-1].removesuffix(".obj") if conf.inputdata else ""
    if name in SHAPE_REGISTRY:
        return make_shape(name, conf)
    if conf.inputdata:
        return mesh_shape(name or "mesh", conf.inputdata, conf.poly_params,
                          conf.selfmapresu)
    return make_shape("Ball", conf)
