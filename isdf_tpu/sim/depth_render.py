"""Depth-camera rendering from the occupancy map — the ``local_sensing``
equivalent (ref src/uav_simulator/local_sensing/src/depth_render.cu:1-196 +
pointcloud raycast sensor).

The reference renders depth on a GPU by rasterizing the global point cloud
into the camera frustum per pixel (CUDA kernel over pixels).  TPU-first
re-design: **sphere tracing over the map ESDF** — every pixel marches its ray
by the signed distance at the current sample, a fixed number of rounds, all
pixels advanced in lockstep as one (H·W,)-batched elementwise program (VPU).
The ESDF already exists for planning (world/gridmap.py), so rendering costs
no extra precomputation; fixed iteration counts keep the program shape
static under jit.

Also provides the raycast point-cloud sensor (depth → camera-frame points →
world-frame point cloud), matching the reference's pcl_render_node output.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class CameraIntrinsics(NamedTuple):
    """Pinhole model (ref local_sensing depth_render fx/fy/cx/cy params)."""

    width: int
    height: int
    fx: float
    fy: float
    cx: float
    cy: float

    @classmethod
    def from_fov(cls, width: int, height: int, fov_x_deg: float = 90.0):
        fx = width / (2.0 * jnp.tan(jnp.deg2rad(fov_x_deg) / 2.0))
        return cls(width, height, float(fx), float(fx),
                   width / 2.0, height / 2.0)


def _ray_dirs(cam: CameraIntrinsics, dtype):
    """Unit ray directions in the camera frame (z forward, x right, y down),
    shape (H·W, 3)."""
    u = jnp.arange(cam.width, dtype=dtype)
    v = jnp.arange(cam.height, dtype=dtype)
    uu, vv = jnp.meshgrid(u, v)                      # (H, W)
    x = (uu - cam.cx) / cam.fx
    y = (vv - cam.cy) / cam.fy
    d = jnp.stack([x, y, jnp.ones_like(x)], axis=-1).reshape(-1, 3)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


@partial(jax.jit, static_argnames=("cam", "max_steps"))
def render_depth(
    gridmap,
    cam: CameraIntrinsics,
    position,
    rotation,
    max_depth: float = 20.0,
    max_steps: int = 96,
    hit_eps: float = 1e-2,
):
    """Depth image (H, W) by sphere tracing the map ESDF.

    position (3,) world; rotation (3, 3) camera-to-world.  Pixels that never
    hit return max_depth.  Requires ``gridmap.esdf`` (``with_esdf()``).
    """
    assert gridmap.esdf is not None, "call gridmap.with_esdf() first"
    dtype = gridmap.esdf.dtype
    pos = jnp.asarray(position, dtype)
    R = jnp.asarray(rotation, dtype)
    dirs = _ray_dirs(cam, dtype) @ R.T               # (P, 3) world

    def step(t, _):
        p = pos[None, :] + t[:, None] * dirs
        d = gridmap.sdf_value(p)                     # (P,)
        # stop advancing once hit (d small) or past the horizon
        adv = jnp.where(d > hit_eps, d, 0.0)
        t_new = jnp.minimum(t + adv, max_depth)
        return t_new, None

    t0 = jnp.zeros(dirs.shape[0], dtype)
    t, _ = jax.lax.scan(step, t0, None, length=max_steps)
    p = pos[None, :] + t[:, None] * dirs
    # a hit must land INSIDE the grid: outside, the trilinear ESDF clamps to
    # boundary values, which would report phantom surfaces at the map edge
    lo = gridmap.origin
    hi = gridmap.origin + jnp.asarray(gridmap.occ.shape, dtype) * gridmap.resolution
    inside = jnp.all((p >= lo) & (p <= hi), axis=-1)
    hit = (gridmap.sdf_value(p) <= 2.0 * hit_eps) & inside
    depth = jnp.where(hit, t, max_depth)
    return depth.reshape(cam.height, cam.width)


@partial(jax.jit, static_argnames=("cam", "max_steps"))
def render_pointcloud(
    gridmap,
    cam: CameraIntrinsics,
    position,
    rotation,
    max_depth: float = 20.0,
    max_steps: int = 96,
):
    """Raycast point-cloud sensor: world-frame hit points + validity mask
    ((H·W, 3), (H·W,) bool) — the pcl_render_node output equivalent."""
    depth = render_depth(
        gridmap, cam, position, rotation, max_depth, max_steps
    ).reshape(-1)
    dtype = depth.dtype
    pos = jnp.asarray(position, dtype)
    R = jnp.asarray(rotation, dtype)
    dirs = _ray_dirs(cam, dtype) @ R.T
    pts = pos[None, :] + depth[:, None] * dirs
    return pts, depth < max_depth
