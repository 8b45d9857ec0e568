"""Pose-indexed collision kernels and whole-map pose feasibility.

Re-design of the reference's kernel machinery:
  * Shape kernels (ref Shape.hpp:406-462 initShape<enablekernel>): for each
    (roll, pitch) on the grid [−max..max] step ang_res, a K³ boolean
    voxelization of {SDF(R_rpᵀ p) ≤ safemargin},
    R_rp = Rx(roll)·Ry(pitch), safemargin = max(front_end_safeh, res/2).
    Here: one vmapped SDF evaluation over (R·P·K³) points on device.
  * The per-expansion byte-kernel AND-convolution + BFS pose search
    (ref sw_manager.hpp:776-849 kernelConv, 852-913 visit_kernels_by_distance)
    is replaced by **precomputing the full feasibility volume**
    feasible[R, P, X, Y, Z] = (occupancy ⊛ kernel_rp)(x,y,z) == 0
    as one batched 3-D convolution on the MXU (SURVEY.md §7.1 item 6).
    A* then does O(1) lookups instead of per-node bit convolutions.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from isdf_tpu.core.so3 import rpy_to_rot


class PoseKernels(NamedTuple):
    kernels: jax.Array      # (R, P, K, K, K) bool — True = body occupies
    rolls: jax.Array        # (R,) radians
    pitches: jax.Array      # (P,) radians


def pose_grid(conf):
    """Degrees grids matching the reference's loop (Shape.hpp:423-427)."""
    rolls = np.arange(-conf.kernel_max_roll, conf.kernel_max_roll + 1e-9,
                      conf.kernel_ang_res)
    pitches = np.arange(-conf.kernel_max_pitch, conf.kernel_max_pitch + 1e-9,
                        conf.kernel_ang_res)
    return rolls, pitches


@partial(jax.jit, static_argnames=("shape", "kernel_size"))
def _voxelize(shape, rolls_rad, pitches_rad, kernel_size: int, res, safemargin):
    K = kernel_size
    side = 0.5 * (K - 1)
    ax = (jnp.arange(K) - side) * res
    g = jnp.stack(jnp.meshgrid(ax, ax, ax, indexing="ij"), axis=-1)  # (K,K,K,3)

    def one_pose(roll, pitch):
        R = rpy_to_rot(roll, 0.0, 0.0) @ rpy_to_rot(0.0, pitch, 0.0)
        # body occupies voxel iff SDF(Rᵀ p) ≤ safemargin (ref getonlySDF(p, R))
        p_local = jnp.einsum("ji,xyzj->xyzi", R, g)
        return shape.sdf(p_local) <= safemargin

    f = jax.vmap(jax.vmap(one_pose, in_axes=(None, 0)), in_axes=(0, None))
    return f(rolls_rad, pitches_rad)


def build_pose_kernels(shape, conf) -> PoseKernels:
    # a kernel smaller than the body silently truncates it, making the A*
    # feasibility volume optimistic (poses "fit" that physically cannot)
    half = 0.5 * (conf.kernel_size - 1) * conf.occupancy_resolution
    b = getattr(shape, "bounds", None)
    if b is not None and max(b) > half + 0.5 * conf.occupancy_resolution:
        import warnings

        warnings.warn(
            f"pose kernel half-size {half:.2f} m < shape bound {max(b):.2f} m"
            " — the collision kernel truncates the body; increase"
            " kernel_size or occupancy_resolution",
            stacklevel=2,
        )
    rolls_deg, pitches_deg = pose_grid(conf)
    rolls = jnp.asarray(np.radians(rolls_deg))
    pitches = jnp.asarray(np.radians(pitches_deg))
    safemargin = max(conf.front_end_safeh, conf.occupancy_resolution / 2)
    kern = _voxelize(
        shape, rolls, pitches, conf.kernel_size,
        conf.occupancy_resolution, safemargin,
    )
    return PoseKernels(kernels=kern, rolls=rolls, pitches=pitches)


@jax.jit
def pose_feasibility(occ, kernels):
    """feasible[R, P, X, Y, Z]: no overlap between the shape kernel at pose
    (r, p) centered on voxel (x, y, z) and the occupancy grid.

    One conv_general_dilated with RP output channels — this is the compute
    pattern the MXU eats (replaces the reference's per-expansion byte AND).
    Out-of-map voxels count as FREE, matching the reference's zero-padded
    map kernel (PCSmap_manager.h:46-78 pads the bit map with half_size).
    """
    R, P, K, _, _ = kernels.shape
    occf = occ.astype(jnp.float32)[None, None]                  # NCXYZ
    kf = kernels.astype(jnp.float32).reshape(R * P, 1, K, K, K)
    # cross-correlation with SAME padding: center of kernel on each voxel.
    out = jax.lax.conv_general_dilated(
        occf, kf, window_strides=(1, 1, 1), padding="SAME",
        dimension_numbers=("NCXYZ", "OIXYZ", "NCXYZ"),
    )[0]                                                        # (RP, X, Y, Z)
    feas = out < 0.5
    return feas.reshape(R, P, *occ.shape)


def nearest_feasible_pose(feas_rp: np.ndarray, father: tuple[int, int]):
    """Reproduce checkKernelValue's pose choice (sw_manager.hpp:915-942):
    zero pose first, else the BFS-nearest feasible pose from the father.

    feas_rp: (R, P) bool for one voxel.  Returns (i, j) or None.
    """
    Rn, Pn = feas_rp.shape
    zi, zj = (Rn - 1) // 2, (Pn - 1) // 2
    if feas_rp[zi, zj]:
        return zi, zj
    if not feas_rp.any():
        return None
    ii, jj = np.meshgrid(np.arange(Rn), np.arange(Pn), indexing="ij")
    d = np.abs(ii - father[0]) + np.abs(jj - father[1])
    d = np.where(feas_rp, d, 1 << 20)
    k = int(np.argmin(d))
    return k // Pn, k % Pn
