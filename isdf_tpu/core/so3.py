"""Small SO(3)/quaternion helpers (JAX, batched)."""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_rot(q):
    """Quaternion (w, x, y, z) → rotation matrix, shape (..., 3, 3)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    ww, xx, yy, zz = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    r = jnp.stack(
        [
            ww + xx - yy - zz, 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), ww - xx + yy - zz, 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), ww - xx - yy + zz,
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def hat(w):
    """Vector (..., 3) → skew matrix (..., 3, 3)."""
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            zeros, -w[..., 2], w[..., 1],
            w[..., 2], zeros, -w[..., 0],
            -w[..., 1], w[..., 0], zeros,
        ],
        axis=-1,
    ).reshape(w.shape[:-1] + (3, 3))


def rpy_to_rot(roll, pitch, yaw):
    """ZYX euler (applied as Rz(yaw)·Ry(pitch)·Rx(roll)) → rotation matrix."""
    roll, pitch, yaw = (jnp.asarray(a) for a in (roll, pitch, yaw))
    cr, sr = jnp.cos(roll), jnp.sin(roll)
    cp, sp = jnp.cos(pitch), jnp.sin(pitch)
    cy, sy = jnp.cos(yaw), jnp.sin(yaw)
    r = jnp.stack(
        [
            cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr,
            sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr,
            -sp, cp * sr, cp * cr,
        ],
        axis=-1,
    )
    return r.reshape(jnp.shape(roll) + (3, 3))
