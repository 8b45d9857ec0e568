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


def rot_to_quat(R):
    """Rotation matrix (..., 3, 3) → quaternion (w, x, y, z), w ≥ 0.

    Full 4-branch Shepperd selection (largest of {1+tr, 1+2·m_kk−tr}): safe
    for all rotations including 180° (trace ≈ −1), where the trace-only
    branch degenerates.  Not used in any gradient path."""
    m00, m11, m22 = R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    r01, r02, r12 = R[..., 0, 1], R[..., 0, 2], R[..., 1, 2]
    r10, r20, r21 = R[..., 1, 0], R[..., 2, 0], R[..., 2, 1]

    # candidate k has 4·q_k² = t_k; the other components follow from the
    # (anti)symmetric parts divided by 2·sqrt(t_k).
    tw = 1.0 + tr
    tx = 1.0 + m00 - m11 - m22
    ty = 1.0 - m00 + m11 - m22
    tz = 1.0 - m00 - m11 + m22
    qs = jnp.stack(
        [
            jnp.stack([tw, r21 - r12, r02 - r20, r10 - r01], axis=-1),
            jnp.stack([r21 - r12, tx, r01 + r10, r02 + r20], axis=-1),
            jnp.stack([r02 - r20, r01 + r10, ty, r12 + r21], axis=-1),
            jnp.stack([r10 - r01, r02 + r20, r12 + r21, tz], axis=-1),
        ],
        axis=-2,
    )  # (..., 4 branches, 4 components)
    ts = jnp.stack([tw, tx, ty, tz], axis=-1)
    k = jnp.argmax(ts, axis=-1)
    q = jnp.take_along_axis(qs, k[..., None, None].repeat(4, -1), axis=-2)[
        ..., 0, :
    ]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q * jnp.where(q[..., 0:1] < 0, -1.0, 1.0)


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


def exp_rotvec(v):
    """Rotation vector (..., 3) → rotation matrix (Rodrigues), batched,
    autodiff-safe at ‖v‖ → 0 (series-expanded coefficients)."""
    th2 = jnp.sum(v * v, axis=-1)
    th = jnp.sqrt(th2 + 1e-30)
    small = th < 1e-4
    a = jnp.where(small, 1.0 - th2 / 6.0, jnp.sin(th) / th)        # sinθ/θ
    b = jnp.where(small, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / th2)
    K = hat(v)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=v.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * (K @ K)


def log_rot(R):
    """Rotation matrix → rotation vector (..., 3), batched; valid away from
    the π-rotation branch cut (our attitude references are ≤ ~64°)."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_th = jnp.clip(0.5 * (tr - 1.0), -1.0 + 1e-7, 1.0 - 1e-7)
    th = jnp.arccos(cos_th)
    w = 0.5 * jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )  # = axis·sinθ
    scale = jnp.where(th < 1e-4, 1.0 + th * th / 6.0, th / jnp.sin(th))
    return w * scale[..., None]


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
