"""Exports replacing the RViz marker factory (ref utils/Visualization.hpp):
OBJ meshes (swept volumes, robot bodies) and trajectory CSVs for external
viewers."""

from __future__ import annotations

import numpy as np


def export_obj(path: str, tris: np.ndarray):
    """Write a triangle soup (T, 3, 3) as an OBJ file."""
    with open(path, "w") as f:
        f.write("# isdf_tpu export\n")
        for tri in tris:
            for v in tri:
                f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for i in range(len(tris)):
            b = 3 * i
            f.write(f"f {b+1} {b+2} {b+3}\n")


def export_traj_csv(path: str, traj, n: int = 500):
    import jax
    import jax.numpy as jnp

    ts = np.linspace(0.0, float(traj.total_duration), n)
    pos = np.asarray(jax.vmap(traj.pos)(jnp.asarray(ts)))
    vel = np.asarray(jax.vmap(traj.vel)(jnp.asarray(ts)))
    with open(path, "w") as f:
        f.write("t,x,y,z,vx,vy,vz\n")
        for t, p, v in zip(ts, pos, vel):
            f.write(f"{t:.4f},{p[0]:.5f},{p[1]:.5f},{p[2]:.5f},"
                    f"{v[0]:.5f},{v[1]:.5f},{v[2]:.5f}\n")


def sdf_time_curve(shape, traj, params, point, n: int = 512):
    """SDF(t) samples of the body at a fixed world point over the whole
    trajectory — the sdf_vis topic payload (ref src/sdf_vis/scripts/main.py:
    plots /sdf_vis samples; ref sw_manager publishes per-point SDF(t)).
    Returns (ts (n,), sdf (n,)) as NumPy arrays."""
    import jax
    import jax.numpy as jnp

    from isdf_tpu.sweep.sweep_sdf import sdf_at_time

    ts = jnp.linspace(0.0, traj.total_duration, n)
    f = jax.vmap(lambda t: sdf_at_time(shape, traj, params, jnp.asarray(point), t))
    return np.asarray(ts), np.asarray(f(ts))


def export_sdf_curve_csv(path: str, shape, traj, params, point, n: int = 512):
    ts, sdf = sdf_time_curve(shape, traj, params, point, n)
    with open(path, "w") as f:
        f.write("t,sdf\n")
        for t, d in zip(ts, sdf):
            f.write(f"{t:.5f},{d:.6f}\n")
