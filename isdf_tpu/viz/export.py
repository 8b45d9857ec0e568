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
