"""Pallas coarse-scan kernel vs the XLA twin (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from isdf_tpu.core import minco
from isdf_tpu.core.flatness import FlatParams
from isdf_tpu.core.poly import PolyTraj
from isdf_tpu.shapes import make_shape
from isdf_tpu.sweep.pallas_scan import coarse_scan
from isdf_tpu.sweep.sweep_sdf import traj_states


def test_pallas_matches_xla():
    rng = np.random.default_rng(0)
    N = 4
    q = jnp.asarray(rng.normal(size=(N - 1, 3)) * 2 + 3, jnp.float32)
    T = jnp.asarray(rng.uniform(1.0, 2.0, size=N), jnp.float32)
    head = jnp.zeros((3, 3), jnp.float32)
    tail = jnp.zeros((3, 3), jnp.float32).at[:, 0].set(
        jnp.asarray([6.0, 2.0, 1.0], jnp.float32)
    )
    traj = PolyTraj(T, minco.solve(q, T, head, tail))
    shape = make_shape("CappedCone")
    params = FlatParams()
    ts = jnp.linspace(0.0, traj.total_duration, 64).astype(jnp.float32)
    xs, Rs = traj_states(traj, params, ts)
    pts = jnp.asarray(rng.uniform(-1, 7, size=(512, 3)), jnp.float32)

    d_ref, j_ref = coarse_scan(shape, pts, xs, Rs, use_pallas=False)
    d_pl, j_pl = coarse_scan(shape, pts, xs, Rs, use_pallas=True,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_ref), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(j_pl), np.asarray(j_ref))
