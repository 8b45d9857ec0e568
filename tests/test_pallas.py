"""Pallas coarse-scan kernel vs the XLA twin (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isdf_tpu.core import minco
from isdf_tpu.core.flatness import FlatParams
from isdf_tpu.core.poly import PolyTraj
from isdf_tpu.shapes import make_shape
from isdf_tpu.sweep.pallas_scan import coarse_scan
from isdf_tpu.sweep.sweep_sdf import traj_states

pytestmark = pytest.mark.slow


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


class TestGridKernel:
    """The gather-free grid-SDF coarse scan (sweep/pallas_grid.py) vs the
    XLA trilinear-gather path, on a baked analytic field (no mesh assets
    needed — the grid IS the spec, ref Shape.hpp:481-600)."""

    def _grid_shape(self, rng):
        from isdf_tpu.shapes.gridsdf import grid_shape

        # bake a torus-ish analytic SDF into a 21×19×13 grid (odd, unpadded
        # dims exercise the kernel's padding/clamping)
        nx, ny, nz = 21, 19, 13
        res = 0.11
        origin = np.array([-1.1, -1.0, -0.7])
        ii = np.stack(np.meshgrid(
            np.arange(nx), np.arange(ny), np.arange(nz), indexing="ij"
        ), axis=-1)
        p = origin + ii * res
        xy = np.sqrt(p[..., 0] ** 2 + p[..., 1] ** 2) - 0.6
        field = np.sqrt(xy ** 2 + p[..., 2] ** 2) - 0.25
        return grid_shape("baked_torus", field, origin, res)

    def test_grid_kernel_matches_gather(self):
        from isdf_tpu.sweep.pallas_grid import grid_coarse_scan
        from isdf_tpu.sweep.sweep_sdf import _batched_sdf_table

        rng = np.random.default_rng(1)
        shape = self._grid_shape(rng)
        T = 48
        ts = np.linspace(0, 3.0, T)
        xs = jnp.asarray(np.stack(
            [ts * 1.2, np.sin(ts), 0.3 * ts], axis=-1), jnp.float32)
        th = ts * 0.7
        Rs = np.zeros((T, 3, 3))
        Rs[:, 0, 0] = np.cos(th); Rs[:, 0, 1] = -np.sin(th)
        Rs[:, 1, 0] = np.sin(th); Rs[:, 1, 1] = np.cos(th)
        Rs[:, 2, 2] = 1.0
        Rs = jnp.asarray(Rs, jnp.float32)
        # points spanning inside, near-boundary, and far outside the grid
        pts = jnp.asarray(rng.uniform(-2, 6, size=(300, 3)), jnp.float32)

        table = _batched_sdf_table(
            shape, pts.astype(jnp.float64), xs.astype(jnp.float64),
            Rs.astype(jnp.float64))
        d_ref = np.asarray(jnp.min(table, axis=1))
        j_ref = np.asarray(jnp.argmin(table, axis=1))

        d_pl, j_pl = grid_coarse_scan(shape.grid, pts, xs, Rs,
                                      interpret=True)
        np.testing.assert_allclose(np.asarray(d_pl), d_ref, atol=2e-4)
        # argmin may differ on near-ties; values at chosen indices must tie
        d_at_jpl = np.asarray(table)[np.arange(len(j_ref)), np.asarray(j_pl)]
        np.testing.assert_allclose(d_at_jpl, d_ref, atol=2e-4)

    def test_sweep_sdf_grid_pallas_dispatch(self):
        """sweep_sdf with use_pallas=True on a grid shape (interpret via CPU
        env) must match the XLA path end-to-end (t*, sdf*)."""
        import jax as _jax

        from isdf_tpu.core import minco
        from isdf_tpu.core.flatness import FlatParams
        from isdf_tpu.core.poly import PolyTraj
        from isdf_tpu.sweep.sweep_sdf import sweep_sdf

        rng = np.random.default_rng(2)
        shape = self._grid_shape(rng)
        N = 3
        q = jnp.asarray(rng.normal(size=(N - 1, 3)) + 2.0)
        T = jnp.asarray(rng.uniform(1.0, 2.0, size=N))
        head = jnp.zeros((3, 3))
        tail = jnp.zeros((3, 3)).at[:, 0].set(jnp.asarray([4.0, 1.0, 0.5]))
        traj = PolyTraj(T, minco.solve(q, T, head, tail))
        params = FlatParams()
        pts = jnp.asarray(rng.uniform(-1, 5, size=(64, 3)))

        d_x, t_x, g_x = sweep_sdf(shape, traj, params, pts, coarse_n=48,
                                  refine_rounds=10, use_pallas=False)
        import isdf_tpu.sweep.pallas_grid as pg_mod
        orig = pg_mod._grid_coarse_scan_padded
        pg_mod._grid_coarse_scan_padded = lambda *a, **k: orig(
            *a, **{**k, "interpret": True})
        try:
            d_p, t_p, g_p = sweep_sdf(shape, traj, params, pts, coarse_n=48,
                                      refine_rounds=10, use_pallas=True)
        finally:
            pg_mod._grid_coarse_scan_padded = orig
        # minima values must agree; t* may legitimately land on a different
        # member of an equal-value set, so compare through the objective
        np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x),
                                   atol=5e-4)
        from isdf_tpu.sweep.sweep_sdf import sdf_at_time

        d_at_tp = np.asarray(sdf_at_time(shape, traj, params,
                                         pts, t_p))
        np.testing.assert_allclose(d_at_tp, np.asarray(d_x), atol=5e-4)


class TestFusedSweepKernel:
    """pallas_zoom.sweep_warm_fused (interpret mode) vs the XLA sweep path.

    The fused kernel is the TPU production path for analytic shapes
    (sweep_sdf._fused_ok); these tests pin its numerics on CPU."""

    def _setup(self, N=4, seed=0):
        from isdf_tpu.core import minco

        rng = np.random.default_rng(seed)
        dtype = jnp.float32
        q = jnp.asarray(
            np.linspace(1, 7, N - 1)[:, None] * np.array([1.0, 0.3, 0.15])
            + rng.normal(scale=0.3, size=(N - 1, 3)), dtype)
        T = jnp.asarray(rng.uniform(1.2, 2.2, size=N), dtype)
        head = jnp.zeros((3, 3), dtype)
        tail = jnp.zeros((3, 3), dtype).at[:, 0].set(
            jnp.asarray([8.0, 2.0, 1.0], dtype))
        traj = PolyTraj(T, minco.solve(q, T, head, tail))
        return traj, rng

    @pytest.mark.parametrize("shapename", ["CappedCone", "Ball", "CSG"])
    def test_parity_vs_xla_sweep(self, shapename):
        from isdf_tpu.config import Config
        from isdf_tpu.core import flatness as fl
        from isdf_tpu.shapes import make_shape
        from isdf_tpu.sweep.sweep_sdf import sweep_sdf_warm, traj_states
        from isdf_tpu.sweep.pallas_zoom import sweep_warm_fused

        conf = Config(vmax=5.0, omgmax=5.0, thetamax=1.5, safety_hor=0.4)
        shape = make_shape(shapename, conf)
        params = fl.FlatParams.from_config(conf)
        traj, rng = self._setup()
        P = 128
        pts = jnp.asarray(rng.uniform(-1, 9, size=(P, 3)), jnp.float32)
        tw = jnp.asarray(
            rng.uniform(0, float(traj.total_duration), size=(P,)),
            jnp.float32)
        s_ref, t_ref, g_ref = sweep_sdf_warm(
            shape, traj, params, pts, tw, coarse_n=32, refine_rounds=8)
        ts = jnp.linspace(0.0, traj.total_duration, 32)
        xs, Rs = traj_states(traj, params, ts)
        pose = jnp.concatenate([xs, Rs.reshape(-1, 9)], axis=1)
        durs = traj.durations
        starts = jnp.cumsum(durs) - durs
        t_pl, d_pl, g_pl = sweep_warm_fused(
            shape, params, pts, tw, pose, starts, durs, traj.coeffs,
            coarse_n=32, rounds=8, interpret=True)
        # t* may differ at exact plateau ties; SDF values must agree tightly
        np.testing.assert_allclose(
            np.asarray(d_pl), np.asarray(s_ref), atol=2e-4, rtol=1e-4)
        # gradients at the argmin pose
        ok = np.abs(np.asarray(t_pl) - np.asarray(t_ref)) < 1e-4
        np.testing.assert_allclose(
            np.asarray(g_pl)[ok], np.asarray(g_ref)[ok], atol=1e-3)

    def test_vmap_matches_per_scenario(self):
        from isdf_tpu.config import Config
        from isdf_tpu.core import flatness as fl, minco
        from isdf_tpu.shapes import make_shape
        from isdf_tpu.sweep.sweep_sdf import traj_states
        from isdf_tpu.sweep.pallas_zoom import sweep_warm_fused

        conf = Config(vmax=5.0, omgmax=5.0, thetamax=1.5, safety_hor=0.4)
        shape = make_shape("CappedCone", conf)
        params = fl.FlatParams.from_config(conf)
        rng = np.random.default_rng(3)
        B, N, P = 3, 3, 128
        coeffs, Ts = [], []
        for _ in range(B):
            q = jnp.asarray(rng.normal(size=(N - 1, 3)) + 2.0, jnp.float32)
            T = jnp.asarray(rng.uniform(1.2, 2.0, size=N), jnp.float32)
            coeffs.append(minco.solve(q, T, jnp.zeros((3, 3), jnp.float32),
                                      jnp.zeros((3, 3), jnp.float32)))
            Ts.append(T)
        coeffs = jnp.stack(coeffs)
        T = jnp.stack(Ts)
        pts = jnp.asarray(rng.uniform(-1, 5, size=(B, P, 3)), jnp.float32)
        tw = jnp.zeros((B, P), jnp.float32)

        def one(Tb, cb, pb, twb):
            traj = PolyTraj(Tb, cb)
            ts = jnp.linspace(0.0, traj.total_duration, 16)
            xs, Rs = traj_states(traj, params, ts)
            pose = jnp.concatenate([xs, Rs.reshape(-1, 9)], axis=1)
            durs = traj.durations
            starts = jnp.cumsum(durs) - durs
            return sweep_warm_fused(
                shape, params, pb, twb, pose, starts, durs, traj.coeffs,
                coarse_n=16, rounds=6, interpret=True)

        tb, db, gb = jax.vmap(one)(T, coeffs, pts, tw)
        for b in range(B):
            t1, d1, g1 = one(T[b], coeffs[b], pts[b], tw[b])
            np.testing.assert_allclose(np.asarray(tb[b]), np.asarray(t1),
                                       atol=1e-6)
            np.testing.assert_allclose(np.asarray(db[b]), np.asarray(d1),
                                       atol=1e-6)


class TestGridZoomKernel:
    """pallas_grid_zoom (two-hot slab zoom, TPU production path for mesh
    shapes) vs the XLA gather zoom, interpret mode."""

    def test_parity_vs_xla_zoom(self):
        from isdf_tpu.config import Config
        from isdf_tpu.core import flatness as fl
        from isdf_tpu.shapes.gridsdf import grid_shape
        from isdf_tpu.sweep.sweep_sdf import _zoom
        from isdf_tpu.sweep.pallas_grid_zoom import (
            grid_zoom_refine, grid_zoom_inputs)

        conf = Config(vmax=5.0, omgmax=5.0, thetamax=1.5, safety_hor=0.4)
        params = fl.FlatParams.from_config(conf)
        n, res = 24, 0.1
        origin = np.full(3, -1.2)
        ii = np.stack(np.meshgrid(*[np.arange(n)] * 3, indexing="ij"),
                      axis=-1)
        p = origin + ii * res
        xy = np.sqrt(p[..., 0] ** 2 + p[..., 1] ** 2) - 0.6
        field = np.sqrt(xy ** 2 + p[..., 2] ** 2) - 0.25
        shape = grid_shape("t24", field, origin, res)

        rng = np.random.default_rng(0)
        N = 4
        q = jnp.asarray(
            np.linspace(1, 7, N - 1)[:, None] * np.array([1.0, 0.3, 0.15])
            + rng.normal(scale=0.3, size=(N - 1, 3)), jnp.float32)
        T = jnp.asarray(rng.uniform(1.2, 2.2, size=N), jnp.float32)
        head = jnp.zeros((3, 3), jnp.float32)
        tail = jnp.zeros((3, 3), jnp.float32).at[:, 0].set(
            jnp.asarray([8.0, 2.0, 1.0], jnp.float32))
        traj = PolyTraj(T, minco.solve(q, T, head, tail))
        P = 200
        pts = jnp.asarray(rng.uniform(-1, 9, size=(P, 3)), jnp.float32)
        t0 = jnp.asarray(
            rng.uniform(0, float(traj.total_duration), size=(P,)),
            jnp.float32)
        w0 = jnp.full((P,), 0.3, jnp.float32)

        t_ref, d_ref = _zoom(shape, traj, params, pts, t0, w0, 8)
        durs = traj.durations
        starts = jnp.cumsum(durs) - durs
        dims, fieldT, geo = grid_zoom_inputs(shape.grid)
        t_pl, d_pl = grid_zoom_refine(
            dims, params, fieldT, geo, pts, t0, w0, starts, durs,
            traj.coeffs, rounds=8, interpret=True)
        np.testing.assert_allclose(np.asarray(t_pl), np.asarray(t_ref),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_ref),
                                   atol=2e-3)
