"""Pallas sweep kernels vs their XLA twins (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isdf_tpu.core import minco
from isdf_tpu.core.flatness import FlatParams
from isdf_tpu.core.poly import PolyTraj
from isdf_tpu.shapes import make_shape
from isdf_tpu.sweep.sweep_sdf import traj_states

pytestmark = pytest.mark.slow


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


class TestFusedGridSweep:
    """grid_sweep_warm_fused (coarse + 2 zooms + f32-weight epilogue in ONE
    launch — the round-4 grid production path) vs the XLA warm sweep."""

    def _setup(self):
        from isdf_tpu.config import Config
        from isdf_tpu.core import flatness as fl
        from isdf_tpu.shapes.gridsdf import grid_shape

        conf = Config(vmax=5.0, omgmax=5.0, thetamax=1.5, safety_hor=0.4)
        params = fl.FlatParams.from_config(conf)
        n, res = 24, 0.1
        origin = np.full(3, -1.2)
        ii = np.stack(np.meshgrid(*[np.arange(n)] * 3, indexing="ij"),
                      axis=-1)
        p = origin + ii * res
        xy = np.sqrt(p[..., 0] ** 2 + p[..., 1] ** 2) - 0.6
        field = np.sqrt(xy ** 2 + p[..., 2] ** 2) - 0.25
        shape = grid_shape("t24f", field, origin, res)

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
        return shape, params, traj, rng

    def test_parity_vs_xla_warm_sweep(self):
        from isdf_tpu.sweep.sweep_sdf import sweep_sdf_warm, sdf_at_time
        from isdf_tpu.sweep.pallas_grid_zoom import (
            grid_sweep_warm_fused, grid_sweep_inputs)

        shape, params, traj, rng = self._setup()
        P = 200
        pts = jnp.asarray(rng.uniform(-1, 9, size=(P, 3)), jnp.float32)
        tw = jnp.asarray(
            rng.uniform(0, float(traj.total_duration), size=(P,)),
            jnp.float32)
        s_ref, t_ref, g_ref = sweep_sdf_warm(
            shape, traj, params, pts, tw, coarse_n=32, refine_rounds=8,
            use_pallas=False)
        dims, dims_c, fieldZ, fieldZc, geo = grid_sweep_inputs(shape.grid)
        durs = traj.durations
        starts = jnp.cumsum(durs) - durs
        t_pl, d_pl, g_pl = grid_sweep_warm_fused(
            dims, dims_c, params, fieldZ, fieldZc, geo, pts, tw, starts,
            durs, traj.coeffs, coarse_n=32, rounds=8, interpret=True)
        # value parity up to field quantization (bf16 at rest, ~2⁻⁸ rel of
        # corner magnitudes); t* must reach an equally deep f32 minimum
        err = np.abs(np.asarray(d_pl) - np.asarray(s_ref))
        assert (err <= 0.015 * np.abs(np.asarray(s_ref)) + 0.015).all(), \
            err.max()
        d_at_tpl = np.asarray(sdf_at_time(shape, traj, params, pts,
                                          jnp.asarray(t_pl)))
        d_at_tref = np.asarray(sdf_at_time(shape, traj, params, pts,
                                           jnp.asarray(t_ref)))
        # bf16 value noise (~1.5% of |d|) can steer t* to a neighbouring
        # near-tie whose true depth is a few cm shallower — bound the
        # regret, not exact equality
        assert (d_at_tpl <= d_at_tref + 6e-2).all(), \
            (d_at_tpl - d_at_tref).max()
        # epilogue gradient vs XLA autodiff gradient at matching t*.
        # Trilinear gradients are piecewise constant per cell: a sub-1e-3
        # t* difference that straddles a voxel boundary produces a
        # legitimate gradient jump of O(field curvature · res), so the
        # bound tolerates isolated boundary-straddling pairs (measured:
        # ~3% of points at |Δg| ≈ 0.07 with the k=4 zoom schedule)
        near = np.abs(np.asarray(t_pl) - np.asarray(t_ref)) < 1e-3
        np.testing.assert_allclose(
            np.asarray(g_pl)[near], np.asarray(g_ref)[near],
            atol=1e-1)

    def test_linearized_penalty_gradient(self):
        """The linearized differentiable sdf* (what swept_penalty
        differentiates on the fused grid path) must match autodiff of the
        true interpolation at f64-XLA reference, to first order."""
        from isdf_tpu.sweep.sweep_sdf import (
            sweep_sdf_warm as ss_warm, _grid_sweep_fused)

        shape, params, traj, rng = self._setup()
        P = 64
        pts = jnp.asarray(rng.uniform(-0.5, 8.5, size=(P, 3)), jnp.float32)
        tw = jnp.zeros((P,), jnp.float32)

        # XLA reference: value+grad through the real interpolation chain
        def pen_ref(coeffs):
            tr = PolyTraj(traj.durations, coeffs)
            s, t, _ = ss_warm(shape, tr, params, pts, tw,
                              coarse_n=32, refine_rounds=8,
                              use_pallas=False)
            return jnp.sum(s)

        # fused-path linearization (kernel in interpret mode)
        import isdf_tpu.sweep.pallas_grid_zoom as pgz
        orig = pgz._grid_sweep_callable
        patched = lambda *a: orig(*a[:-1], True)  # force interpret
        pgz._grid_sweep_callable = patched
        try:
            def pen_fused(coeffs):
                tr = PolyTraj(traj.durations, coeffs)
                s, t, _ = _grid_sweep_fused(
                    shape, tr, params, pts, tw, 32, 8, 0.3)
                return jnp.sum(s)

            v_ref = float(pen_ref(traj.coeffs))
            v_fu, g_fu = jax.value_and_grad(pen_fused)(traj.coeffs)
            # directional-derivative self-consistency: on an argmin-plateau
            # objective the (sub)gradient is seed-dependent, so comparing
            # against the XLA path's gradient is meaningless when t* seeds
            # differ; the meaningful check is that the linearized gradient
            # predicts the FUSED objective's own finite differences
            # (envelope theorem: d/dθ min_t f = ∂f/∂θ at frozen t*)
            rng2 = np.random.default_rng(7)
            h = 1e-3
            rels = []
            for _ in range(6):
                v = jnp.asarray(rng2.normal(size=traj.coeffs.shape),
                                jnp.float32)
                v = v / jnp.linalg.norm(v)
                fd = (float(pen_fused(traj.coeffs + h * v))
                      - float(pen_fused(traj.coeffs - h * v))) / (2 * h)
                pred = float(jnp.vdot(g_fu, v))
                rels.append(abs(fd - pred) / max(abs(fd), abs(pred), 1.0))
            rels = np.sort(rels)
            # calibration: an argmin-plateau objective's FD disagrees with
            # its (envelope) gradient under seed hops — the XLA reference
            # path itself measures rels ≈ [0.04 .. 0.60] on this very
            # problem (round-4 control experiment).  The guard here is
            # against WIRING bugs (sign flip / missing chain term), which
            # fail every direction at rel ≈ 2; exact per-point gradient
            # parity at matching t* is asserted in
            # test_parity_vs_xla_warm_sweep.
            assert rels[0] < 0.2, rels
            assert np.median(rels) < 0.6, rels
        finally:
            pgz._grid_sweep_callable = orig
        assert abs(float(v_fu) - float(v_ref)) <= 0.02 * abs(v_ref) + 0.5


class TestPooledGrid:
    """pooled_grid (the oversized-field t*-search grid, VERDICT r4 #3):
    pooling math + geometry, CPU-checkable without the TPU kernel."""

    def test_pooling_geometry_and_conservatism(self):
        from isdf_tpu.sweep.pallas_grid import pad_grid
        from isdf_tpu.sweep.pallas_grid_zoom import (
            pooled_grid, _zmajor_kernel_bytes)

        rng = np.random.default_rng(0)
        n = 40
        field = rng.normal(size=(n, n, n)).astype(np.float32)
        pg = pad_grid(field, np.array([-1.0, -2.0, 0.5]), 0.1)
        budget = _zmajor_kernel_bytes(20, 20, 20) + 1   # force one 2x pool
        pgp = pooled_grid(pg, budget)
        assert (pgp.nx, pgp.ny, pgp.nz) == (20, 20, 20)
        assert pgp.res == pytest.approx(0.2)
        # pooled cell i samples at the center of fine voxels {2i, 2i+1}
        np.testing.assert_allclose(pgp.origin,
                                   np.array([-0.95, -1.95, 0.55]))
        # min-pool conservatism: pooled value = min of its 8 fine voxels
        f3p = np.asarray(
            pgp.field2d.reshape(-1, pgp.nyp, pgp.nzp)
            [:pgp.nx, :pgp.ny, :pgp.nz])
        fine = field.reshape(20, 2, 20, 2, 20, 2).min(axis=(1, 3, 5))
        np.testing.assert_allclose(f3p, fine)
        # idempotent cache
        assert pooled_grid(pg, budget) is pgp

    def test_under_budget_is_identity_resolution(self):
        from isdf_tpu.sweep.pallas_grid import pad_grid
        from isdf_tpu.sweep.pallas_grid_zoom import pooled_grid

        field = np.zeros((8, 8, 8), np.float32)
        pg = pad_grid(field, np.zeros(3), 0.1)
        pgp = pooled_grid(pg, 8 * 1024 * 1024)
        assert (pgp.nx, pgp.ny, pgp.nz) == (8, 8, 8)
        assert pgp.res == pytest.approx(0.1)
