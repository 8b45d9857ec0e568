"""Demo scenario tests against the reference's own assets (configs transcribed
from config_*.yaml, maps from map_pcds/*.pcd, bodies from shapes/*.obj)."""

import os

import numpy as np
import pytest

from isdf_tpu.demos import DEMOS, REFERENCE_ROOT, load_demo_points, run_demo

pytestmark = pytest.mark.demo

HAVE_REF = os.path.isdir(os.path.join(REFERENCE_ROOT, "src", "plan_manager"))


class TestSpecs:
    def test_all_demos_defined(self):
        # 1-6: the reference launch files; 7-8: the paper's 2-D experiments
        assert sorted(DEMOS) == [1, 2, 3, 4, 5, 6, 7, 8]
        assert DEMOS[7].planar and not DEMOS[7].yaw_opt
        assert DEMOS[8].planar and DEMOS[8].yaw_opt

    def test_config_values_transcribed(self):
        c1 = DEMOS[1].config
        assert c1.kernel_size == 13 and c1.safety_hor == 0.866 and c1.rho == 20.0
        c6 = DEMOS[6].config
        assert c6.kernel_size == 17 and c6.safety_hor == 0.6
        assert DEMOS[2].config.rho == 380.0


@pytest.mark.skipif(not HAVE_REF, reason="reference assets absent")
class TestDemoAssets:
    def test_pcd_loads(self):
        pts = load_demo_points(DEMOS[1])
        assert pts.shape == (80107, 3)
        assert pts.min() >= -1e-6 and pts.max() < 51.0

    def test_generated_map_demo6(self):
        pts = load_demo_points(DEMOS[6])
        assert len(pts) > 5000


_FAST = dict(
    integralIntervs=16, sweep_coarse_samples=32,
    sweep_refine_rounds=8, max_obstacle_points=1024,
)


@pytest.mark.demo
@pytest.mark.skipif(not HAVE_REF, reason="reference assets absent")
class TestDemosEndToEnd:
    """All six reference demos, fast-override settings.  Collision audited
    against every occupied voxel near the trajectory (the reference's
    isTrajCollide is a stub — sw_manager.hpp:764-767 — so this is stricter
    than the reference's own validation)."""

    def _run(self, demo_id, max_iters=30, extra=None, **kw):
        ov = dict(_FAST, **(extra or {}))
        pm, res = run_demo(demo_id, max_iters=max_iters, conf_overrides=ov, **kw)
        assert res.success, f"demo{demo_id} failed: {res.metrics}"
        assert res.metrics["parallel_points_num"] > 100
        min_sdf = pm.audit_collision(res.traj)
        assert min_sdf > 0.0, f"demo{demo_id} swept volume collides: {min_sdf}"
        return pm, res

    def test_demo1(self):
        self._run(1)

    def test_demo2(self):
        # the BendLinear_big body in the dense random map needs the full
        # safety-replan loop to clear its last grazing voxel
        self._run(2, max_iters=60, extra=dict(safety_replan_rounds=4))

    def test_demo3(self):
        self._run(3)

    def test_demo4(self):
        self._run(4)

    def test_demo5(self):
        self._run(5)

    def test_demo6(self):
        pm, res = self._run(6)
        # the L-shape through map3's slits is the attitude-critical case:
        # the A* SE(3) search must produce non-trivial pose references
        assert res.metrics.get("attitude_refs"), "A* attitude refs unused"
        tilt = np.degrees(np.maximum(np.abs(res.rolls), np.abs(res.pitches)))
        assert tilt.max() >= 18.0


@pytest.mark.demo
class TestPlanarDemos:
    """2-D demos (no reference assets needed — procedural maps)."""

    def test_demo7_circle_forest(self):
        shape, res = run_demo(7, max_iters=120)
        assert res.success
        assert res.metrics["min_swept_sdf"] > 0.0, res.metrics

    def test_demo8_bar_yaw_gaps(self):
        shape, res = run_demo(8, max_iters=100)
        assert res.success
        assert res.metrics["min_swept_sdf"] > 0.0, res.metrics
        # yaw must actually vary to slide through the offset gaps
        import jax, jax.numpy as jnp

        ts = jnp.linspace(0.0, res.traj.total_duration, 200)
        psi = np.asarray(jax.vmap(res.traj.pos)(ts))[:, 2]
        assert psi.max() - psi.min() > 0.5
