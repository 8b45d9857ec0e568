"""Demo scenario tests against the reference's own assets (configs transcribed
from config_*.yaml, maps from map_pcds/*.pcd, bodies from shapes/*.obj)."""

import os

import numpy as np
import pytest

from isdf_tpu.demos import DEMOS, REFERENCE_ROOT, load_demo_points, run_demo

HAVE_REF = os.path.isdir(os.path.join(REFERENCE_ROOT, "src", "plan_manager"))


class TestSpecs:
    def test_all_six_demos_defined(self):
        assert sorted(DEMOS) == [1, 2, 3, 4, 5, 6]

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


@pytest.mark.skipif(not HAVE_REF, reason="reference assets absent")
class TestDemo1EndToEnd:
    def test_demo1_plans_collision_free(self):
        pm, res = run_demo(
            1, max_iters=30,
            conf_overrides=dict(
                integralIntervs=16, sweep_coarse_samples=32,
                sweep_refine_rounds=8, max_obstacle_points=1024,
            ),
        )
        assert res.success
        assert res.metrics["parallel_points_num"] > 100
        min_sdf = pm.audit_collision(res.traj)
        assert min_sdf > 0.0, f"swept volume collides: {min_sdf}"
