"""Goal injection + manual take-over (ref src/common/{random_goals,
assign_goals,manual_take_over})."""

import numpy as np

from isdf_tpu.plan.goals import (
    GoalPool, ManualTakeOver, assign_goal, sample_free_goals,
)
from isdf_tpu.world import GridMap, maps_gen
import pytest

pytestmark = pytest.mark.smoke


class TestGoalPool:
    def _pool(self):
        goals = np.array([[0, 0, 1.0], [5, 0, 1.0], [0, 5, 1.0], [5, 5, 1.0]])
        return GoalPool(goals, n_agents=2, arrive_radius=0.5, dwell_s=1.0, seed=3)

    def test_initial_assignment_unique(self):
        pool = self._pool()
        g0 = pool.update(0, [9, 9, 9], now=0.0)
        g1 = pool.update(1, [9, 9, 9], now=0.0)
        assert g0 is not None and g1 is not None
        assert not np.allclose(g0, g1)
        assert pool.occupied.sum() == 2

    def test_reassign_after_dwell(self):
        pool = self._pool()
        g0 = pool.update(0, [9, 9, 9], now=0.0)
        # approach: not arrived yet → no new goal
        assert pool.update(0, g0 + 2.0, now=1.0) is None
        # arrive; dwell clock starts
        assert pool.update(0, g0, now=2.0) is None
        # still dwelling
        assert pool.update(0, g0, now=2.5) is None
        # dwell elapsed → new distinct goal; old slot freed
        g_new = pool.update(0, g0, now=3.5)
        assert g_new is not None and not np.allclose(g_new, g0)
        assert pool.occupied.sum() == 1

    def test_leaving_resets_dwell(self):
        pool = self._pool()
        g0 = pool.update(0, [9, 9, 9], now=0.0)
        pool.update(0, g0, now=1.0)          # arrive
        pool.update(0, g0 + 3.0, now=1.5)    # leave
        assert pool.update(0, g0, now=2.0) is None  # re-arrive, clock restarted
        assert pool.update(0, g0, now=2.5) is None

    def test_assign_goal_override(self):
        pool = self._pool()
        pool.update(0, [9, 9, 9], now=0.0)
        occupied_before = pool.occupied.sum()
        g = assign_goal(pool, 0, [7.0, 7.0, 2.0])
        np.testing.assert_allclose(g, [7.0, 7.0, 2.0])
        assert pool.occupied.sum() == occupied_before - 1  # pool slot freed


class TestSampleFreeGoals:
    def test_goals_in_free_space(self):
        pts = maps_gen.generate(5, res=0.4, seed=0)
        gm = GridMap.from_points(pts, (0, 60, 0, 60, 0, 35), 0.5)
        goals = sample_free_goals(gm, 32, seed=1)
        assert goals.shape == (32, 3)
        for g in goals:
            assert not gm.is_occupied(g)

    def test_deterministic(self):
        pts = maps_gen.generate(5, res=0.4, seed=0)
        gm = GridMap.from_points(pts, (0, 60, 0, 60, 0, 35), 0.5)
        a = sample_free_goals(gm, 8, seed=4)
        b = sample_free_goals(gm, 8, seed=4)
        np.testing.assert_array_equal(a, b)


class TestManualTakeOver:
    def test_stop_latches_and_drops_commands(self):
        mto = ManualTakeOver()
        assert mto.filter_command("cmd") == "cmd"
        assert mto.feed_joy([0, 0, 1, 0], [0, 0, 0, 0])   # button → stop
        assert mto.stopped
        assert mto.filter_command("cmd") is None
        # second press: already stopped
        assert not mto.feed_joy([1, 0, 0, 0], [0, 0, 0, 0])

    def test_manual_velocity_limited(self):
        mto = ManualTakeOver(max_vel=0.2)
        mto.set_pose([1.0, 2.0, 3.0], yaw=0.5)
        assert mto.manual_command(0.1) is None  # not stopped yet
        mto.feed_joy([1, 0, 0, 0], [1.0, -1.0, 0.5, 0.0])
        p1 = mto.manual_command(0.1)
        np.testing.assert_allclose(
            p1, [1.0 + 0.02, 2.0 - 0.02, 3.0 + 0.01, 0.5], atol=1e-12
        )
        # integrates
        p2 = mto.manual_command(0.1)
        assert p2[0] > p1[0]
