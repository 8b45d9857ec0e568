"""Depth renderer (local_sensing equivalent) — geometric oracle tests."""

import jax.numpy as jnp
import numpy as np

from isdf_tpu.config import Config
from isdf_tpu.sim import CameraIntrinsics, render_depth, render_pointcloud
from isdf_tpu.world import GridMap
import pytest

pytestmark = pytest.mark.smoke


def _wall_map():
    """A single wall slab at x ∈ [6, 7] spanning y/z."""
    ys, zs = np.meshgrid(np.arange(0.25, 10, 0.25), np.arange(0.25, 5, 0.25))
    pts = np.stack(
        [np.full(ys.size, 6.5), ys.ravel(), zs.ravel()], axis=1
    )
    gm = GridMap.from_points(pts, (0, 10, 0, 10, 0, 5), 0.5, 1)
    return gm.with_esdf()


class TestDepthRender:
    def setup_method(self):
        self.gm = _wall_map()
        self.cam = CameraIntrinsics.from_fov(32, 24, fov_x_deg=60.0)

    def test_center_pixel_hits_wall_at_range(self):
        pos = np.array([1.0, 5.0, 2.5])
        R = np.eye(3)[:, [1, 2, 0]].T  # camera z → world +x
        R = np.stack([np.array([0, -1.0, 0]),
                      np.array([0, 0, -1.0]),
                      np.array([1.0, 0, 0])], axis=1)
        depth = np.asarray(render_depth(self.gm, self.cam, pos, R))
        center = depth[self.cam.height // 2, self.cam.width // 2]
        # wall front face ≈ x=6.25 voxel boundary; ESDF zero level sits near
        # the occupied-cell centers, so allow a voxel of slack
        assert 4.5 < center < 5.8, center

    def test_looking_away_sees_nothing(self):
        pos = np.array([1.0, 5.0, 2.5])
        R = np.stack([np.array([0, 1.0, 0]),
                      np.array([0, 0, -1.0]),
                      np.array([-1.0, 0, 0])], axis=1)  # z → world −x
        depth = np.asarray(render_depth(self.gm, self.cam, pos, R,
                                        max_depth=8.0))
        assert (depth >= 8.0 - 1e-6).mean() > 0.95

    def test_pointcloud_lands_on_wall(self):
        pos = np.array([1.0, 5.0, 2.5])
        R = np.stack([np.array([0, -1.0, 0]),
                      np.array([0, 0, -1.0]),
                      np.array([1.0, 0, 0])], axis=1)
        pts, valid = render_pointcloud(self.gm, self.cam, pos, R)
        pts, valid = np.asarray(pts), np.asarray(valid)
        assert valid.any()
        hit_x = pts[valid][:, 0]
        assert np.all(hit_x > 5.2) and np.all(hit_x < 7.5)
