"""Front-end tests: kernel voxelization vs direct SDF thresholding, conv
feasibility vs brute force, A* optimality on open grids, wall avoidance, and
pose-aware slit traversal (a flat plate must roll to pass a narrow slit)."""

import numpy as np
import jax.numpy as jnp
import pytest

from isdf_tpu.config import Config
from isdf_tpu.shapes import make_shape
from isdf_tpu.search import build_pose_kernels, pose_feasibility, astar_se3
from isdf_tpu.search.astar import subsample_waypoints
from isdf_tpu.world import GridMap, maps_gen

pytestmark = pytest.mark.smoke


class TestPoseKernels:
    def test_kernel_matches_direct_sdf(self):
        conf = Config(kernel_size=9, occupancy_resolution=0.3,
                      kernel_max_roll=18, kernel_max_pitch=18, kernel_ang_res=9)
        shape = make_shape("Ball")
        pk = build_pose_kernels(shape, conf)
        assert pk.kernels.shape == (5, 5, 9, 9, 9)
        # ball: kernel is pose-independent; center voxel always inside
        kern = np.asarray(pk.kernels)
        assert kern[:, :, 4, 4, 4].all()
        # voxel at distance > r+margin must be outside
        assert not kern[:, :, 0, 0, 0].any()
        # pose independence for a sphere
        assert (kern == kern[0, 0]).all()

    def test_feasibility_matches_bruteforce(self):
        conf = Config(kernel_size=5, occupancy_resolution=0.5,
                      kernel_max_roll=9, kernel_max_pitch=9, kernel_ang_res=9)
        shape = make_shape("Ball")
        pk = build_pose_kernels(shape, conf)
        rng = np.random.default_rng(0)
        occ = rng.random((12, 10, 8)) < 0.1
        feas = np.asarray(pose_feasibility(jnp.asarray(occ), pk.kernels))
        kern = np.asarray(pk.kernels)
        # brute force at a few voxels
        for _ in range(30):
            x, y, z = rng.integers(0, 12), rng.integers(0, 10), rng.integers(0, 8)
            r, p = rng.integers(0, 3), rng.integers(0, 3)
            collide = False
            for a in range(5):
                for b in range(5):
                    for c in range(5):
                        if not kern[r, p, a, b, c]:
                            continue
                        ix, iy, iz = x + a - 2, y + b - 2, z + c - 2
                        if 0 <= ix < 12 and 0 <= iy < 10 and 0 <= iz < 8 and occ[ix, iy, iz]:
                            collide = True
            assert feas[r, p, x, y, z] == (not collide)


class TestAstar:
    def _empty_map(self, n=20, res=0.5):
        return GridMap.from_points(np.zeros((0, 3)), (0, n * res, 0, n * res, 0, n * res), res)

    def test_straight_line_optimal(self):
        gm = self._empty_map()
        r = astar_se3(gm, np.array([0.3, 0.3, 0.3]), np.array([9.7, 0.3, 0.3]))
        assert r.success
        # path length ≈ straight distance (diagonal moves allowed)
        seg = np.diff(r.path, axis=0)
        L = np.linalg.norm(seg, axis=1).sum()
        assert L <= 9.5 + 1e-6

    def test_avoids_wall(self):
        pts = maps_gen.gene_wall(4.0, 0.0, 1.0, 8.0, 10.0, res=0.2)
        gm = GridMap.from_points(pts, (0, 10, 0, 10, 0, 10), 0.5)
        r = astar_se3(gm, np.array([1.0, 1.0, 1.0]), np.array([9.0, 1.0, 1.0]))
        assert r.success
        occ_hits = sum(bool(gm.is_occupied(jnp.asarray(p))) for p in r.path)
        assert occ_hits == 0

    def test_pose_aware_slit(self):
        """A rod with long axis y cannot pass a narrow-in-y slit at zero
        roll but can when rolled 90° about x (y-extent rotates into z) —
        the pose-aware search must find the rolled path."""
        conf = Config(
            kernel_size=9, occupancy_resolution=0.5,
            kernel_max_roll=90, kernel_max_pitch=0, kernel_ang_res=45,
            box_x=0.2, box_y=1.8, box_z=0.2, front_end_safeh=0.0,
        )
        shape = make_shape("Box", conf)
        pk = build_pose_kernels(shape, conf)
        # wall at x∈[5,6) with a vertical slit (narrow in y, tall in z)
        pts = np.concatenate([
            maps_gen.gene_wall(5.0, 0.0, 1.0, 4.2, 10.0, res=0.25),
            maps_gen.gene_wall(5.0, 5.8, 1.0, 4.2, 10.0, res=0.25),
        ])
        gm = GridMap.from_points(pts, (0, 10, 0, 10, 0, 10), 0.5)
        feas = pose_feasibility(gm.occ, pk.kernels)
        r = astar_se3(
            gm, np.array([2.0, 5.0, 5.0]), np.array([8.0, 5.0, 5.0]),
            feasibility=np.asarray(feas), rolls=np.asarray(pk.rolls),
            pitches=np.asarray(pk.pitches),
        )
        assert r.success
        # crossing the slit requires |roll| = 90°
        xs = r.path[:, 0]
        crossing = (xs > 4.9) & (xs < 6.1)
        assert np.any(np.abs(np.abs(r.rolls[crossing]) - np.pi / 2) < 1e-6)

    def test_subsample(self):
        path = np.zeros((40, 3))
        idxs = subsample_waypoints(path, resolution=0.5, parlength=3.0)
        assert len(idxs) >= 1
        assert idxs[0] == 6
