"""World layer tests: occupancy building, exact ESDF vs brute force,
trilinear interpolation, inflation, AABB gathers, map generators."""

import jax
import jax.numpy as jnp
import numpy as np

from isdf_tpu.world import GridMap, aabb, maps_gen
import pytest

pytestmark = pytest.mark.smoke


def brute_force_esdf(occ, res):
    occ = np.asarray(occ)
    pts_occ = np.argwhere(occ)
    pts_free = np.argwhere(~occ)
    out = np.zeros(occ.shape)
    idx = np.argwhere(np.ones_like(occ))
    for p in idx:
        d_occ = np.sqrt(((pts_occ - p) ** 2).sum(-1).min()) if len(pts_occ) else 1e6
        d_free = np.sqrt(((pts_free - p) ** 2).sum(-1).min()) if len(pts_free) else 1e6
        out[tuple(p)] = (d_occ - d_free) * res
    return out


class TestGridMap:
    def test_from_points_threshold(self):
        pts = np.array([[0.5, 0.5, 0.5], [0.55, 0.5, 0.5], [2.5, 0.5, 0.5]])
        gm = GridMap.from_points(pts, (0, 4, 0, 4, 0, 4), 1.0, sta_threshold=2)
        occ = np.asarray(gm.occ)
        assert occ[0, 0, 0]
        assert not occ[2, 0, 0]  # single hit < threshold

    def test_esdf_matches_brute_force(self):
        rng = np.random.default_rng(3)
        pts = rng.uniform(0, 6, size=(40, 3))
        gm = GridMap.from_points(pts, (0, 6, 0, 6, 0, 6), 0.5).with_esdf()
        expect = brute_force_esdf(gm.occ, 0.5)
        np.testing.assert_allclose(np.asarray(gm.esdf), expect, atol=1e-5)

    def test_sdf_interp_and_grad(self):
        # single occupied voxel at center; SDF ≈ distance to it
        pts = np.array([[2.5, 2.5, 2.5]])
        gm = GridMap.from_points(pts, (0, 5, 0, 5, 0, 5), 1.0).with_esdf()
        q = jnp.array([[0.5, 2.5, 2.5]])
        v = float(gm.sdf_value(q)[0])
        np.testing.assert_allclose(v, 2.0, atol=0.2)
        g = np.asarray(gm.sdf_grad(q))[0]
        assert g[0] <= -0.49  # moving +x decreases distance-to-obstacle:
        # voxel (2,2,2) is occupied; query left of it → d decreases toward it,
        # so ∂d/∂x < 0.
        assert np.isfinite(g).all()

    def test_inflate(self):
        pts = np.array([[2.5, 2.5, 2.5]])
        gm = GridMap.from_points(pts, (0, 5, 0, 5, 0, 5), 1.0)
        gi = gm.inflated(1)
        assert int(np.asarray(gi.occ).sum()) == 27

    def test_world_index_roundtrip(self):
        gm = GridMap.from_points(np.zeros((0, 3)), (-2, 2, -2, 2, 0, 4), 0.25)
        p = jnp.array([0.33, -1.2, 3.9])
        idx = gm.world_to_index(p)
        c = gm.index_to_world(idx)
        assert float(jnp.max(jnp.abs(c - p))) <= 0.25


class TestAABB:
    def test_gather_and_dedup(self):
        pts = np.array([[1.5, 1.5, 1.5], [2.5, 1.5, 1.5], [8.5, 8.5, 8.5]])
        gm = GridMap.from_points(pts, (0, 10, 0, 10, 0, 10), 1.0)
        wps = np.array([[1.5, 1.5, 1.5], [2.0, 1.5, 1.5]])  # overlapping boxes
        out, mask = aabb.gather_aabb_points(gm, wps, (2.0, 2.0, 2.0), max_points=16)
        n = int(mask.sum())
        assert n == 2  # dedup: two occupied voxels near, far one excluded
        got = set(map(tuple, np.round(out[mask], 2)))
        assert (1.5, 1.5, 1.5) in got and (2.5, 1.5, 1.5) in got

    def test_static_shape(self):
        gm = GridMap.from_points(np.zeros((0, 3)), (0, 4, 0, 4, 0, 4), 1.0)
        out, mask = aabb.gather_aabb_points(gm, np.zeros((1, 3)), (1, 1, 1), max_points=8)
        assert out.shape == (8, 3) and mask.shape == (8,)
        assert not mask.any()


class TestMapsGen:
    def test_wall_extents(self):
        w = maps_gen.gene_wall(1.0, 2.0, 3.0, 1.0, 2.0, res=0.25)
        assert w[:, 0].min() >= 1.0 and w[:, 0].max() < 4.3
        assert w[:, 2].min() >= 0.0 and w[:, 2].max() < 2.3

    def test_named_maps_reproducible(self):
        a = maps_gen.generate(4, res=0.3, seed=5)
        b = maps_gen.generate(4, res=0.3, seed=5)
        np.testing.assert_array_equal(a, b)
        c = maps_gen.generate(4, res=0.3, seed=6)
        assert a.shape != c.shape or not np.allclose(a, c)

    def test_all_eleven_map_ids(self):
        # ref globalmap_gene.cpp:405-418 dispatches ids 1-11
        for i in range(1, 12):
            pts = maps_gen.generate(i, res=0.4, seed=2)
            assert pts.ndim == 2 and pts.shape[1] == 3 and len(pts) > 0

    def test_map7_maze_openings(self):
        pts = maps_gen.generate(7, res=0.3)
        gm = GridMap.from_points(pts, (0, 60, 0, 60, 0, 35), 0.5)
        occ = np.asarray(gm.occ)
        xi = int(30.5 / 0.5)
        # window y∈[26,36)×z∈[8,12) is free; base wall z<8 is occupied
        assert not occ[xi, int(30 / 0.5), int(10.0 / 0.5)]
        assert occ[xi, int(30 / 0.5), int(3.0 / 0.5)]

    def test_mockamap_maze2d_connected(self):
        # the recursive-division carving (ref mockamap maps.cpp:180-498)
        # must leave the free space fully connected and walled if asked
        from collections import deque

        rng = np.random.default_rng(5)
        mx = my = 21
        maze = np.zeros((mx, my), np.int8)
        maps_gen._recursive_division(maze, 0, mx - 1, 0, my - 1, rng)
        free = np.argwhere(maze == 0)
        assert len(free) > 0 and maze.sum() > mx  # real walls were added
        seen = {tuple(free[0])}
        q = deque(seen)
        while q:
            x, y = q.popleft()
            for dx, dy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                n = (x + dx, y + dy)
                if 0 <= n[0] < mx and 0 <= n[1] < my and \
                        maze[n] == 0 and n not in seen:
                    seen.add(n)
                    q.append(n)
        assert len(seen) == len(free), "maze free space disconnected"

        pts = maps_gen.maze2d(size=(40, 40, 12), res=0.5, seed=1)
        assert pts.ndim == 2 and pts.shape[1] == 3 and len(pts) > 0
        # full-height extrusion: every occupied column spans all z layers
        assert np.isclose(pts[:, 2].max(), 12 * 0.5 - 0.25)

    def test_mockamap_maze3d_walls(self):
        pts = maps_gen.maze3d(size=(24, 24, 12), res=0.5, seed=2,
                              num_nodes=8)
        assert pts.ndim == 2 and pts.shape[1] == 3 and len(pts) > 0
        # walls are bisector surfaces: a thin shell, not a filled volume
        assert len(pts) < 24 * 24 * 12 * 0.5

    def test_triangle_tapers(self):
        tri = maps_gen.gene_triangle(0.0, 0.0, 4.0, 3.0, 6.0, res=0.2)
        base = tri[tri[:, 2] < 0.3]
        top = tri[tri[:, 2] > 3.5]
        assert base[:, 0].max() > top[:, 0].max() + 1.0

    def test_map5_slit(self):
        pts = maps_gen.generate(5, res=0.3)
        gm = GridMap.from_points(pts, (0, 60, 0, 60, 0, 35), 0.5)
        occ = np.asarray(gm.occ)
        # wall at x≈30-32: z∈[15,18) must stay free (the slit)
        xi = int((31 - 0) / 0.5)
        zi_open = int(16.5 / 0.5)
        zi_wall = int(10.0 / 0.5)
        assert not occ[xi, 40, zi_open]
        assert occ[xi, 40, zi_wall]
