"""Native core + viz tests: C++ A* parity with the Python twin, marching
tetrahedra surface accuracy on a sphere field, swept-volume mesh extraction,
OBJ export round-trip."""

import os
import tempfile

import numpy as np
import jax.numpy as jnp
import pytest

from isdf_tpu import native
from isdf_tpu.core import minco
from isdf_tpu.core.flatness import FlatParams
from isdf_tpu.core.poly import PolyTraj
from isdf_tpu.search import astar_se3
from isdf_tpu.shapes import make_shape
from isdf_tpu.viz import swept_volume_mesh, export_obj
from isdf_tpu.world import GridMap, maps_gen

pytestmark = pytest.mark.smoke


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable")
    return lib


class TestNativeAstar:
    def test_matches_python(self, lib):
        pts = maps_gen.gene_wall(4.0, 0.0, 1.0, 8.0, 10.0, res=0.2)
        gm = GridMap.from_points(pts, (0, 10, 0, 10, 0, 10), 0.5)
        start, goal = np.array([1.0, 1.0, 1.0]), np.array([9.0, 1.0, 1.0])
        r_native = astar_se3(gm, start, goal, use_native=True)
        r_py = astar_se3(gm, start, goal, use_native=False)
        assert r_native.success and r_py.success
        # both must be optimal → equal path cost
        def cost(p):
            return np.linalg.norm(np.diff(p, axis=0), axis=1).sum()
        np.testing.assert_allclose(cost(r_native.path), cost(r_py.path), atol=1e-9)

    def test_failure_when_blocked(self, lib):
        wall = maps_gen.gene_wall(4.0, 0.0, 2.0, 10.0, 10.0, res=0.2)
        gm = GridMap.from_points(wall, (0, 10, 0, 10, 0, 10), 0.5)
        r = astar_se3(gm, np.array([1.0, 1, 1]), np.array([9.0, 1, 1]))
        assert not r.success


class TestMarchingTetrahedra:
    def test_sphere_surface(self, lib):
        n = 24
        res = 0.25
        origin = np.array([-3.0, -3.0, -3.0])
        xs = origin[0] + np.arange(n) * res
        g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)
        field = np.linalg.norm(g, axis=-1) - 2.0
        tris = native.marching_tetrahedra(field, origin, res, 0.0)
        assert tris is not None and len(tris) > 100
        # all triangle vertices lie near the radius-2 sphere
        r = np.linalg.norm(tris.reshape(-1, 3), axis=1)
        np.testing.assert_allclose(r, 2.0, atol=res)

    def test_python_fallback_agrees(self, lib):
        from isdf_tpu.viz.swept_mesh import _marching_tetrahedra_py

        n, res = 10, 0.5
        origin = np.array([-2.5, -2.5, -2.5])
        xs = origin[0] + np.arange(n) * res
        g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)
        field = np.linalg.norm(g, axis=-1) - 1.5
        a = native.marching_tetrahedra(field, origin, res, 0.0)
        b = _marching_tetrahedra_py(field, origin, res, 0.0)
        assert len(a) == len(b)
        np.testing.assert_allclose(
            np.sort(a.reshape(-1)), np.sort(b.reshape(-1)), atol=1e-9
        )


class TestSweptMesh:
    def test_ball_sweep_is_tube(self):
        # straight-line trajectory of a ball → capsule-ish surface
        q = jnp.array([[2.0, 0.0, 0.0]])
        T = jnp.array([2.0, 2.0])
        head = jnp.zeros((3, 3))
        tail = jnp.zeros((3, 3)).at[:, 0].set(jnp.array([4.0, 0.0, 0.0]))
        traj = PolyTraj(T, minco.solve(q, T, head, tail))
        shape = make_shape("Ball")
        tris = swept_volume_mesh(shape, traj, FlatParams(), resolution=0.3)
        assert tris is not None and len(tris) > 50
        v = tris.reshape(-1, 3)
        # every surface vertex ≈ distance 1 from the segment [0,4]×{0}×{0}
        t = np.clip(v[:, 0], 0.0, 4.0)
        d = np.linalg.norm(v - np.stack([t, np.zeros_like(t), np.zeros_like(t)], -1), axis=1)
        assert np.percentile(np.abs(d - 1.0), 95) < 0.35

        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "sv.obj")
            export_obj(p, tris)
            from isdf_tpu.shapes.mesh import load_obj

            V, F = load_obj(p)
            assert len(F) == len(tris)


class TestHtmlViewer:
    def test_scene_roundtrip(self, tmp_path):
        """Self-contained HTML viewer (RViz-role, VERDICT r2 #19/#33):
        layers embed, file is standalone (no external scripts)."""
        from isdf_tpu.viz.html_view import HtmlScene

        sc = HtmlScene("test scene")
        rng = np.random.default_rng(0)
        sc.add_points("voxels", rng.uniform(0, 5, (200, 3)))
        sc.add_line("traj", np.linspace(0, 5, 30)[:, None] * np.ones(3))
        V = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1.0]])
        F = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]])
        sc.add_mesh("body", V, F)
        sc.add_poses("poses", np.zeros((2, 3)),
                     np.stack([np.eye(3)] * 2))
        out = sc.write(str(tmp_path / "scene.html"))
        html = open(out).read()
        assert "voxels" in html and "traj" in html and "body" in html
        assert "<script src" not in html  # fully self-contained
        assert "DATA" in html and "proj" in html
        import json as _json
        import re

        m = re.search(r"const DATA = (\{.*?\});\n", html, re.S)
        data = _json.loads(m.group(1))
        assert len(data["layers"]) == 4
        assert data["radius"] > 0

    def test_export_plan_view_traj_only(self, tmp_path):
        from isdf_tpu.core import minco
        from isdf_tpu.viz.html_view import export_plan_view
        from isdf_tpu.core.flatness import FlatParams

        q = jnp.array([[2.0, 0.5, 1.0], [4.0, 1.0, 1.0]])
        T = jnp.array([1.5, 1.5, 1.5])
        traj = minco.trajectory(q, T, jnp.zeros((3, 3)),
                                jnp.zeros((3, 3)).at[:, 0].set(
                                    jnp.array([6.0, 1.5, 1.0])))
        out = export_plan_view(str(tmp_path / "v.html"), traj=traj,
                               params=FlatParams())
        assert "trajectory" in open(out).read()
