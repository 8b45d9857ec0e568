"""Mesh→SDF pipeline tests: OBJ parsing, winding-number sign, point-triangle
distance vs brute force, baked-grid accuracy vs analytic fields, and the
reference's own demo meshes (Lthick.obj etc.) when available."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from isdf_tpu.shapes import mesh as meshlib
from isdf_tpu.shapes.gridsdf import mesh_shape, grid_shape
from isdf_tpu.shapes import make_shape

pytestmark = pytest.mark.smoke

REF_SHAPES = "/root/reference/src/plan_manager/shapes"


def make_cube_mesh(half=1.0):
    """Unit cube [−h, h]³ as 12 triangles with outward normals."""
    h = half
    V = np.array(
        [
            [-h, -h, -h], [h, -h, -h], [h, h, -h], [-h, h, -h],
            [-h, -h, h], [h, -h, h], [h, h, h], [-h, h, h],
        ]
    )
    F = np.array(
        [
            [0, 2, 1], [0, 3, 2],          # bottom (z = −h)
            [4, 5, 6], [4, 6, 7],          # top
            [0, 1, 5], [0, 5, 4],          # y = −h
            [2, 3, 7], [2, 7, 6],          # y = +h
            [1, 2, 6], [1, 6, 5],          # x = +h
            [3, 0, 4], [3, 4, 7],          # x = −h
        ],
        dtype=np.int32,
    )
    return V, F


class TestMeshSDF:
    def test_winding_sign(self):
        V, F = make_cube_mesh()
        pts = np.array([[0.0, 0, 0], [0.5, 0.5, 0.5], [2.0, 0, 0], [0, 0, -3.0]])
        sdf = meshlib.mesh_sdf(pts, V, F)
        assert sdf[0] < 0 and sdf[1] < 0
        assert sdf[2] > 0 and sdf[3] > 0

    def test_distance_matches_box(self):
        V, F = make_cube_mesh()
        rng = np.random.default_rng(0)
        pts = rng.uniform(-2.5, 2.5, size=(200, 3))
        got = meshlib.mesh_sdf(pts, V, F)
        box = make_shape("Box", type("C", (), {"box_x": 1.0, "box_y": 1.0, "box_z": 1.0, "poly_params": (0,) * 6})())
        want = np.asarray(box.sdf(jnp.asarray(pts)))
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_baked_grid_accuracy(self):
        V, F = make_cube_mesh()
        field, origin, res = meshlib.bake_sdf_grid(V, F, resolution=0.1, margin=0.5)
        s = grid_shape("cube", field, origin, res)
        rng = np.random.default_rng(1)
        pts = rng.uniform(-1.3, 1.3, size=(100, 3))
        box = make_shape("Box", type("C", (), {"box_x": 1.0, "box_y": 1.0, "box_z": 1.0, "poly_params": (0,) * 6})())
        got = np.asarray(s.sdf(jnp.asarray(pts)))
        want = np.asarray(box.sdf(jnp.asarray(pts)))
        np.testing.assert_allclose(got, want, atol=0.05)
        g = np.asarray(s.grad(jnp.asarray(pts)))
        assert np.isfinite(g).all()

    def test_outside_fallback_positive_and_growing(self):
        V, F = make_cube_mesh()
        field, origin, res = meshlib.bake_sdf_grid(V, F, resolution=0.2, margin=0.4)
        s = grid_shape("cube", field, origin, res)
        d1 = float(s.sdf(jnp.array([5.0, 0.0, 0.0])))
        d2 = float(s.sdf(jnp.array([9.0, 0.0, 0.0])))
        assert d2 > d1 > 1.0


@pytest.mark.skipif(not os.path.isdir(REF_SHAPES), reason="reference meshes absent")
class TestReferenceMeshes:
    def test_lthick(self):
        s = mesh_shape("Lthick", os.path.join(REF_SHAPES, "Lthick.obj"),
                       resolution=0.1)
        # the L is a solid around the origin: center should be in/near it,
        # far away positive
        far = float(s.sdf(jnp.array([50.0, 0.0, 0.0])))
        assert far > 10.0
        V, _ = meshlib.load_obj(os.path.join(REF_SHAPES, "Lthick.obj"))
        inside_guess = V.mean(axis=0)
        d = float(s.sdf(jnp.asarray(inside_guess)))
        assert d < 1.0  # near or inside the body

    def test_obj_parser_counts(self):
        V, F = meshlib.load_obj(os.path.join(REF_SHAPES, "Torus.obj"))
        assert len(V) > 100 and len(F) > 100
        assert F.max() < len(V)
