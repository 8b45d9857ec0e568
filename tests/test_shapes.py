"""Shape-zoo parity tests: JAX SDFs vs literal numpy transcriptions of the
reference formulas (Shape.hpp), plus gradient sanity (autodiff finite and
unit-norm where expected)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isdf_tpu.shapes import make_shape, ops, primitives as pr
from isdf_tpu.shapes.zoo import SHAPE_REGISTRY
from isdf_tpu.config import Config

RNG = np.random.default_rng(7)
PTS = RNG.normal(size=(64, 3)) * 3.0


# ---- literal reference transcriptions (numpy, double) ----------------------
def ref_torus(p, tube=2.5, torus_r=0.3):
    q = np.array([np.hypot(p[0], p[2]) - tube, p[1]])
    return np.linalg.norm(q) - torus_r


def ref_box(p, size):
    q = np.abs(p) - np.asarray(size)
    return np.linalg.norm(np.maximum(q, 0)) + min(max(q[0], max(q[1], q[2])), 0.0)


def ref_capped_cone(p, ra=2.0, rb=0.8):
    a, b = np.array([0, 0, -1.0]), np.array([0, 0, 1.0])
    rba = rb - ra
    baba = (b - a) @ (b - a)
    papa = (p - a) @ (p - a)
    paba = (p - a) @ (b - a) / baba
    x = np.sqrt(papa - paba * paba * baba)
    cax = max(0.0, x - (ra if paba < 0.5 else rb))
    cay = abs(paba - 0.5) - 0.5
    k = rba * rba + baba
    f = np.clip((rba * (x - ra) + paba * baba) / k, 0.0, 1.0)
    cbx = x - ra - f * rba
    cby = paba - f
    s = -1 if (cbx < 0 and cay < 0) else 1
    d = np.sqrt(min(cax * cax + cay * cay * baba, cbx * cbx + cby * cby * baba))
    return s * np.sqrt(abs(d)) / abs(baba)


def ref_twistbox(p, size=2.0, k=math.pi / 6):
    x, y, z = p
    c, s = np.cos(k * z), np.sin(k * z)
    q = np.array([c * x - s * y, s * x + c * y, z])
    return ref_box(q, np.full(3, size / 2))


def ref_smooth_intersection(p, size, radius):
    q = np.abs(p) - np.asarray(size) / 2
    box_sdf = np.linalg.norm(np.maximum(q, 0)) + min(max(q[0], max(q[1], q[2])), 0.0)
    sphere_sdf = np.linalg.norm(p) - radius
    h = np.clip(0.5 - 0.5 * (sphere_sdf - box_sdf) / 0.25, 0.0, 1.0)
    m = sphere_sdf + (box_sdf - sphere_sdf) * h
    return m + 0.25 * h * (1.0 - h)


def ref_bend_linear(p, ca, cb, r):
    p0, p1, v = np.array([0, 0, -1.0]), np.array([0, 0, 1.0]), np.array([-1.0, 0, 0])
    ab = p1 - p0
    t = np.clip((p - p0) @ ab / (ab @ ab), 0, 1)
    u = 2 * t - 1
    ease = 2 * t * t if t < 0.5 else -0.5 * (u * (u - 2) - 1)
    q = ease * v + p
    a, b = np.array([0, 0, ca]), np.array([0, 0, cb])
    pa, ba = q - a, b - a
    h = np.clip(pa @ ba / (ba @ ba), 0, 1)
    return np.linalg.norm(pa - h * ba) - r


class TestZooParity:
    def test_torus(self):
        s = make_shape("Torus")
        got = np.array(s.sdf(jnp.array(PTS)))
        want = np.array([ref_torus(p) for p in PTS])
        np.testing.assert_allclose(got, want, atol=2e-6)

    def test_capped_cone(self):
        s = make_shape("CappedCone")
        got = np.array(s.sdf(jnp.array(PTS)))
        want = np.array([ref_capped_cone(p) for p in PTS])
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_twist_box(self):
        s = make_shape("TwistBox")
        got = np.array(s.sdf(jnp.array(PTS)))
        want = np.array([ref_twistbox(p) for p in PTS])
        np.testing.assert_allclose(got, want, atol=2e-6)

    def test_smooth_intersection(self):
        s = make_shape("SmoothIntersection")
        got = np.array(s.sdf(jnp.array(PTS)))
        want = np.array(
            [ref_smooth_intersection(p, (3.0, 3.0, 0.5), 1.0) for p in PTS]
        )
        np.testing.assert_allclose(got, want, atol=2e-6)

    def test_bend_linear(self):
        s = make_shape("BendLinear")
        got = np.array(s.sdf(jnp.array(PTS)))
        want = np.array([ref_bend_linear(p, -2.0, 2.0, 0.25) for p in PTS])
        np.testing.assert_allclose(got, want, atol=2e-6)

    def test_box_uses_config(self):
        conf = Config(box_x=3.0, box_y=0.3, box_z=0.3)
        s = make_shape("Box", conf)
        got = np.array(s.sdf(jnp.array(PTS)))
        want = np.array([ref_box(p, (3.0, 0.3, 0.3)) for p in PTS])
        np.testing.assert_allclose(got, want, atol=2e-6)

    def test_pose_transform(self):
        """poly_params (trans + euler degrees) matches (p − t)·Rz·Ry·Rx."""
        conf = Config(poly_params=(1.0, -2.0, 0.5, 30.0, 0.0, 45.0))
        s = make_shape("Ball", conf)
        t = np.array([1.0, -2.0, 0.5])
        got = np.array(s.sdf(jnp.array(PTS)))
        want = np.linalg.norm(PTS - t, axis=-1) - 1.0  # sphere is rot-invariant
        np.testing.assert_allclose(got, want, atol=2e-6)

    @pytest.mark.parametrize("name", sorted(SHAPE_REGISTRY))
    def test_all_shapes_eval_and_grad_finite(self, name):
        s = make_shape(name, Config())
        p = jnp.array(PTS)
        d = s.sdf(p)
        g = s.grad(p)
        assert np.all(np.isfinite(np.array(d)))
        assert np.all(np.isfinite(np.array(g)))
        # far away the field must be positive (outside)
        far = jnp.array([[50.0, 40.0, 30.0]])
        assert float(s.sdf(far)[0]) > 0

    # CappedCone excluded: the reference's formula returns s·√d/|ba|² — not a
    # true metric, so its gradient is not unit norm.
    @pytest.mark.parametrize("name", ["Ball", "Torus", "Table", "CSG"])
    def test_grad_unit_norm_outside(self, name):
        s = make_shape(name)
        p = jnp.array(RNG.normal(size=(32, 3)) * 6.0 + 8.0)
        g = np.array(s.grad(p))
        n = np.linalg.norm(g, axis=-1)
        np.testing.assert_allclose(n, 1.0, atol=1e-2)

    def test_sdf_at_pose(self):
        s = make_shape("Ball")
        x = jnp.array([1.0, 2.0, 3.0])
        th = 0.7
        R = jnp.array(
            [
                [np.cos(th), -np.sin(th), 0],
                [np.sin(th), np.cos(th), 0],
                [0, 0, 1.0],
            ]
        )
        pw = jnp.array([[2.0, 2.0, 3.0]])
        d = float(s.sdf_at_pose(pw, x, R)[0])
        np.testing.assert_allclose(d, 0.0, atol=2e-6)  # 1 away from center, r=1


class TestOps:
    def test_union_intersection(self):
        f = lambda p: pr.sphere(p, 1.0)
        g = ops.translate(f, (3.0, 0, 0))
        u = ops.union(f, g)
        p = jnp.array([[3.0, 0.0, 0.0]])
        np.testing.assert_allclose(float(u(p)[0]), -1.0, atol=2e-6)
        i = ops.intersection(f, g)
        assert float(i(p)[0]) > 0

    def test_scale(self):
        f = ops.scale(lambda p: pr.sphere(p, 1.0), 2.0)
        p = jnp.array([[4.0, 0.0, 0.0]])
        np.testing.assert_allclose(float(f(p)[0]), 2.0, atol=2e-6)

    def test_shell_dilate_erode(self):
        f = lambda p: pr.sphere(p, 1.0)
        p = jnp.array([[2.0, 0.0, 0.0]])
        np.testing.assert_allclose(float(ops.dilate(f, 0.3)(p)[0]), 0.7, atol=2e-6)
        np.testing.assert_allclose(float(ops.erode(f, 0.3)(p)[0]), 1.3, atol=2e-6)
        np.testing.assert_allclose(float(ops.shell(f, 0.1)(p)[0]), 0.9, atol=2e-6)

    def test_smooth_union_bounds(self):
        f = lambda p: pr.sphere(p, 1.0)
        g = ops.translate(f, (2.5, 0, 0))
        su = ops.smooth_union(f, g, 0.25)
        u = ops.union(f, g)
        p = jnp.array(RNG.normal(size=(32, 3)) * 2)
        assert np.all(np.array(su(p)) <= np.array(u(p)) + 1e-9)
