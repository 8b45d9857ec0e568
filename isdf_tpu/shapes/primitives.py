"""Analytic SDF primitives as pure JAX functions.

The inventory mirrors the reference's CSG primitive set
(ref: src/utils/include/utils/Shape.hpp:1724-2284 — the `CSG` combinator
library: sphere, capsule, box, rounded/wireframe box, torus, cylinder,
capped/rounded cylinder, capped/rounded cone, ellipsoid, pyramid,
tetrahedron, octahedron, dodecahedron, icosahedron) implemented from the
standard quadric/fold closed forms (Inigo Quilez's catalogue — also the
reference's own source).

Every primitive has ONE implementation, in **component form**
``f(px, py, pz, *params) → d`` where px/py/pz broadcast against each other:
on TPU the vector register lanes hold the (large) point dimension, so the
whole SDF chain runs at full lane utilization — an array-of-structs
``(..., 3)`` layout would put the size-3 component axis in the lanes and run
at 3/128 efficiency (measured 25×+ slower in the sweep zoom, BASELINE.md
"sweep kernel measurements").  The classic ``p (..., 3) → (...)`` API is a
thin slicing wrapper per primitive, kept for geometry utilities and parity
tests.

All are differentiable (no finite-difference ``DEFINE_USEFUL_FUNCTION``
macro needed — ref Shape.hpp:32-88 uses dx=5e-6 central differences) and
fuse cleanly on TPU.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_EPS = 1e-12


def _n3(x, y, z):
    """NaN-safe 3-component norm (gradient defined at 0)."""
    return jnp.sqrt(x * x + y * y + z * z + _EPS)


def _n2(x, y):
    return jnp.sqrt(x * x + y * y + _EPS)


def _norm(v, axis=-1):
    """NaN-safe vector norm (gradient defined at 0) — AoS helper."""
    return jnp.sqrt(jnp.sum(v * v, axis=axis) + _EPS)


def _norm0(v, axis=-1):
    return jnp.sqrt(jnp.sum(v * v, axis=axis))


def _aos(f3):
    """Wrap a component-form SDF into the classic (..., 3) API."""
    def f(p, *args, **kw):
        return f3(p[..., 0], p[..., 1], p[..., 2], *args, **kw)
    return f


# -- quadrics ---------------------------------------------------------------

def sphere_c(px, py, pz, r):
    return _n3(px, py, pz) - r


def point_c(px, py, pz):
    return _n3(px, py, pz)


def box_c(px, py, pz, half):
    """Axis-aligned box with half-extents ``half`` (ref Shape.hpp:2344-2352)."""
    hx, hy, hz = (float(h) for h in half)
    qx = jnp.abs(px) - hx
    qy = jnp.abs(py) - hy
    qz = jnp.abs(pz) - hz
    outside = _n3(jnp.maximum(qx, 0.0), jnp.maximum(qy, 0.0),
                  jnp.maximum(qz, 0.0))
    inside = jnp.minimum(jnp.maximum(qx, jnp.maximum(qy, qz)), 0.0)
    return outside + inside


def rounded_box_c(px, py, pz, half, r):
    return box_c(px, py, pz, half) - r


def wireframe_box_c(px, py, pz, size, thickness):
    """Box wireframe (ref Shape.hpp:1049-1103 WireframeBox)."""
    sx, sy, sz = (float(s) for s in size)
    th = float(thickness)
    psx = jnp.abs(px) - sx / 2 - th / 2
    psy = jnp.abs(py) - sy / 2 - th / 2
    psz = jnp.abs(pz) - sz / 2 - th / 2
    qx = jnp.abs(psx + th / 2) - th / 2
    qy = jnp.abs(psy + th / 2) - th / 2
    qz = jnp.abs(psz + th / 2) - th / 2

    def g(a, b, c):
        return _n3(
            jnp.maximum(a, 0.0), jnp.maximum(b, 0.0), jnp.maximum(c, 0.0)
        ) + jnp.minimum(jnp.maximum(a, jnp.maximum(b, c)), 0.0)

    return jnp.minimum(
        jnp.minimum(g(psx, qy, qz), g(qx, psy, qz)), g(qx, qy, psz)
    )


def torus_c(px, py, pz, ring_r, tube_r):
    """Torus in the x–z plane (axis = y), matching the reference's Torus
    (ref Shape.hpp:824-860: q = (‖(x,z)‖ − R, y))."""
    qx = _n2(px, pz) - ring_r
    return _n2(qx, py) - tube_r


def capped_torus_c(px, py, pz, sc, ra, rb):
    """Capped torus (ref Shape.hpp:896-931 Cappedtorus)."""
    s0, s1 = float(sc[0]), float(sc[1])
    ax = jnp.abs(px)
    k = jnp.where(s1 * ax > s0 * py, ax * s0 + py * s1, _n2(ax, py))
    psq = ax * ax + py * py + pz * pz
    return jnp.sqrt(jnp.maximum(psq + ra * ra - 2.0 * ra * k, _EPS)) - rb


def capsule_c(px, py, pz, a, b, r):
    ax, ay, az = (float(v) for v in a)
    bx, by, bz = (float(v) for v in b)
    pax, pay, paz = px - ax, py - ay, pz - az
    bax, bay, baz = bx - ax, by - ay, bz - az
    bb = bax * bax + bay * bay + baz * baz
    h = jnp.clip((pax * bax + pay * bay + paz * baz) / bb, 0.0, 1.0)
    return _n3(pax - h * bax, pay - h * bay, paz - h * baz) - r


def cylinder_c(px, py, pz, r):
    """Infinite cylinder along z."""
    return _n2(px, py) - r


def capped_cylinder_c(px, py, pz, r, h):
    dx = _n2(px, py) - r
    dy = jnp.abs(pz) - h
    return jnp.minimum(jnp.maximum(dx, dy), 0.0) + _n2(
        jnp.maximum(dx, 0.0), jnp.maximum(dy, 0.0)
    )


def rounded_cylinder_c(px, py, pz, ra, rb, h):
    dx = _n2(px, py) - 2.0 * ra + rb
    dy = jnp.abs(pz) - h
    return (
        jnp.minimum(jnp.maximum(dx, dy), 0.0)
        + _n2(jnp.maximum(dx, 0.0), jnp.maximum(dy, 0.0))
        - rb
    )


def capped_cone_c(px, py, pz, a, b, ra, rb):
    """Capped cone between points a (radius ra) and b (radius rb).

    (ref Shape.hpp:933-1000 CappedCone — note the reference returns
    s·sqrt(|d|)/|baba| with d already a squared distance; we reproduce that
    exact (unconventional) metric so parity holds.)"""
    ax, ay, az = (float(v) for v in a)
    bx, by, bz = (float(v) for v in b)
    rba = rb - ra
    bax, bay, baz = bx - ax, by - ay, bz - az
    baba = bax * bax + bay * bay + baz * baz
    pax, pay, paz = px - ax, py - ay, pz - az
    papa = pax * pax + pay * pay + paz * paz
    paba = (pax * bax + pay * bay + paz * baz) / baba
    x = jnp.sqrt(jnp.maximum(papa - paba * paba * baba, _EPS))
    cax = jnp.maximum(0.0, x - jnp.where(paba < 0.5, ra, rb))
    cay = jnp.abs(paba - 0.5) - 0.5
    k = rba * rba + baba
    f = jnp.clip((rba * (x - ra) + paba * baba) / k, 0.0, 1.0)
    cbx = x - ra - f * rba
    cby = paba - f
    s = jnp.where((cbx < 0.0) & (cay < 0.0), -1.0, 1.0)
    d = jnp.sqrt(
        jnp.minimum(cax * cax + cay * cay * baba, cbx * cbx + cby * cby * baba)
    )
    return s * jnp.sqrt(jnp.maximum(d, _EPS)) / baba


def rounded_cone_c(px, py, pz, r1, r2, h):
    """Round cone along +z from radius r1 at 0 to r2 at h
    (ref Shape.hpp:1002-1047 RoundedCone, which works in (‖xy‖, z))."""
    qx = _n2(px, py)
    qy = pz
    b = (r1 - r2) / h
    a = jnp.sqrt(jnp.maximum(1.0 - b * b, _EPS))
    k = -b * qx + a * qy
    c1 = _n2(qx, qy) - r1
    c2 = jnp.sqrt(qx * qx + (qy - h) ** 2 + _EPS) - r2
    c3 = (a * qx + b * qy) - r1
    return jnp.where(k < 0.0, c1, jnp.where(k > a * h, c2, c3))


def ellipsoid_c(px, py, pz, radii):
    rx, ry, rz = (float(r) for r in radii)
    k0 = _n3(px / rx, py / ry, pz / rz)
    k1 = _n3(px / (rx * rx), py / (ry * ry), pz / (rz * rz))
    return k0 * (k0 - 1.0) / jnp.maximum(k1, _EPS)


def plane_c(px, py, pz, n, d=0.0):
    nx, ny, nz = (float(v) for v in n)
    return px * nx + py * ny + pz * nz + d


def octahedron_c(px, py, pz, s):
    return (jnp.abs(px) + jnp.abs(py) + jnp.abs(pz) - s) * 0.57735027


def pyramid_c(px, py, pz, h):
    """Square pyramid, base side 1 on y=0 plane, apex height h (IQ exact)."""
    m2 = h * h + 0.25
    apx = jnp.abs(px)
    apz = jnp.abs(pz)
    swap = apz > apx
    px2 = jnp.where(swap, apz, apx) - 0.5
    pz2 = jnp.where(swap, apx, apz) - 0.5
    qx = pz2
    qy = h * py - 0.5 * px2
    qz = h * px2 + 0.5 * py
    s = jnp.maximum(-qx, 0.0)
    t = jnp.clip((qy - 0.5 * pz2) / (m2 + 0.25), 0.0, 1.0)
    a = m2 * (qx + s) ** 2 + qy * qy
    b = m2 * (qx + 0.5 * t) ** 2 + (qy - m2 * t) ** 2
    d2 = jnp.where(
        jnp.minimum(qy, -qx * m2 - qy * 0.5) > 0.0, 0.0, jnp.minimum(a, b)
    )
    return jnp.sqrt(jnp.maximum((d2 + qz * qz) / m2, _EPS)) * jnp.sign(
        jnp.maximum(qz, -py)
    )


def tetrahedron_c(px, py, pz, r):
    md = jnp.maximum(
        jnp.maximum(-px - py - pz, px + py - pz),
        jnp.maximum(-px + py + pz, px - py + pz),
    )
    return (md - r) / math.sqrt(3.0)


_PHI = (1 + math.sqrt(5.0)) / 2


def dodecahedron_c(px, py, pz, r):
    n0 = _PHI / math.sqrt(_PHI * _PHI + 1.0)
    n1 = 1.0 / math.sqrt(_PHI * _PHI + 1.0)
    qx, qy, qz = jnp.abs(px), jnp.abs(py), jnp.abs(pz)
    d = jnp.maximum(
        jnp.maximum(qx * n0 + qy * n1, qy * n0 + qz * n1), qz * n0 + qx * n1
    )
    return d - r * n0


def icosahedron_c(px, py, pz, r):
    n1 = 1.0 / math.sqrt(3.0)
    nn = math.sqrt((_PHI + 1.0) ** 2 + 1.0)
    n20, n21 = (_PHI + 1.0) / nn, 1.0 / nn
    qx, qy, qz = jnp.abs(px), jnp.abs(py), jnp.abs(pz)
    a = (qx + qy + qz) * n1
    b = jnp.maximum(
        jnp.maximum(qx * n20 + qy * n21, qy * n20 + qz * n21),
        qz * n20 + qx * n21,
    )
    return jnp.maximum(a, b) - r * n1


# -- classic (..., 3) API — thin wrappers over the component cores ----------

sphere = _aos(sphere_c)
point = _aos(point_c)
box = _aos(box_c)
rounded_box = _aos(rounded_box_c)
wireframe_box = _aos(wireframe_box_c)
torus = _aos(torus_c)
capped_torus = _aos(capped_torus_c)
capsule = _aos(capsule_c)
cylinder = _aos(cylinder_c)
capped_cylinder = _aos(capped_cylinder_c)
rounded_cylinder = _aos(rounded_cylinder_c)
capped_cone = _aos(capped_cone_c)
rounded_cone = _aos(rounded_cone_c)
ellipsoid = _aos(ellipsoid_c)
plane = _aos(plane_c)
octahedron = _aos(octahedron_c)
pyramid = _aos(pyramid_c)
tetrahedron = _aos(tetrahedron_c)
dodecahedron = _aos(dodecahedron_c)
icosahedron = _aos(icosahedron_c)
