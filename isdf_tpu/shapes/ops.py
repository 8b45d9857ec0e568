"""CSG combinators over SDF functions.

Mirrors the reference's CSG operator library
(ref: src/utils/include/utils/Shape.hpp:1684-2317 — translate/scale/rotate/
rotate_to/union/difference/intersection (smooth-k)/twist/bend/blend/negate/
dilate/erode/shell composed per-query via std::function closures).  Here an
"SDF" is any callable ``p (...,3) → (...)``; combinators return new
callables.  Closures trace into one fused XLA computation — there is no
per-query virtual dispatch.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

SDF = Callable[..., jnp.ndarray]


# -- rigid / similarity transforms ------------------------------------------
def translate(f: SDF, offset) -> SDF:
    offset = jnp.asarray(offset)
    return lambda p: f(p - offset)


def scale(f: SDF, factor: float) -> SDF:
    return lambda p: f(p / factor) * factor


def rotate(f: SDF, R) -> SDF:
    """Rotate the *shape* by R (query is pulled back by Rᵀ)."""
    R = jnp.asarray(R)
    return lambda p: f(jnp.einsum("ji,...j->...i", R, p))


def transformed(f: SDF, R, t) -> SDF:
    """Shape posed at rotation R, translation t."""
    R, t = jnp.asarray(R), jnp.asarray(t)
    return lambda p: f(jnp.einsum("ji,...j->...i", R, p - t))


# -- booleans ----------------------------------------------------------------
def union(*fs: SDF) -> SDF:
    def g(p):
        d = jnp.stack([f(p) for f in fs], axis=-1)
        return jnp.min(d, axis=-1)

    return g


def intersection(*fs: SDF) -> SDF:
    def g(p):
        d = jnp.stack([f(p) for f in fs], axis=-1)
        return jnp.max(d, axis=-1)

    return g


def difference(f: SDF, g: SDF) -> SDF:
    return lambda p: jnp.maximum(f(p), -g(p))


def _smooth_pair(d1, d2, k, mode: str):
    """Polynomial smooth boolean blend (the reference's h/m formulation,
    Shape.hpp SmoothDifference/SmoothIntersection and CSG k-operators)."""
    if mode == "union":
        h = jnp.clip(0.5 + 0.5 * (d2 - d1) / k, 0.0, 1.0)
        m = d2 + (d1 - d2) * h
        return m - k * h * (1.0 - h)
    if mode == "intersection":
        h = jnp.clip(0.5 - 0.5 * (d2 - d1) / k, 0.0, 1.0)
        m = d2 + (d1 - d2) * h
        return m + k * h * (1.0 - h)
    if mode == "difference":
        h = jnp.clip(0.5 - 0.5 * (d2 + d1) / k, 0.0, 1.0)
        m = d1 - (d1 + d2) * h
        return m + k * h * (1.0 - h)
    raise ValueError(mode)


def smooth_union(f: SDF, g: SDF, k: float = 0.25) -> SDF:
    return lambda p: _smooth_pair(f(p), g(p), k, "union")


def smooth_intersection(f: SDF, g: SDF, k: float = 0.25) -> SDF:
    return lambda p: _smooth_pair(f(p), g(p), k, "intersection")


def smooth_difference(f: SDF, g: SDF, k: float = 0.25) -> SDF:
    return lambda p: _smooth_pair(f(p), g(p), k, "difference")


def blend(f: SDF, g: SDF, t: float = 0.5) -> SDF:
    return lambda p: (1.0 - t) * f(p) + t * g(p)


# -- unary modifiers ---------------------------------------------------------
def negate(f: SDF) -> SDF:
    return lambda p: -f(p)


def dilate(f: SDF, r: float) -> SDF:
    return lambda p: f(p) - r


def erode(f: SDF, r: float) -> SDF:
    return lambda p: f(p) + r


def shell(f: SDF, thickness: float) -> SDF:
    return lambda p: jnp.abs(f(p)) - thickness


# -- domain warps ------------------------------------------------------------
def twist(f: SDF, k: float) -> SDF:
    """Twist about z: rotate the xy slice by k·z before querying
    (ref Shape.hpp:1236-1288 TwistBox)."""

    def g(p):
        x, y, z = p[..., 0], p[..., 1], p[..., 2]
        c, s = jnp.cos(k * z), jnp.sin(k * z)
        q = jnp.stack([c * x - s * y, s * x + c * y, z], axis=-1)
        return f(q)

    return g


def bend(f: SDF, k: float) -> SDF:
    """Bend: rotate the xy slice by k·x (ref Shape.hpp:1290-1342 BendBox)."""

    def g(p):
        x, y, z = p[..., 0], p[..., 1], p[..., 2]
        c, s = jnp.cos(k * x), jnp.sin(k * x)
        q = jnp.stack([c * x - s * y, s * x + c * y, z], axis=-1)
        return f(q)

    return g


def bend_linear(f: SDF, p0, p1, v, ease=None) -> SDF:
    """Linear bend: displace by easing(v) along the p0→p1 parameter
    (ref Shape.hpp:1105-1234 BendLinear: query f(ease(t)·v + p))."""
    p0, p1, v = jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(v)
    ab = p1 - p0

    if ease is None:
        def ease(t):  # in_out_quad easing, ref Shape.hpp:1112-1118
            u = 2 * t - 1
            return jnp.where(t < 0.5, 2 * t * t, -0.5 * (u * (u - 2) - 1))

    def g(p):
        t = jnp.clip(
            jnp.sum((p - p0) * ab, axis=-1) / jnp.sum(ab * ab), 0.0, 1.0
        )
        return f(ease(t)[..., None] * v + p)

    return g


# ===========================================================================
# Component-form combinators (the TPU hot-path representation)
#
# An "SDF3" is a callable ``(px, py, pz) → d`` over broadcasting component
# arrays.  On TPU the point dimension stays in the vector lanes through the
# whole CSG tree (the (..., 3) AoS layout runs at 3/128 lane efficiency —
# BASELINE.md "sweep kernel measurements").  These mirror the AoS
# combinators above 1:1; shapes/zoo.py composes with these and derives the
# AoS API by slicing once at the boundary.
# ===========================================================================

SDF3 = Callable[..., jnp.ndarray]


def translate3(f: SDF3, offset) -> SDF3:
    ox, oy, oz = (float(v) for v in offset)
    return lambda x, y, z: f(x - ox, y - oy, z - oz)


def scale3(f: SDF3, factor: float) -> SDF3:
    k = float(factor)
    return lambda x, y, z: f(x / k, y / k, z / k) * k


def rotate3(f: SDF3, R) -> SDF3:
    """Rotate the *shape* by R (query is pulled back by Rᵀ)."""
    import numpy as _np

    R = _np.asarray(R, dtype=_np.float64)
    return lambda x, y, z: f(
        R[0, 0] * x + R[1, 0] * y + R[2, 0] * z,
        R[0, 1] * x + R[1, 1] * y + R[2, 1] * z,
        R[0, 2] * x + R[1, 2] * y + R[2, 2] * z,
    )


def transformed3(f: SDF3, R, t) -> SDF3:
    """Shape posed at rotation R, translation t."""
    import numpy as _np

    R = _np.asarray(R, dtype=_np.float64)
    tx, ty, tz = (float(v) for v in _np.asarray(t))
    return lambda x, y, z: f(
        R[0, 0] * (x - tx) + R[1, 0] * (y - ty) + R[2, 0] * (z - tz),
        R[0, 1] * (x - tx) + R[1, 1] * (y - ty) + R[2, 1] * (z - tz),
        R[0, 2] * (x - tx) + R[1, 2] * (y - ty) + R[2, 2] * (z - tz),
    )


def union3(*fs: SDF3) -> SDF3:
    def g(x, y, z):
        d = fs[0](x, y, z)
        for f in fs[1:]:
            d = jnp.minimum(d, f(x, y, z))
        return d

    return g


def intersection3(*fs: SDF3) -> SDF3:
    def g(x, y, z):
        d = fs[0](x, y, z)
        for f in fs[1:]:
            d = jnp.maximum(d, f(x, y, z))
        return d

    return g


def difference3(f: SDF3, g: SDF3) -> SDF3:
    return lambda x, y, z: jnp.maximum(f(x, y, z), -g(x, y, z))


def smooth_union3(f: SDF3, g: SDF3, k: float = 0.25) -> SDF3:
    return lambda x, y, z: _smooth_pair(f(x, y, z), g(x, y, z), k, "union")


def smooth_intersection3(f: SDF3, g: SDF3, k: float = 0.25) -> SDF3:
    return lambda x, y, z: _smooth_pair(
        f(x, y, z), g(x, y, z), k, "intersection"
    )


def smooth_difference3(f: SDF3, g: SDF3, k: float = 0.25) -> SDF3:
    return lambda x, y, z: _smooth_pair(
        f(x, y, z), g(x, y, z), k, "difference"
    )


def blend3(f: SDF3, g: SDF3, t: float = 0.5) -> SDF3:
    return lambda x, y, z: (1.0 - t) * f(x, y, z) + t * g(x, y, z)


def negate3(f: SDF3) -> SDF3:
    return lambda x, y, z: -f(x, y, z)


def dilate3(f: SDF3, r: float) -> SDF3:
    return lambda x, y, z: f(x, y, z) - r


def erode3(f: SDF3, r: float) -> SDF3:
    return lambda x, y, z: f(x, y, z) + r


def shell3(f: SDF3, thickness: float) -> SDF3:
    return lambda x, y, z: jnp.abs(f(x, y, z)) - thickness


def twist3(f: SDF3, k: float) -> SDF3:
    """Twist about z (ref Shape.hpp:1236-1288 TwistBox)."""

    def g(x, y, z):
        c, s = jnp.cos(k * z), jnp.sin(k * z)
        return f(c * x - s * y, s * x + c * y, z)

    return g


def bend3(f: SDF3, k: float) -> SDF3:
    """Bend: rotate the xy slice by k·x (ref Shape.hpp:1290-1342 BendBox)."""

    def g(x, y, z):
        c, s = jnp.cos(k * x), jnp.sin(k * x)
        return f(c * x - s * y, s * x + c * y, z)

    return g


def bend_linear3(f: SDF3, p0, p1, v, ease=None) -> SDF3:
    """Linear bend (ref Shape.hpp:1105-1234 BendLinear)."""
    import numpy as _np

    p0 = _np.asarray(p0, dtype=_np.float64)
    ab = _np.asarray(p1, dtype=_np.float64) - p0
    vx, vy, vz = (float(c) for c in _np.asarray(v))
    ab2 = float(ab @ ab)

    if ease is None:
        def ease(t):  # in_out_quad easing, ref Shape.hpp:1112-1118
            u = 2 * t - 1
            return jnp.where(t < 0.5, 2 * t * t, -0.5 * (u * (u - 2) - 1))

    def g(x, y, z):
        t = jnp.clip(
            ((x - p0[0]) * ab[0] + (y - p0[1]) * ab[1] + (z - p0[2]) * ab[2])
            / ab2,
            0.0,
            1.0,
        )
        e = ease(t)
        return f(e * vx + x, e * vy + y, e * vz + z)

    return g


def aos(f3: SDF3) -> SDF:
    """Component-form SDF → classic (..., 3) API (one slice at the root)."""
    return lambda p: f3(p[..., 0], p[..., 1], p[..., 2])
