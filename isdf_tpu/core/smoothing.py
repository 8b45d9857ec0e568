"""Smoothed penalty hinge functions (JAX, autodiff-safe).

Re-derivation of the reference's ``smoothedL1`` / ``cubic``
(ref: back_end_optimizer.hpp:332-356, 752-763).  Values match exactly;
derivatives come from autodiff, with the branch structure written so no NaN
leaks through ``jnp.where`` (both branches evaluate finitely everywhere).
"""

from __future__ import annotations

import jax.numpy as jnp


def smoothed_l1(x, mu):
    """C¹ hinge: 0 for x≤0, cubic blend on (0, μ), linear x − μ/2 beyond.

    Returns f(x) only; use jax.grad for df (the reference returns both).
    """
    xc = jnp.clip(x, 0.0, mu)
    xdmu = xc / mu
    blend = (mu - 0.5 * xc) * xdmu * xdmu * xdmu
    return jnp.where(x <= 0.0, 0.0, jnp.where(x >= mu, x - 0.5 * mu, blend))


def cubic_hinge(x):
    """x³ for x>0 else 0 (ref cubic(), mid-end waypoint attraction)."""
    xp = jnp.maximum(x, 0.0)
    return xp * xp * xp
