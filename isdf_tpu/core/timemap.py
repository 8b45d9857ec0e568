"""The τ ↔ T diffeomorphism for unconstrained time optimization.

Re-derivation of the reference's forwardT/backwardT/backwardGradT
(ref: back_end_optimizer.hpp:214-305): maps unconstrained τ ∈ ℝ to a strictly
positive duration T, C¹, with T(0) = 1.

  T(τ) = 0.5 τ² + τ + 1            (τ > 0)
  T(τ) = 1 / (0.5 τ² − τ + 1)      (τ ≤ 0)

Gradients through the map come from autodiff (deleting backwardGradT).
"""

from __future__ import annotations

import jax.numpy as jnp


def tau_to_T(tau):
    pos = (0.5 * tau + 1.0) * tau + 1.0
    neg = 1.0 / ((0.5 * tau - 1.0) * tau + 1.0)
    return jnp.where(tau > 0.0, pos, neg)


def T_to_tau(T):
    upper = jnp.sqrt(jnp.maximum(2.0 * T - 1.0, 0.0)) - 1.0
    lower = 1.0 - jnp.sqrt(jnp.maximum(2.0 / jnp.maximum(T, 1e-12) - 1.0, 0.0))
    return jnp.where(T > 1.0, upper, lower)
