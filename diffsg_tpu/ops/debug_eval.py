"""Step-wise debug objective evaluators (``ddpm_opt/diffusion.py:86-127``).

Used by the legacy sampler's loss_record capability and by debug harnesses:
quick objective estimates of intermediate denoising states, including the
reference's hard-coded de-abnormal scaler constants for CO.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# Hard-coded inverse-scale constants of the reference's "new de-abnormal"
# CO dataset (``diffusion.py:96``).
CO_DEBUG_SCALER_MAX = 9.99927554792418
CO_DEBUG_SCALER_MIN = 0.0015867173453851023


def step_cost_calc(y0: jnp.ndarray, x0: jnp.ndarray,
                   lambda0: float = 1.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Debug CO objective (``diffusion.py:86-112``).

    Softmax-decodes y, thresholds the offload decision at 0.1, inverse-scales
    x with the hard-coded constants (note the reference's quirk: it adds
    ``+ max`` rather than ``+ min`` — reproduced), and returns
    (cost, decoded_y).
    """
    y = jax.nn.softmax(y0, axis=1) + 1e-5
    x = x0 * (CO_DEBUG_SCALER_MAX - CO_DEBUG_SCALER_MIN) + CO_DEBUG_SCALER_MAX
    D = (y > 0.1).astype(y.dtype)
    local = x[:, 0::3]
    transition = x[:, 1::3]
    execution = x[:, 2::3]
    cost = jnp.sum((1 - D) * local + D * (transition + execution / y), axis=1)
    return lambda0 * cost, y


def step_sum_rate(p0: jnp.ndarray, g0: jnp.ndarray,
                  W: float = 10.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Debug MSR objective (``diffusion.py:114-127``): scale powers by 10,
    renormalize rows to sum exactly W, return (rate, renormalized powers)."""
    p = p0 * 10.0
    p_sum = jnp.sum(p, axis=1, keepdims=True)
    p = p - p / p_sum * (p_sum - W)
    r = jnp.sum(jnp.log2(1.0 + p * g0[:, : p.shape[1]]), axis=1)
    return r, p
