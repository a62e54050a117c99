"""Numerical-condition augmentation (the ``condition_C`` capability).

Each reference task defines a ``condition_C`` that appends the current
objective value of the (decoded) state to the condition vector — a designed
capability that is commented out in every shipped path
(``classifier_free_MSR.py:32-46``, ``_CO.py:34-52``, ``_NU.py:35-75``; the
``cdim`` config key exists in all loaders).  Provided here as an opt-in:
wrap a task's condition with :func:`augment_condition` before feeding the
denoiser (remember to build the UNet with ``cond_dim + 1``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def condition_c_msr(y: jnp.ndarray, x: jnp.ndarray, scaler_min: float,
                    scaler_max: float) -> jnp.ndarray:
    """Append total rate of the min-max+softmax-decoded y
    (``classifier_free_MSR.py:32-46``; the inverse-scaling quirk
    ``(x - min) * (max - min) + min`` is reproduced as written)."""
    y_norm = (y - jnp.min(y)) / (jnp.max(y) - jnp.min(y))
    y_norm = jax.nn.softmax(y_norm, axis=1)
    x_src = (x - scaler_min) * (scaler_max - scaler_min) + scaler_min
    total_rate = jnp.sum(jnp.log2(1 + x_src * y_norm), axis=1, keepdims=True)
    return jnp.concatenate([x, total_rate], axis=1)


def condition_c_co(y: jnp.ndarray, x: jnp.ndarray, scaler_min: float,
                   scaler_max: float) -> jnp.ndarray:
    """Append total cost / 10 of the softmax-decoded y
    (``classifier_free_CO.py:34-52``; same inverse-scaling quirk)."""
    y_norm = jax.nn.softmax(y, axis=1) + 1e-6
    D = (y_norm > 0.1).astype(y.dtype)
    x_src = (x - scaler_min) * (scaler_max - scaler_min) + scaler_min
    local = x_src[:, 0::3]
    transition = x_src[:, 1::3]
    execution = x_src[:, 2::3]
    cost = jnp.sum((1 - D) * local + D * (transition + execution / y_norm),
                   axis=1, keepdims=True) / 10.0
    return jnp.concatenate([x, cost], axis=1)


def condition_c_nu(y: jnp.ndarray, x: jnp.ndarray, width: float, height: float,
                   P_sum: float) -> jnp.ndarray:
    """Append the NOMA rate of the decoded y (``classifier_free_NU.py:35-75``).

    The reference's version decodes coords into a zeroed buffer and then
    softmaxes those zeros (a bug that yields uniform powers x P_sum); here
    the powers are decoded from y directly (the evident intent), and the
    user coordinates are used as given (the reference multiplies a zeroed
    copy by width/height — also evidently a bug).
    """
    from ..ops.decoders import nu_decode
    from ..ops.objectives import nu_rate

    dec = nu_decode(y, width, height, P_sum)
    rates = nu_rate(dec, x)[:, None]
    return jnp.concatenate([x, rates], axis=1)
