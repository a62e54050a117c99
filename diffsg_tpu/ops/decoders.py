"""Solution decoders: raw sampler output -> feasible solution space.

Each task decodes the unconstrained diffusion output into its constraint set
(simplex / box).  IMPORTANT batch-global semantics: the MSR and NU decoders
normalize by the min/max of the **whole batch tensor** (not per-row) —
reference ``classifier_free_MSR.py:239-245`` and ``classifier_free_NU.py:
267-276``.  This cross-sample coupling is part of the published method (it
interacts with the omega=500 guidance scale) and is reproduced exactly; it
also means decoding must happen over the same batch grouping as the
reference eval (batch 512) for bit-level parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def msr_decode(Y: jnp.ndarray) -> jnp.ndarray:
    """Batch-global min-max, then per-row softmax (``classifier_free_MSR.py:239-245``).

    Final powers are ``W * msr_decode(Y)`` (applied by the task harness).
    """
    Yn = (Y - jnp.min(Y)) / (jnp.max(Y) - jnp.min(Y))
    return jax.nn.softmax(Yn, axis=1)


def co_decode(Y: jnp.ndarray) -> jnp.ndarray:
    """Per-row softmax; rows that are entirely < -10 decode to all-zero
    (the "process everything locally" sentinel) — ``classifier_free_CO.py:281-290``."""
    dec = jax.nn.softmax(Y, axis=1)
    all_local = jnp.all(Y < -10.0, axis=1, keepdims=True)
    return jnp.where(all_local, 0.0, dec)


def nu_decode(Y: jnp.ndarray, width: float, height: float, P_sum: float) -> jnp.ndarray:
    """UAV coords: min-max over the whole (B, 2) coordinate slice, scaled to
    the area; powers: per-row softmax * P_sum (``classifier_free_NU.py:267-276``)."""
    xy = Y[:, :2]
    xy = (xy - jnp.min(xy)) / (jnp.max(xy) - jnp.min(xy))
    xy = xy * jnp.asarray([width, height], dtype=Y.dtype)[None, :]
    P = jax.nn.softmax(Y[:, 2:], axis=1) * P_sum
    return jnp.concatenate([xy, P], axis=1)
