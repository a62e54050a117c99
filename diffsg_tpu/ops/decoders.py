"""Solution decoders: raw sampler output -> feasible solution space.

Each task decodes the unconstrained diffusion output into its constraint set
(simplex / box).  IMPORTANT batch-global semantics: the MSR and NU decoders
normalize by the min/max of the **whole batch tensor** (not per-row) —
reference ``classifier_free_MSR.py:239-245`` and ``classifier_free_NU.py:
267-276``.  This cross-sample coupling is part of the published method (it
interacts with the omega=500 guidance scale) and is reproduced exactly; it
also means decoding must happen over the same batch grouping as the
reference eval (batch 512) for bit-level parity.

``valid_mask`` (B, 1, 1.0 real / 0.0 pad) restricts the global reductions to
real rows, so serving's bucket padding cannot shift results at bucket
boundaries.  ``None`` (the default) is the exact legacy whole-tensor path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def masked_min_max(Y: jnp.ndarray, valid_mask: jnp.ndarray):
    """Global min/max over rows where ``valid_mask`` > 0."""
    big = jnp.asarray(jnp.finfo(Y.dtype).max, Y.dtype)
    keep = valid_mask > 0
    mn = jnp.min(jnp.where(keep, Y, big))
    mx = jnp.max(jnp.where(keep, Y, -big))
    return mn, mx


def msr_decode(Y: jnp.ndarray,
               valid_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Batch-global min-max, then per-row softmax (``classifier_free_MSR.py:239-245``).

    Final powers are ``W * msr_decode(Y)`` (applied by the task harness).
    """
    if valid_mask is None:
        mn, mx = jnp.min(Y), jnp.max(Y)
    else:
        mn, mx = masked_min_max(Y, valid_mask)
    Yn = (Y - mn) / (mx - mn)
    return jax.nn.softmax(Yn, axis=1)


def msr_simplex_project(Y: jnp.ndarray, W: float) -> jnp.ndarray:
    """Euclidean projection of each row onto {p >= 0, sum p = W}.

    A feasibility decoder for waterfilling-labeled MSR training: the
    projection is the identity on any feasible label (true waterfilling
    allocations project to themselves), unlike the softmax decoder whose
    strictly-positive outputs can never reproduce the optimum's exact
    zeros.  Standard sort-based algorithm (Held et al. 1974), vectorized:
    tau = (cumsum of the k largest - W)/k for the largest valid k.
    """
    D = Y.shape[1]
    s = jnp.sort(Y, axis=1)[:, ::-1]                       # descending
    csum = jnp.cumsum(s, axis=1)
    k = jnp.arange(1, D + 1, dtype=Y.dtype)[None, :]
    tau_k = (csum - W) / k
    valid = s > tau_k                                       # rho = max valid k
    rho = jnp.sum(valid.astype(jnp.int32), axis=1) - 1
    tau = jnp.take_along_axis(tau_k, rho[:, None], axis=1)
    return jnp.maximum(Y - tau, 0.0)


def co_decode(Y: jnp.ndarray) -> jnp.ndarray:
    """Per-row softmax; rows that are entirely < -10 decode to all-zero
    (the "process everything locally" sentinel) — ``classifier_free_CO.py:281-290``."""
    dec = jax.nn.softmax(Y, axis=1)
    all_local = jnp.all(Y < -10.0, axis=1, keepdims=True)
    return jnp.where(all_local, 0.0, dec)


def nu_direct_decode(Y: jnp.ndarray, width: float, height: float,
                     P_sum: float, y_scale: float = 1.0,
                     y_shift=0.0) -> jnp.ndarray:
    """Per-row feasibility decode for scale-normalized NU training.

    The label layout is (x/w, y/h, p/P_sum) scaled by ``y_scale`` at train
    time; decoding unscales, clips the UAV position into the area box and
    Euclidean-projects the power split onto the unit simplex (identity on
    feasible labels, unlike the batch-global min-max + softmax of
    :func:`nu_decode`).  Strictly per-row: safe under serving bucket padding
    with no mask needed.  Measured (ckpts/ddpm_nu_3u_aug_s8, omega=1):
    less ratio 0.9918 in-dist / 0.9883 OOD vs the oracle labels — vs
    0.9071/0.9058 for the best round-1 ckpts through ``nu_decode``.

    ``y_shift`` (scalar or per-dim (D,)) inverts centered training:
    targets were ``y_scale * (labels - y_shift)``.
    """
    yd = Y / y_scale + jnp.asarray(y_shift, Y.dtype)
    xy = jnp.clip(yd[:, :2], 0.0, 1.0) \
        * jnp.asarray([width, height], dtype=Y.dtype)[None, :]
    P = msr_simplex_project(yd[:, 2:], 1.0) * P_sum
    return jnp.concatenate([xy, P], axis=1)


def nu_decode(Y: jnp.ndarray, width: float, height: float, P_sum: float,
              valid_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """UAV coords: min-max over the whole (B, 2) coordinate slice, scaled to
    the area; powers: per-row softmax * P_sum (``classifier_free_NU.py:267-276``)."""
    xy = Y[:, :2]
    if valid_mask is None:
        mn, mx = jnp.min(xy), jnp.max(xy)
    else:
        mn, mx = masked_min_max(xy, valid_mask)
    xy = (xy - mn) / (mx - mn)
    xy = xy * jnp.asarray([width, height], dtype=Y.dtype)[None, :]
    P = jax.nn.softmax(Y[:, 2:], axis=1) * P_sum
    return jnp.concatenate([xy, P], axis=1)
