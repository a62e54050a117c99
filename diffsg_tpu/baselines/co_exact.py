"""Exact continuous CO oracle + analytic-allocation decode.

For a fixed offload decision D, the CO cost
``sum_i (1-D_i) local_i + D_i (trans_i + exec_i / y_i)``  s.t.
``sum_{i in D} y_i = 1, y >= 0`` is minimized in closed form:
``y_i = sqrt(exec_i) / sum_{j in D} sqrt(exec_j)`` (Cauchy-Schwarz /
Lagrange).  Enumerating all 2^N decisions with the closed-form allocation
gives the **exact continuous optimum** — the dataset oracle's 0.02-step
allocation grid is a discretization of this (the reference solves it by
exhaustive grid search, ``dataset_generate.py:147-245``; GEKKO by MINLP at
~9 s/sample).  For N=3 this is 8 closed-form evaluations per sample,
vectorized over the batch.

Also provides :func:`co_analytic_decode`: keep the diffusion sampler's
offload *decision* (its learned discrete structure) but replace the
continuous allocation with the closed-form optimum for that decision — the
CO analog of MSR's feasibility-projecting decoder, exploiting the same
objective access the GD/GEKKO baselines use.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.decoders import co_decode


def co_optimal_allocation(execution: jnp.ndarray, D: jnp.ndarray) -> jnp.ndarray:
    """Closed-form optimal shares for decision D.  execution, D: (B, N)."""
    w = jnp.sqrt(execution) * D
    denom = jnp.sum(w, axis=1, keepdims=True)
    return jnp.where(D > 0, w / jnp.maximum(denom, 1e-30), 0.0)


@jax.jit
def co_exact_solve(X_unnorm: jnp.ndarray) -> jnp.ndarray:
    """Exact continuous optimum over all 2^N decisions.  X: (B, 3N) derived
    features; returns optimal shares (B, N) (zeros row = all-local)."""
    B, three_n = X_unnorm.shape
    N = three_n // 3
    local = X_unnorm[:, 0::3]
    trans = X_unnorm[:, 1::3]
    execution = X_unnorm[:, 2::3]

    best_cost = jnp.sum(local, axis=1)          # decision id 0: all local
    best_Y = jnp.zeros((B, N), X_unnorm.dtype)
    for did in range(1, 2**N):
        D = jnp.asarray([(did >> j) & 1 for j in range(N)], X_unnorm.dtype)[None, :]
        Y = co_optimal_allocation(execution, jnp.broadcast_to(D, (B, N)))
        cost = jnp.sum((1 - D) * local
                       + D * (trans + execution / jnp.maximum(Y, 1e-30)), axis=1)
        better = cost < best_cost
        best_cost = jnp.where(better, cost, best_cost)
        best_Y = jnp.where(better[:, None], Y, best_Y)
    return best_Y


def co_soft_cost(Y_raw: jnp.ndarray, X_unnorm: jnp.ndarray,
                 tau: float = 0.05, threshold: float = 0.1,
                 logit_temp: float = 3.0) -> jnp.ndarray:
    """Differentiable relaxation of the CO cost at the analytic optimum.

    For a hard decision D with the closed-form allocation
    ``y_i = D_i sqrt(exec_i) / S``, ``S = sum_j D_j sqrt(exec_j)``, the cost
    collapses to ``sum_i (1-D_i) local_i + D_i trans_i + S**2`` (the
    ``exec_i / y_i`` terms telescope) — smooth in D with no division, so a
    sigmoid relaxation of the decision gives a well-behaved gradient
    everywhere.  Decision semantics follow :func:`co_analytic_decode`
    (``D = softmax(Y) > threshold``), but the logits are row-standardized
    to ``logit_temp`` scale first: high-guidance sampling drives |Y| to
    O(100-1000) where the raw softmax saturates one-hot and the gradient
    is exactly 0 (measured) — the decode only reads the row's *ordering*,
    and standardization makes the relaxation sensitive to it at any raw
    scale.  Used as the sampler's ``guidance_fn``
    (diffusion.ddpm.cfg_sample objective guidance).  Returns (B,) costs.
    """
    z = Y_raw - jnp.mean(Y_raw, axis=1, keepdims=True)
    z = z / (jnp.std(z, axis=1, keepdims=True) + 1e-6) * logit_temp
    s = jax.nn.softmax(z, axis=1)
    D = jax.nn.sigmoid((s - threshold) / tau)
    local = X_unnorm[:, 0::3]
    trans = X_unnorm[:, 1::3]
    execution = X_unnorm[:, 2::3]
    S = jnp.sum(D * jnp.sqrt(execution), axis=1)
    return jnp.sum((1.0 - D) * local + D * trans, axis=1) + S**2


@jax.jit
def co_ranked_decode(Y_raw: jnp.ndarray, X_unnorm: jnp.ndarray) -> jnp.ndarray:
    """Ranked-decision decode: the sampler's per-row node ORDERING selects
    which of the N+1 nested top-k offload sets to use; each is costed with
    the closed-form allocation and the cheapest wins.

    Motivation (measured, docs/RESULTS.md round 3): at the reference's high
    guidance scales the sampled state has magnitude O(100-1000), so the
    softmax decode saturates one-hot and ~98% of draws decode to exactly one
    offloaded node — while ~18% of oracle decisions offload 0, 2, or 3
    nodes.  That saturation caps single-draw decision accuracy at ~0.79 no
    matter how good the sample is, and gradient (objective-guidance) nudges
    cannot cross it.  The row's *ordering*, however, survives saturation —
    decoding along it recovers the multi-node decisions: single-draw
    exceeded ratio 1.0036 at omega=5000 vs 1.025 for the analytic decode
    on the same draws.

    Objective access: N+1 closed-form cost evaluations per row — the same
    access class as :func:`co_analytic_decode` (1 eval), the GD baseline
    (hundreds), and best-of-N selection; the generative model contributes
    the ranking.  Strictly per-row: safe under serving bucket padding.
    """
    B, n = Y_raw.shape
    order = jnp.argsort(-Y_raw, axis=1)
    local = X_unnorm[:, 0::3]
    trans = X_unnorm[:, 1::3]
    execution = X_unnorm[:, 2::3]
    best_cost = jnp.sum(local, axis=1)            # k=0: all local
    best_Y = jnp.zeros_like(Y_raw)
    rows = jnp.arange(B)[:, None]
    for k in range(1, n + 1):
        D = jnp.zeros_like(Y_raw).at[rows, order[:, :k]].set(1.0)
        Y = co_optimal_allocation(execution, D)
        cost = jnp.sum((1 - D) * local
                       + D * (trans + execution / jnp.maximum(Y, 1e-30)),
                       axis=1)
        better = cost < best_cost
        best_cost = jnp.where(better, cost, best_cost)
        best_Y = jnp.where(better[:, None], Y, best_Y)
    return best_Y


def co_direct_decode(Y_raw: jnp.ndarray, X_unnorm: jnp.ndarray,
                     y_scale: float = 1.0, y_shift: float = 0.0,
                     threshold: float = 0.1) -> jnp.ndarray:
    """Decision read directly off the (unscaled) sample, allocation closed-form.

    For scale-normalized CO training (``--y-scale``): the training targets are
    the allocation shares themselves — exact zeros on non-offloaded nodes, and
    shares summing to 1 over offloaded ones — so thresholding the unscaled
    sample recovers the label's offload decision on the shipped data
    distribution (measured min nonzero share 0.18 across the 50k oracle
    labels, comfortably above the 0.1 threshold; a pathological instance
    with an optimal share < 0.1 would decode that node as local).
    :func:`co_analytic_decode`'s softmax step instead erases the
    magnitude information (softmax of a zeros row is uniform, never zero).
    Strictly per-row: safe under serving bucket padding with no mask.
    All-zero decisions decode to the zeros row (= the reference's
    "process everything locally" sentinel, ``classifier_free_CO.py:281-290``).
    """
    # inverse of train-time (y - shift) * scale; asarray accepts scalar or
    # per-dim (N,) shifts alike (tasks/co.py feeds config['y_shift'] verbatim)
    yd = Y_raw / y_scale + jnp.asarray(y_shift, Y_raw.dtype)
    D = (yd > threshold).astype(Y_raw.dtype)
    execution = X_unnorm[:, 2::3]
    return co_optimal_allocation(execution, D)


@jax.jit
def co_analytic_decode(Y_raw: jnp.ndarray, X_unnorm: jnp.ndarray,
                       threshold: float = 0.1) -> jnp.ndarray:
    """Decision from the sampler, allocation from the closed form.

    Y_raw: raw sampler output (B, N); X_unnorm: (B, 3N) derived features.
    Falls back to all-local (zeros) when the standard decoder does.
    """
    dec = co_decode(Y_raw)
    D = (dec > threshold).astype(Y_raw.dtype)
    execution = X_unnorm[:, 2::3]
    Y = co_optimal_allocation(execution, D)
    all_local = jnp.all(dec == 0.0, axis=1, keepdims=True)
    return jnp.where(all_local, 0.0, Y)
