"""Projected-gradient solution refinement: hybrid diffusion + local search.

A framework extension beyond the reference.  The reference ships a
standalone gradient-descent *baseline* (``baselines/GD.py``) but never
composes objective gradients with the generative sampler; here the decoded
sampler output seeds K steps of projected gradient ascent/descent on the
exact task objective (all objectives in ``ops.objectives`` are closed-form
jnp and hence differentiable), each step followed by the task's Euclidean
feasibility projection.  The whole refinement is one fused ``lax.fori_loop``
appended to the sampling program — no host round-trips.

Properties:
  * Per-row L2-normalized gradients: one step size works across objectives
    whose gradient magnitudes differ by orders of magnitude.
  * Per-row ADAPTIVE steps (grow on improvement, shrink on a failed step —
    failed steps are rejected) + a best-iterate safeguard: the returned
    solution is NEVER worse than the input under the task objective (all
    comparisons are on post-projection iterates, so feasibility is kept).
  * For concave-over-the-feasible-set objectives (MSR's sum-rate over the
    power simplex) this converges toward the true optimum; for nonconvex
    ones (NU's placement) it polishes the sampler's basin.

This is honest *hybrid* solving — it uses objective access, like the GD /
GEKKO baselines do — and is reported separately from pure single-draw rows.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def projected_refine(
    objective_fn: Callable[[jnp.ndarray], jnp.ndarray],
    project_fn: Callable[[jnp.ndarray], jnp.ndarray],
    Y0: jnp.ndarray,
    iters: int,
    step: float,
    grow: float = 1.3,
    shrink: float = 0.5,
    higher_is_better: bool = True,
    precond: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Refine feasible solutions ``Y0`` (B, D) by projected gradient steps.

    ``objective_fn(Y) -> (B,)`` per-row objective (row-separable, so the
    gradient of its sum is the batch of per-row gradients);
    ``project_fn(Y) -> Y`` Euclidean projection onto the feasible set
    (identity on feasible points).  ``step`` is the physical-units L2 length
    of each row's FIRST step; thereafter each row adapts its own step —
    an accepted (improving) step multiplies it by ``grow``, a rejected one
    by ``shrink`` (the iterate stays put on rejection).  This trust-region
    -style control reaches the boundary-supported optimum of concave
    objectives far faster than any fixed decay schedule.

    ``precond`` (D,) — or (B, D) for PER-ROW scales, e.g. mixed-geometry /
    mixed-budget NU batches — rescales the step per dimension for solution
    vectors that mix physical units (NU: UAV coordinates in meters next to
    powers in mW): the step is taken in ``z = Y / precond`` coordinates —
    normalized there, mapped back — so each dimension moves proportionally
    to its own scale.  ``None`` = plain L2 in physical units.

    Returns the best post-projection iterate per row (monotone safeguard:
    never worse than ``project_fn(Y0)``).
    """
    if iters <= 0:
        return Y0
    sign = 1.0 if higher_is_better else -1.0
    grad_fn = jax.grad(lambda Y: jnp.sum(objective_fn(Y)))
    if precond is None:
        s_vec = None
    else:
        s_vec = jnp.asarray(precond, Y0.dtype)
        if s_vec.ndim == 1:
            s_vec = s_vec[None, :]

    def body(_, carry):
        Y, s, st = carry
        g = grad_fn(Y)
        if s_vec is None:
            d = g / (jnp.linalg.norm(g, axis=1, keepdims=True) + 1e-12)
        else:
            gz = s_vec * g                                  # grad in z-coords
            d = s_vec * gz / (jnp.linalg.norm(gz, axis=1, keepdims=True) + 1e-12)
        Y_try = project_fn(Y + sign * st * d)
        s_try = objective_fn(Y_try)
        ok = (s_try > s) if higher_is_better else (s_try < s)
        Y = jnp.where(ok[:, None], Y_try, Y)
        s = jnp.where(ok, s_try, s)
        st = jnp.where(ok[:, None], st * grow, st * shrink)
        return Y, s, st

    Y0 = project_fn(Y0)
    s0 = objective_fn(Y0)
    st0 = jnp.full((Y0.shape[0], 1), step, Y0.dtype)
    Y, _, _ = jax.lax.fori_loop(0, iters, body, (Y0, s0, st0))
    return Y
