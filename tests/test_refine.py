"""Projected-gradient refinement (ops.refine / tasks.base.refine_solutions).

The hybrid diffusion + local-search mode: decoded samples seed projected
gradient steps on the exact task objective.  Framework extension — the
reference's GD baseline (``baselines/GD.py``) uses objective gradients but
is never composed with the sampler.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsg_tpu.ops.decoders import msr_simplex_project
from diffsg_tpu.ops.objectives import msr_sum_rate, nu_rate
from diffsg_tpu.ops.refine import projected_refine
from diffsg_tpu.tasks import TASKS
from diffsg_tpu.tasks.base import refine_solutions


def _msr_setup(B=64, M=8, W=10.0, seed=0):
    rng = np.random.default_rng(seed)
    g = jnp.asarray(rng.uniform(0.1, 2.0, (B, M)), jnp.float32)
    # feasible but suboptimal start: uniform allocation with noise, projected
    p0 = msr_simplex_project(
        jnp.asarray(W / M + rng.normal(0, 0.3, (B, M)), jnp.float32), W)
    return g, p0


def test_refine_improves_and_stays_feasible_msr():
    W = 10.0
    g, p0 = _msr_setup(W=W)
    obj = lambda Y: msr_sum_rate(Y, g)
    proj = lambda Y: msr_simplex_project(Y, W)
    p = projected_refine(obj, proj, p0, iters=50, step=0.25)
    # feasibility: sum exactly W (fp tolerance), nonneg
    np.testing.assert_allclose(np.asarray(p.sum(axis=1)), W, rtol=1e-5)
    assert float(p.min()) >= -1e-6
    # monotone safeguard: every row at least as good as the start
    assert bool(jnp.all(obj(p) >= obj(p0) - 1e-6))
    # concave objective on the simplex: 50 steps should close most of the
    # gap to the exact waterfilling optimum
    from diffsg_tpu.baselines.waterfilling import waterfilling

    p_star = waterfilling(np.asarray(g), W)
    r_star = float(np.asarray(msr_sum_rate(jnp.asarray(p_star), g)).sum())
    r0 = float(np.asarray(obj(p0)).sum())
    r = float(np.asarray(obj(p)).sum())
    assert (r - r0) / (r_star - r0) > 0.9


def test_refine_never_degrades_at_optimum():
    """Starting AT the optimum, the safeguard keeps it (projection is the
    identity on feasible points and the best-so-far tracking keeps the
    best iterate even though later steps may wander)."""
    W = 10.0
    g, _ = _msr_setup(W=W)
    from diffsg_tpu.baselines.waterfilling import waterfilling

    p_star = jnp.asarray(waterfilling(np.asarray(g), W), jnp.float32)
    obj = lambda Y: msr_sum_rate(Y, g)
    p = projected_refine(obj, lambda Y: msr_simplex_project(Y, W),
                         p_star, iters=20, step=0.5)
    assert bool(jnp.all(obj(p) >= obj(p_star) - 1e-5))


def test_refine_iters_zero_is_identity():
    g, p0 = _msr_setup()
    p = projected_refine(lambda Y: msr_sum_rate(Y, g),
                         lambda Y: msr_simplex_project(Y, 10.0),
                         p0, iters=0, step=0.25)
    np.testing.assert_array_equal(np.asarray(p), np.asarray(p0))


def test_refine_solutions_nu_precond():
    """Task-level entry: NU mixed-units vector (meters + mW) improves under
    the preconditioned step and stays feasible."""
    task = TASKS["nu_direct"]
    config = {"width": 400.0, "height": 400.0, "P_sum": 18.0, "K": 3}
    rng = np.random.default_rng(1)
    B = 32
    X = jnp.asarray(rng.uniform(0, 400, (B, 6)), jnp.float32)
    xy0 = rng.uniform(0, 400, (B, 2))
    P0 = np.full((B, 3), 6.0)
    Y0 = jnp.asarray(np.concatenate([xy0, P0], axis=1), jnp.float32)

    Y = jax.jit(lambda Y, X: refine_solutions(task, Y, X, config, 40))(Y0, X)
    r0 = np.asarray(nu_rate(Y0, X))
    r = np.asarray(nu_rate(Y, X))
    assert (r >= r0 - 1e-6).all()
    # NU rates are tiny in these units (sigma^2=110): assert RELATIVE gain
    assert r.mean() > r0.mean() * 1.1        # actually moved, not a no-op
    Y = np.asarray(Y)
    assert (Y[:, :2] >= 0).all() and (Y[:, :2] <= 400).all()
    np.testing.assert_allclose(Y[:, 2:].sum(axis=1), 18.0, rtol=1e-5)
    assert Y[:, 2:].min() >= -1e-6


def test_refine_solutions_rejects_taskless_projection():
    task = TASKS["co_ranked"]
    with pytest.raises(ValueError, match="no feasibility projection"):
        refine_solutions(task, jnp.zeros((2, 3)), jnp.zeros((2, 9)),
                         {"N": 3}, 5)


def test_refine_msr_budget_per_row_W():
    """msr_budget projects each row onto its OWN budget simplex (trailing
    condition column)."""
    task = TASKS["msr_budget"]
    M = 3
    config = {"M": M, "scaler_min": 0.0, "scaler_max": 1.0, "w_ref": 10.0}
    rng = np.random.default_rng(2)
    B = 16
    W_rows = rng.uniform(5.0, 20.0, (B, 1)).astype(np.float32)
    g = rng.uniform(0.5, 2.0, (B, M)).astype(np.float32)
    X_unnorm = jnp.asarray(np.concatenate([g, W_rows], axis=1))
    Y0 = jnp.asarray(rng.uniform(0.1, 5.0, (B, M)), jnp.float32)
    Y = refine_solutions(task, Y0, X_unnorm, config, 30)
    np.testing.assert_allclose(np.asarray(Y).sum(axis=1), W_rows[:, 0],
                               rtol=1e-5)
