"""Legacy sampler / loss-zoo / debug-evaluator / condition_C tests."""

import numpy as np
import jax
import jax.numpy as jnp

from diffsg_tpu.diffusion import cosine_schedule
from diffsg_tpu.diffusion.legacy import dirichlet_noise, legacy_denoise_step, legacy_sample
from diffsg_tpu.ops.debug_eval import step_cost_calc, step_sum_rate
from diffsg_tpu.ops import losses
from diffsg_tpu.tasks.condition import condition_c_msr, condition_c_co, condition_c_nu


def test_dirichlet_noise_sums():
    key = jax.random.PRNGKey(0)
    n = dirichlet_noise(key, (16, 5), target_sum=0.0, alpha=3.0)
    np.testing.assert_allclose(np.asarray(n).sum(1), 0.0, atol=1e-6)
    assert (np.asarray(n) < 0).any()  # negatives allowed
    n2 = dirichlet_noise(key, (16, 5), target_sum=1.0, enable_neg=False)
    np.testing.assert_allclose(np.asarray(n2).sum(1), 1.0, atol=1e-6)
    assert (np.asarray(n2) >= 0).all()


def test_legacy_denoise_step_msr_clamp():
    sched = cosine_schedule(20)
    y = jnp.asarray([[5.0, -5.0, 0.5]])
    eps = jnp.zeros_like(y)
    z = jnp.zeros_like(y)
    out = legacy_denoise_step(sched, y, eps, 10, z, task="MAX SUM RATE")
    o = np.asarray(out)
    assert o.max() <= 1.0 and o.min() >= 0.00001 - 1e-9


def test_legacy_sample_runs():
    sched = cosine_schedule(10)

    def apply_fn(params, y, t, cond):
        return 0.1 * y  # dummy denoiser

    y0, recs = legacy_sample(apply_fn, None, sched,
                             jnp.ones((8, 3)), 3, jax.random.PRNGKey(0),
                             record_objective=lambda y: jnp.sum(y))
    assert y0.shape == (8, 3)
    assert len(recs) == 10
    o = np.asarray(y0)
    assert o.min() >= 0.0 and o.max() <= 1.0  # per-step min-max renorm


def test_debug_evaluators():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(0, 1, (8, 3)), jnp.float32)
    x = jnp.asarray(rng.uniform(0, 1, (8, 9)), jnp.float32)
    cost, dec = step_cost_calc(y, x)
    assert cost.shape == (8,) and bool(jnp.all(jnp.isfinite(cost)))
    np.testing.assert_allclose(np.asarray(dec).sum(1), 1.0 + 3e-5, atol=1e-4)

    p = jnp.asarray(rng.uniform(0.1, 1, (8, 3)), jnp.float32)
    g = jnp.asarray(rng.uniform(0.5, 2.5, (8, 4)), jnp.float32)
    r, p_fixed = step_sum_rate(p, g)
    np.testing.assert_allclose(np.asarray(p_fixed).sum(1), 10.0, rtol=1e-5)


def test_loss_zoo_finite():
    rng = np.random.default_rng(0)
    yp = jnp.asarray(rng.uniform(0, 1, (16, 3)), jnp.float32)
    yt = jnp.asarray(rng.uniform(0, 1, (16, 3)), jnp.float32)
    assert np.isfinite(float(losses.class_loss(yp, yt)))
    assert np.isfinite(float(losses.custom_loss(yt, yp)))
    assert np.isfinite(float(losses.vae_loss(yt, yp, yp * 0.1, yp * 0.01, 0.5)))
    x = jnp.asarray(rng.uniform(0.1, 1, (16, 9)), jnp.float32)
    assert np.isfinite(float(losses.convention_co_opt_loss(yp, x)))
    g = jnp.asarray(rng.uniform(0.5, 2.5, (16, 4)), jnp.float32)
    assert np.isfinite(float(losses.sum_rate_loss(yp, g)))


def test_condition_c_shapes():
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(0, 1, (8, 3)), jnp.float32)
    x = jnp.asarray(rng.uniform(0, 1, (8, 3)), jnp.float32)
    assert condition_c_msr(y, x, 0.5, 2.5).shape == (8, 4)
    x9 = jnp.asarray(rng.uniform(0, 1, (8, 9)), jnp.float32)
    assert condition_c_co(y, x9, 0.0, 10.0).shape == (8, 10)
    y5 = jnp.asarray(rng.normal(0, 1, (8, 5)), jnp.float32)
    x6 = jnp.asarray(rng.uniform(0, 400, (8, 6)), jnp.float32)
    assert condition_c_nu(y5, x6, 400, 400, 18.0).shape == (8, 7)


def test_condition_c_training_path():
    """The cdim capability end-to-end: train a tiny CFG-DDPM whose condition
    is augmented with the numerical objective (condition_C), as the
    reference's commented-out path intended (classifier_free_MSR.py:105)."""
    from diffsg_tpu.models.unet1d import UNet1D
    from diffsg_tpu.diffusion import cosine_schedule, ddpm_loss, cfg_sample

    rng = np.random.default_rng(0)
    M = 3
    X = jnp.asarray(rng.uniform(0, 1, (64, M)), jnp.float32)
    Y = jnp.asarray(rng.dirichlet(np.ones(M), 64) * 10, jnp.float32)
    sched = cosine_schedule(10)
    model = UNet1D(input_dim=M, proj_dim=16, cond_dim=M + 1,  # + cdim
                   dims=(8, 4), is_attn=(False, False), middle_attn=False,
                   n_blocks=1)

    def apply_fn(p, y, t, c, m):
        # augment the condition with the current objective value in-line
        c_aug = condition_c_msr(y, c, 0.5, 2.5)
        return model.apply({"params": p}, y, t, c_aug, m)

    v = model.init(jax.random.PRNGKey(0), Y[:1], jnp.zeros((1,)),
                   jnp.zeros((1, M + 1)), jnp.ones((1, 1)))
    loss = ddpm_loss(apply_fn, v["params"], sched, Y, X, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    y0, _ = cfg_sample(apply_fn, v["params"], sched, X[:8], 30.0, M,
                       key=jax.random.PRNGKey(2))
    assert y0.shape == (8, M) and bool(jnp.all(jnp.isfinite(y0)))
