"""Checkpoint-parity tests: our flax UNet1D + converter vs the reference
torch network, using the shipped ``ddpm_nu_3u.pt`` weights and golden
fixtures produced by the torch implementation."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffsg_tpu.models import unet_nu, unet_msr, unet_co
from diffsg_tpu.utils.torch_import import ddpm_from_torch


@pytest.fixture(scope="module")
def nu_ckpt(reference_path):
    path = reference_path / "ckpts" / "ddpm_nu_3u.pt"
    if not path.exists():
        pytest.skip("NU checkpoint missing")
    return ddpm_from_torch(str(path))


def test_param_counts():
    """Model-zoo parameter counts measured from the reference (BASELINE.md)."""
    key = jax.random.PRNGKey(0)
    expected = {
        "msr3": (unet_msr(3), 3, 3, 1_539_027),
        "msr80": (unet_msr(80), 80, 80, 1_655_528),
        "co": (unet_co(3), 3, 9, 774_059),
        "nu": (unet_nu(3), 5, 6, 148_749),
    }
    for name, (model, d, c, n_expected) in expected.items():
        v = model.init(key, jnp.zeros((2, d)), jnp.zeros((2,)), jnp.zeros((2, c)), jnp.ones((2, 1)))
        n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v))
        assert n == n_expected, f"{name}: {n} != {n_expected}"


def test_nu_forward_parity(nu_ckpt, fixture_dir):
    """Bit-level (f32) forward parity with the torch reference on the NU ckpt."""
    params, _, sched, _ = nu_ckpt
    fx = np.load(fixture_dir / "nu_unet_forward.npz")
    model = unet_nu(3)
    y_t = jnp.asarray(fx["y_t"])
    t_norm = jnp.asarray(fx["t_int"], jnp.float32) / 20.0
    cond = jnp.asarray(fx["cond"])
    B = y_t.shape[0]

    eps_c = model.apply({"params": params}, y_t, t_norm, cond, jnp.ones((B, 1)))
    eps_u = model.apply({"params": params}, y_t, t_norm, cond, jnp.zeros((B, 1)))
    np.testing.assert_allclose(np.asarray(eps_c), fx["eps_cond"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(eps_u), fx["eps_uncond"], rtol=1e-4, atol=1e-5)


def test_nu_ema_params_close_to_params(nu_ckpt):
    """The shipped ckpt trained with use_ema=False: EMA shadow equals init copy,
    so it must at least convert with identical structure."""
    params, ema_params, _, _ = nu_ckpt
    assert jax.tree.structure(params) == jax.tree.structure(ema_params)


def test_schedule_buffers_roundtrip(nu_ckpt):
    """Schedule rebuilt from the ckpt's betas matches the analytic cosine schedule."""
    from diffsg_tpu.diffusion import cosine_schedule

    _, _, sched, _ = nu_ckpt
    ours = cosine_schedule(20)
    for a, b in zip(sched, ours):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_msr_width_override_and_ckpt_config_merge():
    """Model-zoo scaling (framework extension): proj_dim/dims overrides flow
    through task config; merge_ckpt_config keeps dataset-owned keys."""
    import jax
    import jax.numpy as jnp

    from diffsg_tpu.tasks import TASKS
    from diffsg_tpu.tasks.base import merge_ckpt_config

    cfg = {"M": 80, "W": 20.0, "proj_dim": 256, "dims": (128, 64, 32, 16)}
    m = TASKS["msr"].build_model(cfg)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 80)), jnp.zeros((1,)),
               jnp.zeros((1, 80)), jnp.ones((1, 1)))
    wide = sum(a.size for a in jax.tree.leaves(v["params"]))
    ref = 1_655_528  # reference MSR-80c architecture (SURVEY.md 2.2)
    assert wide > 3 * ref

    merged = merge_ckpt_config(
        {"M": 80, "W": 40.0},
        {"dataset_config": {"y_scale": 8.0, "dims": [128, 64, 32, 16],
                            "W": 20.0, "scaler_min": 0.0}})
    assert merged["W"] == 40.0          # dataset owns physical config
    assert merged["y_scale"] == 8.0     # checkpoint owns training config
    assert merged["dims"] == [128, 64, 32, 16]
    assert "scaler_min" not in merged  # not a checkpoint-owned key
