"""Trainer unit tests + the end-to-end synthetic-task training smoke test
(the formalization of the reference's validate_ddpm_co capability)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffsg_tpu.train import (
    TrainConfig, train_ddpm, multistep_lr, ema_init, ema_update, torch_style_init,
)
from diffsg_tpu.models.unet1d import UNet1D
from diffsg_tpu.data.synthetic import validation_data_gen
from diffsg_tpu.diffusion import cfg_sample
from diffsg_tpu.tasks.co import decision_class


def test_multistep_lr():
    sched = multistep_lr(0.005, (100, 150), steps_per_epoch=10)
    assert float(sched(0)) == pytest.approx(0.005)
    assert float(sched(999)) == pytest.approx(0.005)
    assert float(sched(1000)) == pytest.approx(0.0005)
    assert float(sched(1500)) == pytest.approx(0.00005)


def test_ema_first_update_copies():
    p = {"w": jnp.ones((2, 2))}
    ema = ema_init(p)
    # torch AveragedModel: first update_parameters copies
    ema = ema_update(ema, {"w": jnp.full((2, 2), 3.0)}, decay=0.9999)
    np.testing.assert_allclose(np.asarray(ema.params["w"]), 3.0)
    assert int(ema.n_averaged) == 1
    ema = ema_update(ema, {"w": jnp.full((2, 2), 5.0)}, decay=0.5)
    np.testing.assert_allclose(np.asarray(ema.params["w"]), 4.0)


def test_torch_style_init_distributions():
    model = UNet1D(input_dim=3, proj_dim=32, cond_dim=9, dims=(16, 8),
                   is_attn=(False, False), middle_attn=False, n_blocks=1)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)), jnp.zeros((1,)),
                   jnp.zeros((1, 9)), jnp.ones((1, 1)))
    params = torch_style_init(v["params"], jax.random.PRNGKey(1))
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    kernels = [np.asarray(p) for path, p in flat if path[-1].key == "kernel"]
    big = np.concatenate([k.ravel() for k in kernels])
    assert abs(big.std() - 0.01) < 0.001  # N(0, 0.01) weights
    assert abs(big.mean()) < 0.001
    # biases bounded by 1/sqrt(fan_in)
    for path, p in flat:
        if path[-1].key == "bias":
            parent = params
            for q in path[:-1]:
                parent = parent[q.key]
            if "kernel" in parent:
                bound = 1 / np.sqrt(parent["kernel"].shape[0])
                assert np.abs(np.asarray(p)).max() <= bound + 1e-7
        if path[-1].key == "scale":
            np.testing.assert_allclose(np.asarray(p), 1.0)


@pytest.mark.slow
def test_synthetic_co_end_to_end():
    """Train a small CFG-DDPM on the synthetic one-hot task and check that
    sampled solutions recover the correct decisions (reference capability:
    validate_ddpm_co/test_ddpm, classifier_free_CO.py:451-558)."""
    td = validation_data_gen(600, seed=0)
    model = UNet1D(input_dim=3, proj_dim=32, cond_dim=9, dims=(16, 8),
                   is_attn=(False, False), middle_attn=False, n_blocks=1)
    cfg = TrainConfig(epochs=60, batch_size=512, lr=5e-3, milestones=(30, 50),
                      T=50, uncond_prob=0.0, seed=0)
    params, ema, sched = train_ddpm(model, td.X_train, td.Y_train, cfg, log_every=0)

    def apply_fn(p, y, t, c, m):
        return model.apply({"params": p}, y, t, c, m)

    y0, _ = cfg_sample(apply_fn, params, sched, jnp.asarray(td.X_test, jnp.float32),
                       omega=30.0, data_dim=3, key=jax.random.PRNGKey(1))
    Y_pred = jax.nn.softmax(y0, axis=1)
    acc = (decision_class(np.asarray(Y_pred)) == decision_class(td.Y_test)).mean()
    assert acc > 0.9, f"synthetic decision accuracy {acc}"


def test_grad_clip_optimizer():
    """grad_clip (framework extension) bounds the update; default is off
    (bare Adam, reference parity)."""
    import optax
    from diffsg_tpu.train.trainer import TrainConfig, make_optimizer

    cfg = TrainConfig(grad_clip=1.0)
    opt = make_optimizer(cfg, steps_per_epoch=10)
    params = {"w": jnp.zeros((4,))}
    state = opt.init(params)
    huge = {"w": jnp.full((4,), 1e9)}
    updates, _ = opt.update(huge, state, params)
    # after global-norm clip to 1.0, Adam normalizes further; update is finite
    assert np.isfinite(np.asarray(updates["w"])).all()
    clipped = optax.clip_by_global_norm(1.0).update(
        huge, optax.clip_by_global_norm(1.0).init(params), params)[0]
    np.testing.assert_allclose(
        float(jnp.sqrt(sum(jnp.sum(g**2) for g in jax.tree.leaves(clipped)))),
        1.0, rtol=1e-5)


@pytest.mark.slow
def test_synthetic_co_end_to_end_x0_parameterization():
    """x0-prediction (framework extension): train the synthetic task with
    parameterization='x0' and sample through the converting sampler —
    decisions recover like the eps-parameterized model."""
    td = validation_data_gen(600, seed=0)
    model = UNet1D(input_dim=3, proj_dim=32, cond_dim=9, dims=(16, 8),
                   is_attn=(False, False), middle_attn=False, n_blocks=1)
    cfg = TrainConfig(epochs=60, batch_size=512, lr=5e-3, milestones=(30, 50),
                      T=50, uncond_prob=0.0, seed=0, parameterization="x0")
    params, _, sched = train_ddpm(model, td.X_train, td.Y_train, cfg,
                                  log_every=0)

    def apply_fn(p, y, t, c, m):
        return model.apply({"params": p}, y, t, c, m)

    y0, _ = cfg_sample(apply_fn, params, sched,
                       jnp.asarray(td.X_test, jnp.float32),
                       omega=30.0, data_dim=3, key=jax.random.PRNGKey(1),
                       parameterization="x0")
    Y_pred = jax.nn.softmax(y0, axis=1)
    acc = (decision_class(np.asarray(Y_pred)) == decision_class(td.Y_test)).mean()
    assert acc > 0.9, f"x0-param synthetic decision accuracy {acc}"
