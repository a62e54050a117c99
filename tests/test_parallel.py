"""Mesh-sharded execution tests on the 8-virtual-CPU-device backend.

Verifies that dp-sharded sampling/training produce the same numbers as the
single-device path (the batch-global reductions inside the sampler must
become cross-chip collectives without changing semantics)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffsg_tpu.parallel import make_mesh, batch_sharding, shard_params, shard_batch
from diffsg_tpu.models.unet1d import UNet1D, unet_msr
from diffsg_tpu.diffusion import cfg_sample, cosine_schedule, ddpm_loss
from diffsg_tpu.train import TrainConfig, build_train_epoch, make_optimizer, ema_init, TrainState


@pytest.fixture(scope="module")
def small_model():
    model = UNet1D(input_dim=3, proj_dim=32, cond_dim=3, dims=(16, 8),
                   is_attn=(False, False), middle_attn=False, n_blocks=1)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)), jnp.zeros((1,)),
                   jnp.zeros((1, 3)), jnp.ones((1, 1)))
    return model, v["params"]


def test_device_count():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"


def test_sharded_sampling_matches_single_device(small_model):
    model, params = small_model
    sched = cosine_schedule(20)

    def apply_fn(p, y, t, c, m):
        return model.apply({"params": p}, y, t, c, m)

    B = 64
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.uniform(0, 1, (B, 3)), jnp.float32)
    init_noise = jnp.asarray(rng.normal(0, 1, (B, 3)), jnp.float32)
    step_noise = jnp.asarray(rng.normal(0, 1, (20, B, 3)), jnp.float32)

    def run(c, i, s):
        y0, _ = cfg_sample(apply_fn, params, sched, c, 150.0, 3,
                           init_noise=i, step_noise=s)
        return y0

    y_single = np.asarray(jax.jit(run)(cond, init_noise, step_noise))

    mesh = make_mesh(8, tp=1)
    bs = batch_sharding(mesh)
    sp = shard_params(params, mesh)
    with jax.set_mesh(mesh):
        cond_s = jax.device_put(cond, bs)
        # noise replicated but logically batch-sharded too
        init_s = jax.device_put(init_noise, bs)
        step_s = jax.device_put(step_noise, jax.NamedSharding(mesh, jax.P(None, "dp")))
        y_sharded = np.asarray(jax.jit(run.__wrapped__ if hasattr(run, "__wrapped__") else run)(cond_s, init_s, step_s))

    # batch-global mean/var collectives reorder reductions; 20 steps at
    # omega=150 amplify that to ~1e-3 relative.
    np.testing.assert_allclose(y_sharded, y_single, rtol=5e-3, atol=1e-3)


def test_dp_tp_train_step(small_model):
    """One dp x tp sharded training epoch runs and moves the loss."""
    model, params0 = small_model
    sched = cosine_schedule(20)

    def apply_fn(p, y, t, c, m):
        return model.apply({"params": p}, y, t, c, m)

    cfg = TrainConfig(epochs=1, batch_size=32, lr=1e-3, milestones=(100,), T=20, seed=0)
    N = 256
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(0, 1, (N, 3)), jnp.float32)
    Y = jnp.asarray(rng.dirichlet(np.ones(3), N), jnp.float32)

    optimizer = make_optimizer(cfg, N // cfg.batch_size)
    epoch_fn = build_train_epoch(apply_fn, sched, optimizer, cfg, N)

    mesh = make_mesh(8, tp=2)
    params = shard_params(params0, mesh, tp_min_width=64)
    state = TrainState(params, optimizer.init(params), ema_init(params),
                       jnp.zeros((), jnp.int32))
    with jax.set_mesh(mesh):
        Xs, Ys = shard_batch((X, Y), mesh)
        state, loss1 = epoch_fn(state, Xs, Ys, jax.random.PRNGKey(1))
        state, loss2 = epoch_fn(state, Xs, Ys, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss1)) and float(loss2) < float(loss1)
