"""DDIM sampler: determinism, respacing, quality sanity on the NU ckpt."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffsg_tpu.diffusion import ddim_sample, respaced_steps, cosine_schedule
from diffsg_tpu.models import unet_nu
from diffsg_tpu.utils.torch_import import ddpm_from_torch


def test_respaced_steps():
    np.testing.assert_array_equal(respaced_steps(20, 20), np.arange(19, -1, -1))
    s = respaced_steps(20, 5)
    assert s[0] == 19 and s[-1] == 0 and len(s) == 5
    assert np.all(np.diff(s) < 0)


@pytest.fixture(scope="module")
def nu(reference_path):
    pt = reference_path / "ckpts" / "ddpm_nu_3u.pt"
    if not pt.exists():
        pytest.skip("NU ckpt missing")
    params, _, sched, _ = ddpm_from_torch(str(pt))
    model = unet_nu(3)
    return params, sched, (lambda p, y, t, c, m: model.apply({"params": p}, y, t, c, m))


def test_ddim_deterministic_at_eta0(nu):
    params, sched, af = nu
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.uniform(0, 1, (16, 6)), jnp.float32)
    init = jnp.asarray(rng.normal(0, 1, (16, 5)), jnp.float32)
    y1, _ = ddim_sample(af, params, sched, cond, 500.0, 5, init_noise=init, n_steps=10)
    y2, _ = ddim_sample(af, params, sched, cond, 500.0, 5, init_noise=init, n_steps=10)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_ddim_fewer_steps_finite_and_decodable(nu):
    from diffsg_tpu.ops import nu_decode

    params, sched, af = nu
    rng = np.random.default_rng(1)
    cond = jnp.asarray(rng.uniform(0, 1, (32, 6)), jnp.float32)
    for n_steps in (20, 5):
        y0, _ = ddim_sample(af, params, sched, cond, 500.0, 5,
                            key=jax.random.PRNGKey(0), n_steps=n_steps)
        dec = nu_decode(y0, 400, 400, 18.0)
        assert bool(jnp.all(jnp.isfinite(dec)))
        np.testing.assert_allclose(np.asarray(dec)[:, 2:].sum(1), 18.0, rtol=1e-4)


def test_ddim_eta1_stochastic(nu):
    params, sched, af = nu
    rng = np.random.default_rng(2)
    cond = jnp.asarray(rng.uniform(0, 1, (8, 6)), jnp.float32)
    y1, _ = ddim_sample(af, params, sched, cond, 500.0, 5,
                        key=jax.random.PRNGKey(1), n_steps=10, eta=1.0)
    y2, _ = ddim_sample(af, params, sched, cond, 500.0, 5,
                        key=jax.random.PRNGKey(2), n_steps=10, eta=1.0)
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_evaluate_with_ddim_sampler(nu, reference_path):
    """tasks.base.evaluate/sample paths accept sampler='ddim' (the
    report.py --sampler ddim route)."""
    from diffsg_tpu.tasks import TASKS, evaluate
    from diffsg_tpu.data.loaders import TaskData

    params, sched, _ = nu
    task = TASKS["nu"]
    d = task.load(str(reference_path / "datasets/3u_30mW_1000samples_ood.csv"))
    d.X_test, d.Y_test = d.X_test[:64], d.Y_test[:64]
    m = evaluate(task, params, sched, d, omega=500.0, sampler="ddim",
                 n_steps=5)
    assert 0.3 < m["less_ratio"] < 1.5
    mb = evaluate(task, params, sched, d, omega=500.0, best_of=2,
                  sampler="ddim", n_steps=5)
    assert 0.3 < mb["less_ratio"] < 1.5
