"""Full reverse-sampler parity: 20 CFG steps at omega=500 with the reference
NU checkpoint and the exact noise stream the torch reference consumed
(recorded by tools/gen_reference_fixtures.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffsg_tpu.diffusion import cfg_sample, q_sample, cosine_schedule
from diffsg_tpu.models import unet_nu
from diffsg_tpu.utils.torch_import import ddpm_from_torch


@pytest.fixture(scope="module")
def nu_ckpt(reference_path):
    path = reference_path / "ckpts" / "ddpm_nu_3u.pt"
    if not path.exists():
        pytest.skip("NU checkpoint missing")
    return ddpm_from_torch(str(path))


def test_sampler_parity_omega500(nu_ckpt, fixture_dir):
    params, _, sched, _ = nu_ckpt
    fx = np.load(fixture_dir / "nu_sample.npz")
    model = unet_nu(3)

    def apply_fn(p, y, t, c, m):
        return model.apply({"params": p}, y, t, c, m)

    y0, _ = cfg_sample(
        apply_fn, params, sched,
        cond=jnp.asarray(fx["cond"]),
        omega=float(fx["omega"]),
        data_dim=5,
        init_noise=jnp.asarray(fx["init_noise"]),
        step_noise=jnp.asarray(fx["step_noises"]),
    )
    # 20 steps at omega=500 amplify differences; the batch re-standardization
    # keeps values O(1).  atol=2e-3 on the final state is ~1e-3 relative.
    np.testing.assert_allclose(np.asarray(y0), fx["y0"], atol=2e-3)


def test_q_sample_roundtrip():
    """q_sample at t=0 is nearly identity; coefficient magnitudes sane."""
    sched = cosine_schedule(20)
    y0 = jnp.ones((4, 5))
    noise = jnp.zeros((4, 5))
    t = jnp.zeros((4,), jnp.int32)
    y_t = q_sample(sched, y0, t, noise)
    np.testing.assert_allclose(np.asarray(y_t), np.sqrt(1 - np.asarray(sched.betas)[0]), rtol=1e-5)


def test_sampler_trace_shapes(nu_ckpt, fixture_dir):
    params, _, sched, _ = nu_ckpt
    fx = np.load(fixture_dir / "nu_sample.npz")
    model = unet_nu(3)

    def apply_fn(p, y, t, c, m):
        return model.apply({"params": p}, y, t, c, m)

    y0, trace = cfg_sample(
        apply_fn, params, sched,
        cond=jnp.asarray(fx["cond"][:4]),
        omega=500.0, data_dim=5,
        key=jax.random.PRNGKey(0),
        record_trace=True,
    )
    assert trace.ys.shape == (20, 4, 5)
    assert trace.eps.shape == (20, 4, 5)
    # last trace entry equals the returned sample
    np.testing.assert_allclose(np.asarray(trace.ys[-1]), np.asarray(y0), rtol=1e-6)
