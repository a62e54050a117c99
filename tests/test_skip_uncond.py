"""omega==0 fast path: skipping the uncond CFG half matches the full fold.

At omega=0 the CFG combine ``(1+0)*eps_cond - 0*eps_uncond`` is exactly
``eps_cond``, so running only the conditional half of the folded forward
(B rows instead of 2B) is mathematically identical.  The two program
shapes fuse the batch-renorm reductions differently, so outputs agree up
to XLA reassociation (measured <1e-5 absolute over a 20-step trajectory),
not bit-for-bit.  Reference CFG combine:
/root/reference/ddpm_opt/classifier_free_MSR.py:126-132.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsg_tpu.diffusion import cfg_sample, cosine_schedule
from diffsg_tpu.diffusion.ddim import ddim_sample
from diffsg_tpu.models.unet1d import UNet1D

TOL = dict(rtol=1e-4, atol=1e-4)


@pytest.fixture(scope="module")
def tiny():
    model = UNet1D(input_dim=3, proj_dim=16, cond_dim=3, dims=(8, 4),
                   is_attn=(False, False), middle_attn=False, n_blocks=1)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)), jnp.zeros((1,)),
                   jnp.zeros((1, 3)), jnp.ones((1, 1)))

    def af(p, y, t, c, m):
        return model.apply({"params": p}, y, t, c, m)

    cond = jnp.asarray(np.random.default_rng(0).normal(0, 1, (16, 3)),
                       jnp.float32)
    return af, v["params"], cosine_schedule(20), cond


def test_ddpm_skip_uncond_matches_at_omega0(tiny):
    af, params, sched, cond = tiny
    key = jax.random.PRNGKey(3)
    y_full, _ = cfg_sample(af, params, sched, cond, 0.0, 3, key=key)
    y_skip, _ = cfg_sample(af, params, sched, cond, 0.0, 3, key=key,
                           skip_uncond=True)
    np.testing.assert_allclose(np.asarray(y_full), np.asarray(y_skip), **TOL)


def test_ddim_skip_uncond_matches_at_omega0(tiny):
    af, params, sched, cond = tiny
    key = jax.random.PRNGKey(4)
    y_full, _ = ddim_sample(af, params, sched, cond, 0.0, 3, key=key,
                            n_steps=10)
    y_skip, _ = ddim_sample(af, params, sched, cond, 0.0, 3, key=key,
                            n_steps=10, skip_uncond=True)
    np.testing.assert_allclose(np.asarray(y_full), np.asarray(y_skip), **TOL)


def test_ddpm_skip_uncond_x0_param_matches(tiny):
    af, params, sched, cond = tiny
    key = jax.random.PRNGKey(5)
    y_full, _ = cfg_sample(af, params, sched, cond, 0.0, 3, key=key,
                           parameterization="x0")
    y_skip, _ = cfg_sample(af, params, sched, cond, 0.0, 3, key=key,
                           parameterization="x0", skip_uncond=True)
    np.testing.assert_allclose(np.asarray(y_full), np.asarray(y_skip), **TOL)


def test_serve_dispatch_picks_fast_path_at_omega0(reference_path):
    """Solver.solve(omega=0) routes through the skip variant and still
    produces feasible decoded solutions (end-to-end smoke)."""
    from diffsg_tpu.serve import Solver
    from diffsg_tpu.data import load_nu

    pt = reference_path / "ckpts" / "ddpm_nu_3u.pt"
    if not pt.exists():
        pytest.skip("NU ckpt missing")
    solver = Solver.from_torch_checkpoint(
        str(pt), task="nu",
        dataset_config={"K": 3, "P_sum": 18.0, "width": 400.0,
                        "height": 400.0})
    td = load_nu(str(reference_path / "datasets" / "3u_18mW_10000samples.csv"))
    Y = solver.solve(td.X_test[:16], omega=0)
    assert Y.shape == (16, 5)
    np.testing.assert_allclose(Y[:, 2:].sum(1), 18.0, rtol=1e-4)
    # explicit non-skip call through the same jitted fn must agree (decoded
    # solutions; decoder min/max + softmax is contraction, tolerances as at
    # the sampler level)
    cond = jnp.asarray(td.X_test[:16], jnp.float32)
    cu = jnp.asarray(
        np.asarray(solver.task.unnormalize_x(np.asarray(td.X_test[:16]),
                                             solver.config), np.float32))
    key = jax.random.PRNGKey(0)
    y_skip = solver._single(cond, cu, key, jnp.float32(0.0), None, skip=True)
    y_full = solver._single(cond, cu, key, jnp.float32(0.0), None, skip=False)
    np.testing.assert_allclose(np.asarray(y_skip), np.asarray(y_full),
                               rtol=1e-3, atol=1e-3)
