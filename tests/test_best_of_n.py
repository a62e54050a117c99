"""Best-of-N candidate selection (framework extension beyond the reference)."""

import numpy as np
import pytest
import jax.numpy as jnp

from diffsg_tpu.tasks import NU
from diffsg_tpu.tasks.base import sample_best_of_n, sample_solutions
from diffsg_tpu.data import load_nu
from diffsg_tpu.ops import nu_rate
from diffsg_tpu.utils.torch_import import ddpm_from_torch


@pytest.fixture(scope="module")
def nu_setup(reference_path):
    path = reference_path / "ckpts" / "ddpm_nu_3u.pt"
    if not path.exists():
        pytest.skip("NU ckpt missing")
    td = load_nu(str(reference_path / "datasets" / "3u_18mW_10000samples.csv"))
    params, _, sched, _ = ddpm_from_torch(str(path))
    return td, params, sched


def _ratio(td, Y):
    cfg = td.config
    n = Y.shape[0]
    X = np.array(td.X_test[:n])
    X[:, 0::2] *= cfg["width"]
    X[:, 1::2] *= cfg["height"]
    Yt = np.array(td.Y_test[:n])
    Yt[:, 0] *= cfg["width"]
    Yt[:, 1] *= cfg["height"]
    Yt[:, 2:] *= cfg["P_sum"]
    pred = np.asarray(nu_rate(jnp.asarray(Y, jnp.float32), jnp.asarray(X, jnp.float32)))
    true = np.asarray(nu_rate(jnp.asarray(Yt, jnp.float32), jnp.asarray(X, jnp.float32)))
    return pred.sum() / true.sum()


def test_best_of_n_improves(nu_setup):
    td, params, sched = nu_setup
    X = td.X_test[:256]
    single, _ = sample_solutions(NU, params, sched, X, td.config, omega=500.0,
                                 batch_size=256)
    best4 = sample_best_of_n(NU, params, sched, X, td.config, n=4,
                             omega=500.0, batch_size=256)
    assert best4.shape == single.shape
    r1, r4 = _ratio(td, single), _ratio(td, best4)
    # candidate selection can only help the batch objective (up to decoder
    # batch-coupling noise)
    assert r4 >= r1 - 1e-3, (r1, r4)
    assert r4 > r1, (r1, r4)


def test_msr_temp_decode_dominates_reference_decode(reference_path):
    """Temperature selection can only improve the rate over the t=1
    (reference) decode, per sample."""
    from diffsg_tpu.tasks.msr import _decode_temp_selected
    from diffsg_tpu.ops import msr_decode, msr_sum_rate
    from diffsg_tpu.data import load_msr

    td = load_msr(str(reference_path / "datasets" / "3c_10w_10000samples.csv"))
    mn, mx = td.config["scaler_min"], td.config["scaler_max"]
    rng = np.random.default_rng(0)
    Y_raw = jnp.asarray(rng.normal(0, 2, (64, 3)), jnp.float32)
    g = jnp.asarray(td.X_test[:64] * (mx - mn) + mn, jnp.float32)
    W = td.config["W"]
    base = msr_sum_rate(W * msr_decode(Y_raw), g)
    sel = msr_sum_rate(_decode_temp_selected(Y_raw, g, td.config), g)
    assert np.all(np.asarray(sel) >= np.asarray(base) - 1e-4)
    # shares stay on the simplex
    dec = _decode_temp_selected(Y_raw, g, td.config)
    np.testing.assert_allclose(np.asarray(dec).sum(1), W, rtol=1e-4)
