"""Serving API tests (NU reference checkpoint)."""

import numpy as np
import pytest

from diffsg_tpu.serve import Solver
from diffsg_tpu.data import load_nu


@pytest.fixture(scope="module")
def solver(reference_path):
    pt = reference_path / "ckpts" / "ddpm_nu_3u.pt"
    if not pt.exists():
        pytest.skip("NU ckpt missing")
    return Solver.from_torch_checkpoint(
        str(pt), task="nu",
        dataset_config={"K": 3, "P_sum": 18.0, "width": 400.0, "height": 400.0},
        buckets=(1, 32, 128),
    )


def test_solve_shapes_and_feasibility(solver, reference_path):
    td = load_nu(str(reference_path / "datasets" / "3u_18mW_10000samples.csv"))
    Y = solver.solve(td.X_test[:50])  # padded to bucket 128, trimmed back
    assert Y.shape == (50, 5)
    np.testing.assert_allclose(Y[:, 2:].sum(1), 18.0, rtol=1e-4)
    assert Y[:, 0].min() >= 0 and Y[:, 0].max() <= 400


def test_solve_bucketing_reuses_compiles(solver, reference_path):
    td = load_nu(str(reference_path / "datasets" / "3u_18mW_10000samples.csv"))
    # different sizes within the same bucket produce valid outputs
    for n in (3, 17, 32):
        Y = solver.solve(td.X_test[:n], seed=1)
        assert Y.shape == (n, 5)


def test_solve_best_of(solver, reference_path):
    from diffsg_tpu.ops import nu_rate
    import jax.numpy as jnp

    td = load_nu(str(reference_path / "datasets" / "3u_18mW_10000samples.csv"))
    X = td.X_test[:32]
    Xu = np.array(X)
    Xu[:, 0::2] *= 400
    Xu[:, 1::2] *= 400
    y1 = solver.solve(X, omega=500, best_of=1, seed=2)
    y4 = solver.solve(X, omega=500, best_of=4, seed=2)
    r1 = np.asarray(nu_rate(jnp.asarray(y1, jnp.float32), jnp.asarray(Xu, jnp.float32))).sum()
    r4 = np.asarray(nu_rate(jnp.asarray(y4, jnp.float32), jnp.asarray(Xu, jnp.float32))).sum()
    assert r4 >= r1


def test_solve_ddim_and_mixture(solver, reference_path):
    td = load_nu(str(reference_path / "datasets" / "3u_18mW_10000samples.csv"))
    X = td.X_test[:32]
    # DDIM with respacing: deterministic per seed, feasible
    y1 = solver.solve(X, omega=500, sampler="ddim", n_steps=10, seed=3)
    y2 = solver.solve(X, omega=500, sampler="ddim", n_steps=10, seed=3)
    np.testing.assert_array_equal(y1, y2)
    np.testing.assert_allclose(y1[:, 2:].sum(1), 18.0, rtol=1e-4)
    # omega-mixture best-of
    ym = solver.solve(X, omega=[150, 500, 2000, 5000], best_of=4, seed=4)
    assert ym.shape == (32, 5)
