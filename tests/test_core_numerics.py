"""Golden-value tests for schedules, objectives, decoders, preprocessing.

Golden arrays in tests/fixtures/*.npz were produced by running the reference
torch implementation (see tools/gen_reference_fixtures.py).
"""

import numpy as np
import jax.numpy as jnp

from diffsg_tpu.diffusion import cosine_beta_schedule, schedule_from_betas
from diffsg_tpu.ops import msr_sum_rate, co_cost, nu_rate, msr_decode, co_decode, nu_decode
from diffsg_tpu.data import data_preprocess_co


def test_cosine_schedule_matches_reference(fixture_dir):
    fx = np.load(fixture_dir / "schedule_T20.npz")
    np.testing.assert_allclose(cosine_beta_schedule(20), fx["betas_T20"], rtol=0, atol=1e-12)
    np.testing.assert_allclose(cosine_beta_schedule(500), fx["betas_T500"], rtol=0, atol=1e-12)
    # The nonstandard 0.84 clip engages exactly at the last step for T=20.
    assert cosine_beta_schedule(20)[-1] == 0.84


def test_schedule_coefficients():
    betas = cosine_beta_schedule(20)
    s = schedule_from_betas(betas)
    alphas = 1 - betas
    acp = np.cumprod(alphas)
    np.testing.assert_allclose(np.asarray(s.alphas_cumprod), acp, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s.remove_noise_coeff), betas / np.sqrt(1 - acp), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s.reciprocal_sqrt_alphas), np.sqrt(1 / alphas), rtol=1e-6)
    assert s.T == 20


def test_preprocess_co(fixture_dir):
    fx = np.load(fixture_dir / "preprocess_co.npz")
    got = data_preprocess_co(fx["raw"])
    np.testing.assert_allclose(got, fx["simplified"], rtol=1e-12)


def test_msr_sum_rate(fixture_dir):
    fx = np.load(fixture_dir / "objectives.npz")
    got = msr_sum_rate(jnp.asarray(fx["msr_p"], jnp.float32), jnp.asarray(fx["msr_g"], jnp.float32))
    np.testing.assert_allclose(np.asarray(got), fx["msr_rate"], rtol=1e-5)


def test_co_cost(fixture_dir):
    fx = np.load(fixture_dir / "objectives.npz")
    got = co_cost(jnp.asarray(fx["co_X"], jnp.float32), jnp.asarray(fx["co_Y"], jnp.float32))
    np.testing.assert_allclose(np.asarray(got), fx["co_cost"], rtol=1e-5)


def test_nu_rate(fixture_dir):
    fx = np.load(fixture_dir / "objectives.npz")
    got = nu_rate(jnp.asarray(fx["nu_Y"], jnp.float32), jnp.asarray(fx["nu_X"], jnp.float32))
    np.testing.assert_allclose(np.asarray(got), fx["nu_rate"], rtol=1e-5)


def test_decoders(fixture_dir):
    fx = np.load(fixture_dir / "decoders.npz")
    y = jnp.asarray(fx["y_raw"], jnp.float32)
    np.testing.assert_allclose(np.asarray(msr_decode(y)), fx["msr_dec"], rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(co_decode(y)), fx["co_dec"], rtol=1e-5, atol=1e-7)
    y_nu = jnp.asarray(fx["y_nu_raw"], jnp.float32)
    np.testing.assert_allclose(
        np.asarray(nu_decode(y_nu, 400, 400, 18.0)), fx["nu_dec"], rtol=1e-4, atol=1e-4
    )


def test_co_decode_all_local_sentinel():
    y = jnp.full((4, 3), -50.0)
    assert np.all(np.asarray(co_decode(y)) == 0.0)


def test_feasibility_properties():
    """Decoded solutions satisfy the task constraint sets."""
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.normal(0, 5, (64, 7)), jnp.float32)
    # MSR: rows sum to 1 (powers = W * decode)
    np.testing.assert_allclose(np.asarray(msr_decode(y)).sum(1), 1.0, rtol=1e-5)
    # CO: softmax rows sum to 1
    np.testing.assert_allclose(np.asarray(co_decode(y)).sum(1), 1.0, rtol=1e-5)
    # NU: powers sum to P_sum, coords inside the area
    dec = np.asarray(nu_decode(jnp.asarray(rng.normal(0, 5, (64, 5)), jnp.float32), 400, 400, 18.0))
    np.testing.assert_allclose(dec[:, 2:].sum(1), 18.0, rtol=1e-5)
    assert dec[:, 0].min() >= 0 and dec[:, 0].max() <= 400
    assert dec[:, 1].min() >= 0 and dec[:, 1].max() <= 400


def test_msr_simplex_project():
    """Euclidean simplex projection: feasible, identity on feasible rows,
    equals the brute-force projection on random rows."""
    from diffsg_tpu.ops.decoders import msr_simplex_project

    rng = np.random.default_rng(0)
    W = 20.0
    Y = jnp.asarray(rng.normal(0, 2, (64, 16)), jnp.float32)
    P = msr_simplex_project(Y, W)
    assert (np.asarray(P) >= 0).all()
    np.testing.assert_allclose(np.asarray(P).sum(1), W, rtol=1e-5)
    # identity on feasible rows
    F = jnp.asarray(rng.dirichlet(np.ones(16), 8) * W, jnp.float32)
    np.testing.assert_allclose(np.asarray(msr_simplex_project(F, W)), F,
                               atol=2e-5)
    # matches a scipy-free brute force (scan tau over sorted breakpoints)
    y = np.asarray(Y[0], np.float64)
    s = np.sort(y)[::-1]
    best = None
    for k in range(1, len(y) + 1):
        tau = (s[:k].sum() - W) / k
        if (k == len(y) or s[k] <= tau) and s[k - 1] > tau:
            best = np.maximum(y - tau, 0)
    np.testing.assert_allclose(np.asarray(P[0]), best, atol=1e-5)


def test_msr_wf_decode_recovers_scaled_labels():
    """msr_wf decode is (near-)lossless when the raw sample equals the
    y_scale-scaled waterfilling label — the training-time contract."""
    from diffsg_tpu.data.generators import msr_waterfilling_labels
    from diffsg_tpu.tasks import TASKS
    from diffsg_tpu.ops.objectives import msr_sum_rate

    rng = np.random.default_rng(1)
    W, M, scale = 20.0, 80, 8.0
    g = rng.uniform(0.5, 2.5, (32, M))
    _, labels = msr_waterfilling_labels(g, W)
    cfg = {"M": M, "W": W, "y_scale": scale}
    task = TASKS["msr_wf"]
    dec = task.decode_with_x(jnp.asarray(labels * scale, jnp.float32),
                             jnp.asarray(g, jnp.float32), cfg)
    r_dec = np.asarray(msr_sum_rate(dec, jnp.asarray(g, jnp.float32)))
    r_lab = np.asarray(msr_sum_rate(jnp.asarray(labels, jnp.float32),
                                    jnp.asarray(g, jnp.float32)))
    assert r_dec.sum() / r_lab.sum() > 0.99999


def test_nu_direct_decode_recovers_scaled_labels():
    """nu_direct decode is the identity on y_scale-scaled feasible labels
    and always feasible (box coords, simplex powers)."""
    from diffsg_tpu.ops.decoders import nu_direct_decode

    rng = np.random.default_rng(2)
    w = h = 400.0
    P, scale = 18.0, 8.0
    xy = rng.uniform(0, 1, (32, 2))
    pw = rng.dirichlet(np.ones(3), 32)
    labels = np.concatenate([xy, pw], axis=1)
    dec = np.asarray(nu_direct_decode(jnp.asarray(labels * scale, jnp.float32),
                                      w, h, P, scale))
    np.testing.assert_allclose(dec[:, 0], xy[:, 0] * w, atol=1e-3)
    np.testing.assert_allclose(dec[:, 1], xy[:, 1] * h, atol=1e-3)
    np.testing.assert_allclose(dec[:, 2:], pw * P, atol=1e-3)
    # feasibility on arbitrary raw samples
    Y = jnp.asarray(rng.normal(0, 4, (64, 5)), jnp.float32)
    d2 = np.asarray(nu_direct_decode(Y, w, h, P, scale))
    assert (d2[:, 0] >= 0).all() and (d2[:, 0] <= w).all()
    assert (d2[:, 2:] >= 0).all()
    np.testing.assert_allclose(d2[:, 2:].sum(1), P, rtol=1e-5)


def test_co_direct_decode_recovers_label_decisions():
    """co_direct decode recovers the exact-oracle solution when the raw
    sample equals the y_scale-scaled optimal shares (the training-time
    contract), and decodes the all-local zeros row to zeros."""
    from diffsg_tpu.baselines.co_exact import co_exact_solve, co_direct_decode

    rng = np.random.default_rng(3)
    scale = 8.0
    X = jnp.asarray(rng.uniform(0.1, 5.0, (64, 9)), jnp.float32)
    Y_opt = co_exact_solve(X)                     # incl. possible zero rows
    dec = co_direct_decode(Y_opt * scale, X, y_scale=scale)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(Y_opt), atol=1e-5)
    zeros = jnp.zeros((4, 3), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(co_direct_decode(zeros, X[:4], y_scale=scale)), 0.0)


def test_nu_direct_decode_inverts_center_shift():
    """Centered training (y_scale * (labels - y_shift)) decodes back to the
    labels when y_shift is passed (per-dim)."""
    from diffsg_tpu.ops.decoders import nu_direct_decode

    rng = np.random.default_rng(5)
    w = h = 400.0
    P, scale = 18.0, 8.0
    labels = np.concatenate([rng.uniform(0, 1, (16, 2)),
                             rng.dirichlet(np.ones(3), 16)], axis=1)
    shift = labels.mean(axis=0)
    raw = (labels - shift) * scale
    dec = np.asarray(nu_direct_decode(jnp.asarray(raw, jnp.float32), w, h, P,
                                      scale, shift.astype(np.float32)))
    np.testing.assert_allclose(dec[:, 0], labels[:, 0] * w, atol=1e-3)
    np.testing.assert_allclose(dec[:, 2:], labels[:, 2:] * P, atol=1e-3)
