"""Dataset-generator tests.

The CO oracle is validated directly against the shipped OOD labels: feeding
the OOD raw features through our candidate scorer must reproduce the stored
decision class + allocations exactly (the min-cost rule matches 400/400;
see generators.py docstring).
"""

import numpy as np
import pandas as pd
import jax.numpy as jnp

from diffsg_tpu.data.generators import (
    co_minlp_gen, _co_candidates, sum_rate_gen, _alpha_calc,
    noma_uav_gen, nu_feasible_powers, nu_dataset_extension,
    CO_F_T, CO_KAPPA, CO_P_T, CO_P_I, CO_B, CO_N0,
)
from diffsg_tpu.ops import nu_rate


def _co_label(raw_rows: np.ndarray):
    """Score all candidates for given raw features; return (class, F)."""
    D_all, F_all, cls_all = _co_candidates(3, 0.02)
    s = raw_rows[:, 0::6]
    c = raw_rows[:, 1::6]
    f_local = raw_rows[:, 2::6]
    h = raw_rows[:, 3::6]
    alpha = raw_rows[:, 4::6]
    beta = raw_rows[:, 5::6]
    sinr = CO_P_T * h**2 / (CO_N0 + np.sum(CO_P_T * h**2, axis=1, keepdims=True))
    r_u = CO_B * np.log2(1 + sinr)
    cost_local = alpha * (c / f_local) + beta * (CO_KAPPA * f_local**2 * c)
    exec_term = c[:, None, :] / (CO_F_T * F_all[None])
    cost_off = (alpha[:, None, :] * (s[:, None, :] / r_u[:, None, :] + exec_term)
                + beta[:, None, :] * (CO_P_T * s[:, None, :] / r_u[:, None, :]
                                      + CO_P_I * exec_term))
    total = np.sum((1 - D_all)[None] * cost_local[:, None, :]
                   + D_all[None] * cost_off, axis=2)
    best = np.argmin(total, axis=1)
    return cls_all[best], np.where(D_all[best] > 0, F_all[best], 0.0)


def test_co_oracle_reproduces_shipped_ood_labels(reference_path):
    src = np.array(pd.read_csv(
        reference_path / "datasets" / "3nodes_2000samples_ood.csv", header=None))
    raw, label_cls, label_F = src[:, :18], src[:, 18], src[:, 19:22]
    cls, F = _co_label(raw[:300])
    np.testing.assert_array_equal(cls, label_cls[:300].astype(int))
    np.testing.assert_allclose(F, label_F[:300], atol=1e-9)


def test_co_minlp_gen_schema_and_validity():
    data, ms = co_minlp_gen(64, seed=1)
    assert data.shape == (64, 22)
    cls = data[:, 18].astype(int)
    F = data[:, 19:22]
    assert cls.min() >= 0 and cls.max() <= 7
    # allocations: either all-local (sum 0) or sum to 1 on the grid
    sums = F.sum(1)
    assert np.all((np.abs(sums - 1) < 1e-6) | (sums == 0))
    # decision bits consistent with allocations
    D = np.stack([(cls >> 2) & 1, (cls >> 1) & 1, cls & 1], axis=1)
    assert np.all((F > 0) == (D > 0))


def test_alpha_calc_matches_reference(fixture_dir):
    fx = np.load(fixture_dir / "alpha_calc.npz")
    got = _alpha_calc(fx["grads"])
    np.testing.assert_allclose(got, fx["alpha"], rtol=1e-10, atol=1e-12)


def test_sum_rate_gen():
    gs, rates, schemes = sum_rate_gen(128, M=3, W=10.0, seed=0)
    # LRH steps are sum-preserving: every scheme still sums to W
    np.testing.assert_allclose(schemes.sum(1), 10.0, rtol=1e-9)
    np.testing.assert_allclose(
        rates, np.sum(np.log2(1 + schemes * gs), axis=1), rtol=1e-12)
    # labels should beat the uniform allocation on average
    uniform = np.sum(np.log2(1 + (10.0 / 3) * gs), axis=1)
    assert rates.mean() > uniform.mean()


def test_noma_uav_gen():
    data = noma_uav_gen(3, P_sum=18.0, seed=0, grid_step=8)
    q, uav, P, rate = data[:, :6], data[:, 6:8], data[:, 8:11], data[:, -1]
    np.testing.assert_allclose(P.sum(1), 18.0, rtol=1e-6)
    # stored rate equals the task objective on the stored solution
    Y = np.concatenate([uav, P], axis=1)
    recomputed = np.asarray(nu_rate(jnp.asarray(Y, jnp.float32),
                                    jnp.asarray(q, jnp.float32)))
    np.testing.assert_allclose(recomputed, rate, rtol=1e-3, atol=1e-7)
    # SIC feasibility: stronger channel (closer user) gets smaller power
    for i in range(3):
        d2 = (q[i, 0::2] - uav[i, 0]) ** 2 + (q[i, 1::2] - uav[i, 1]) ** 2
        order = np.argsort(d2)  # closest (strongest) first
        assert np.all(np.diff(P[i][order]) >= -1e-9)


def test_nu_dataset_extension_preserves_rates():
    data = noma_uav_gen(2, P_sum=18.0, seed=1, grid_step=8)
    ext = nu_dataset_extension(data, times=2, seed=0)
    assert ext.shape == (4, data.shape[1])
    q, uav, P = ext[:, :6], ext[:, 6:8], ext[:, 8:11]
    Y = np.concatenate([uav, P], axis=1)
    rec = np.asarray(nu_rate(jnp.asarray(Y, jnp.float32), jnp.asarray(q, jnp.float32)))
    # rigid motions preserve distances -> rates unchanged
    np.testing.assert_allclose(rec, ext[:, -1], rtol=1e-3)


def test_msr_waterfilling_labels_match_jax_oracle():
    """NumPy label generator == the jitted waterfilling baseline."""
    import jax.numpy as jnp

    from diffsg_tpu.baselines.waterfilling import waterfilling
    from diffsg_tpu.data.generators import msr_waterfilling_labels

    rng = np.random.default_rng(3)
    gs = rng.uniform(0.5, 2.5, size=(64, 80))
    rates, schemes = msr_waterfilling_labels(gs, 20.0)
    wf = np.asarray(waterfilling(jnp.asarray(gs, jnp.float64)
                                 if jnp.asarray(gs).dtype == jnp.float64
                                 else jnp.asarray(gs, jnp.float32), 20.0))
    np.testing.assert_allclose(schemes, wf, atol=1e-5)
    assert (schemes >= 0).all()
    np.testing.assert_allclose(schemes.sum(1), 20.0, rtol=1e-9)
