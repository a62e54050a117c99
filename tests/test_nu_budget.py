"""Budget-conditioned NU (the trained ``condition_C``-style capability).

The reference designs condition augmentation (``cdim`` config key, the
commented-out ``condition_C`` blocks — ``classifier_free_NU.py:35-75``) but
never trains with it; ``nu_budget`` is the framework's trained realization:
the condition carries ``P_sum / p_ref`` so one model serves any budget.
"""

import numpy as np
import pytest

import jax


def test_load_nu_budget_appends_feature(reference_path):
    from diffsg_tpu.data.loaders import load_nu, load_nu_budget

    p = str(reference_path / "datasets/3u_30mW_1000samples_ood.csv")
    td = load_nu_budget(p)
    base = load_nu(p)
    assert td.X_train.shape[1] == base.X_train.shape[1] + 1
    np.testing.assert_allclose(td.X_test[:, -1], 30.0 / 18.0)
    np.testing.assert_allclose(td.X_test[:, :-1], base.X_test)
    assert td.config["p_ref"] == 18.0
    # Y stays per-row-budget normalized exactly like the base loader
    np.testing.assert_allclose(td.Y_test, base.Y_test)


def test_nu_budget_task_wiring(reference_path):
    from diffsg_tpu.tasks import TASKS

    t = TASKS["nu_budget"]
    p = str(reference_path / "datasets/3u_30mW_1000samples_ood.csv")
    d = t.load(p)
    assert t.cond_dim(d.config) == 7
    assert t.build_model(d.config).cond_dim == 7
    xu = t.unnormalize_x(d.X_test, d.config)
    np.testing.assert_allclose(xu[:, -1], 30.0)  # budget column in mW
    # objective ignores the budget column: equals the base NU rate
    import jax.numpy as jnp

    from diffsg_tpu.ops.objectives import nu_rate

    Y = jnp.asarray(t.unnormalize_y(d.Y_test, d.config), jnp.float32)
    r_task = np.asarray(t.objective(Y, jnp.asarray(xu, jnp.float32), d.config))
    r_base = np.asarray(nu_rate(Y, jnp.asarray(xu[:, :6], jnp.float32)))
    np.testing.assert_allclose(r_task, r_base)


@pytest.mark.slow
def test_budget_conditioned_training_end_to_end():
    """Train a small budget-conditioned model on two-budget oracle data and
    check (a) decoded quality on held-out rows of both budgets and (b) that
    the budget feature actually steers the sampled power split."""
    import dataclasses

    import jax.numpy as jnp

    from diffsg_tpu.data.generators import nu_coordinates_gen
    from diffsg_tpu.data.native import nu_oracle_native
    from diffsg_tpu.tasks import TASKS, evaluate
    from diffsg_tpu.data.loaders import TaskData
    from diffsg_tpu.train import train_ddpm

    task = TASKS["nu_budget"]
    w = h = 400.0
    p_ref = 18.0
    rng = np.random.default_rng(0)
    n = 240
    qs = nu_coordinates_gen(rng, n)
    budgets = np.where(np.arange(n) % 2 == 0, 9.0, 36.0)
    sol = np.zeros((n, 6))
    for b in (9.0, 36.0):
        idx = np.nonzero(budgets == b)[0]
        sol[idx] = nu_oracle_native(qs[idx], P_sum=b, grid_step=16.0)

    X = qs.copy()
    X[:, 0::2] /= w
    X[:, 1::2] /= h
    X = np.concatenate([X, budgets[:, None] / p_ref], axis=1)
    Y = sol[:, :5].copy()
    Y[:, 0] /= w
    Y[:, 1] /= h
    Y[:, 2:] /= budgets[:, None]

    cfg = dataclasses.replace(task.train_config, epochs=150, seed=0,
                              grad_clip=1.0)
    y_shift = Y.mean(axis=0)
    y_scale = 8.0
    model = task.build_model({"K": 3})
    params, _, sched = train_ddpm(model, X, (Y - y_shift) * y_scale, cfg,
                                  log_every=0)

    n_tr = 200
    for b in (9.0, 36.0):
        te = np.nonzero(budgets[n_tr:] == b)[0] + n_tr
        d = TaskData(X_train=X[:n_tr], Y_train=Y[:n_tr],
                     X_test=X[te], Y_test=Y[te],
                     config={"K": 3, "P_sum": b, "width": w, "height": h,
                             "p_ref": p_ref, "y_scale": y_scale,
                             "y_shift": [float(v) for v in y_shift]})
        m = evaluate(task, params, sched, d, omega=0.25)
        # CPU smoke bar: a 240-sample/150-epoch model reaches ~0.70-0.74
        # (measured; the task needs ~10^5 rows for the 0.9997 headline —
        # ckpts/ddpm_nu_budget + tools/headline.py cover that); this test
        # certifies the train->save->evaluate plumbing and the conditioning
        # effect, not headline quality.
        assert m["less_ratio"] > 0.6, (b, m)

    # conditioning effect: same coords, budget 9 vs 36 -> different outputs
    from diffsg_tpu.diffusion import cfg_sample

    def apply_fn(p, y, t, c, mk):
        return model.apply({"params": p}, y, t, c, mk)

    cond = jnp.asarray(X[:32].copy(), jnp.float32)
    out = {}
    for b in (9.0, 36.0):
        c = cond.at[:, -1].set(b / p_ref)
        y0, _ = cfg_sample(apply_fn, params, sched, c, omega=0.25,
                           data_dim=5, key=jax.random.PRNGKey(7))
        out[b] = np.asarray(y0)
    assert np.abs(out[9.0] - out[36.0]).mean() > 1e-3


def test_load_msr_budget_and_task_wiring(reference_path):
    """MSR instance of the budget-conditioning capability (msr_budget)."""
    from diffsg_tpu.data.loaders import load_msr, load_msr_budget
    from diffsg_tpu.tasks import TASKS

    p = str(reference_path / "datasets/3c_20w_2000samples_ood.csv")
    td = load_msr_budget(p)
    base = load_msr(p)
    assert td.X_test.shape[1] == base.X_test.shape[1] + 1
    np.testing.assert_allclose(td.X_test[:, -1], 2.0)  # W/w_ref = 20/10
    np.testing.assert_allclose(td.X_test[:, :-1], base.X_test)

    t = TASKS["msr_budget"]
    assert t.cond_dim(td.config) == 4
    assert t.build_model(td.config).cond_dim == 4
    xu = t.unnormalize_x(td.X_test, td.config)
    np.testing.assert_allclose(xu[:, -1], 20.0)
    # objective ignores the budget column
    import jax.numpy as jnp

    from diffsg_tpu.ops.objectives import msr_sum_rate

    Y = jnp.asarray(td.Y_test, jnp.float32)
    r_task = np.asarray(t.objective(Y, jnp.asarray(xu, jnp.float32), td.config))
    r_base = np.asarray(msr_sum_rate(Y, jnp.asarray(xu[:, :3], jnp.float32)))
    np.testing.assert_allclose(r_task, r_base)


def test_msr_80c_budget_ckpt_loads_and_forwards():
    """Round-4 shipped ckpt: W-conditioned 80c model (RESULTS.md "Round 4:
    the data x width x schedule cell closes 80c in-dist").  Wiring check:
    metadata arch rebuilds the net, params apply, eval budgets 20/40 are
    excluded from the training grid."""
    import jax.numpy as jnp

    from diffsg_tpu.tasks import TASKS
    from diffsg_tpu.utils import load_checkpoint

    ck = load_checkpoint("ckpts/ddpm_msr_80c_budget")
    md = ck["metadata"]
    budgets = md["budgets"]
    assert 20.0 not in budgets and 40.0 not in budgets
    assert md["dataset_config"]["proj_dim"] == 256

    t = TASKS["msr_budget"]
    model = t.build_model(md["dataset_config"])
    x = jnp.zeros((4, 81), jnp.float32)
    y = jnp.zeros((4, 80), jnp.float32)
    ts = jnp.zeros((4,), jnp.float32)
    mask = jnp.ones((4, 1), jnp.float32)
    out = model.apply({"params": ck["params"]}, y, ts, x, mask)
    assert out.shape == (4, 80)
    assert np.isfinite(np.asarray(out)).all()
