"""Universal NU (``nu_geo``): budget AND field-geometry conditioned.

The third trained instance of the reference's designed-but-disabled
conditioning capability (``condition_C``/``cdim``,
``classifier_free_NU.py:35-75``): the condition carries
``[P_sum/18, W/400, H/400]`` so one model serves any budget on any
rectangular service area.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_load_nu_geo_appends_features(reference_path):
    from diffsg_tpu.data.loaders import load_nu, load_nu_geo

    p = str(reference_path / "datasets/3u_30mW_1000samples_ood.csv")
    td = load_nu_geo(p, width=500.0, height=250.0)
    base = load_nu(p, width=500.0, height=250.0)
    assert td.X_test.shape[1] == base.X_test.shape[1] + 3
    np.testing.assert_allclose(td.X_test[:, -3], 30.0 / 18.0)
    np.testing.assert_allclose(td.X_test[:, -2], 500.0 / 400.0)
    np.testing.assert_allclose(td.X_test[:, -1], 250.0 / 400.0)
    np.testing.assert_allclose(td.X_test[:, :-3], base.X_test)
    np.testing.assert_allclose(td.Y_test, base.Y_test)


def test_nu_geo_task_wiring_and_per_row_decode(reference_path):
    from diffsg_tpu.ops.objectives import nu_rate
    from diffsg_tpu.tasks import TASKS

    t = TASKS["nu_geo"]
    p = str(reference_path / "datasets/3u_30mW_1000samples_ood.csv")
    d = t.load(p)
    assert t.cond_dim(d.config) == 9
    assert t.build_model(d.config).cond_dim == 9

    xu = t.unnormalize_x(d.X_test, d.config)
    np.testing.assert_allclose(xu[:, 6], 30.0)   # budget (mW)
    np.testing.assert_allclose(xu[:, 7], 400.0)  # width
    np.testing.assert_allclose(xu[:, 8], 400.0)  # height
    # coordinates come back in meters
    base_coords = np.array(d.X_test[:, :6]) * 400.0
    np.testing.assert_allclose(xu[:, :6], base_coords, rtol=1e-12)

    # objective sees only coords — equals the base NU rate
    Y = jnp.asarray(t.unnormalize_y(d.Y_test, d.config), jnp.float32)
    r_task = np.asarray(t.objective(Y, jnp.asarray(xu, jnp.float32),
                                    d.config))
    r_base = np.asarray(nu_rate(Y, jnp.asarray(xu[:, :6], jnp.float32)))
    np.testing.assert_allclose(r_task, r_base)

    # decode_with_x is strictly per-row: a MIXED-geometry/budget batch
    # lands every row in its OWN box and budget simplex
    rng = np.random.default_rng(0)
    B = 16
    X_unnorm = np.zeros((B, 9))
    X_unnorm[:, :6] = rng.uniform(0, 200, (B, 6))
    X_unnorm[:, 6] = rng.choice([9.0, 24.0, 36.0], B)       # budgets
    X_unnorm[:, 7] = rng.choice([200.0, 480.0, 600.0], B)   # widths
    X_unnorm[:, 8] = rng.choice([240.0, 360.0, 520.0], B)   # heights
    cfg = dict(d.config)
    cfg.update({"y_scale": 8.0, "y_shift": [0.4, 0.4, 0.33, 0.33, 0.33]})
    Y_raw = jnp.asarray(rng.normal(0, 4, (B, 5)), jnp.float32)
    dec = np.asarray(t.decode_with_x(Y_raw, jnp.asarray(X_unnorm,
                                                        jnp.float32), cfg))
    assert (dec[:, 0] >= 0).all() and (dec[:, 0] <= X_unnorm[:, 7]).all()
    assert (dec[:, 1] >= 0).all() and (dec[:, 1] <= X_unnorm[:, 8]).all()
    assert dec[:, 2:].min() >= -1e-5
    np.testing.assert_allclose(dec[:, 2:].sum(axis=1), X_unnorm[:, 6],
                               rtol=1e-5)

    # feasibility projection (refinement support) is per-row too
    proj = np.asarray(t.project(jnp.asarray(dec * 1.7, jnp.float32),
                                jnp.asarray(X_unnorm, jnp.float32), cfg))
    assert (proj[:, 0] <= X_unnorm[:, 7] + 1e-5).all()
    assert (proj[:, 1] <= X_unnorm[:, 8] + 1e-5).all()
    np.testing.assert_allclose(proj[:, 2:].sum(axis=1), X_unnorm[:, 6],
                               rtol=1e-5)


def test_normalize_rows_geo_round_trip():
    from tools.train_nu_geo import normalize_rows_geo

    rng = np.random.default_rng(1)
    n = 32
    raw = np.zeros((n, 15))
    raw[:, 13] = rng.choice([200.0, 480.0], n)   # W
    raw[:, 14] = rng.choice([240.0, 600.0], n)   # H
    raw[:, 12] = rng.choice([9.0, 33.0], n)      # P
    raw[:, 0:6:2] = rng.uniform(0, 1, (n, 3)) * raw[:, 13:14]
    raw[:, 1:6:2] = rng.uniform(0, 1, (n, 3)) * raw[:, 14:15]
    raw[:, 6] = rng.uniform(0, 1, n) * raw[:, 13]
    raw[:, 7] = rng.uniform(0, 1, n) * raw[:, 14]
    pw = rng.dirichlet(np.ones(3), n) * raw[:, 12:13]
    raw[:, 8:11] = pw

    X, Y = normalize_rows_geo(raw)
    assert X.shape == (n, 9) and Y.shape == (n, 5)
    assert X[:, :6].min() >= 0 and X[:, :6].max() <= 1 + 1e-12
    assert Y.min() >= 0 and Y.max() <= 1 + 1e-12
    np.testing.assert_allclose(Y[:, 2:].sum(axis=1), 1.0, rtol=1e-12)
    # the task's unnormalize_x inverts the tool's normalization exactly
    from diffsg_tpu.tasks import TASKS

    xu = TASKS["nu_geo"].unnormalize_x(X, {"K": 3, "p_ref": 18.0,
                                           "w_ref": 400.0, "h_ref": 400.0})
    np.testing.assert_allclose(xu[:, :6], raw[:, :6], rtol=1e-12)
    np.testing.assert_allclose(xu[:, 6], raw[:, 12], rtol=1e-12)
    np.testing.assert_allclose(xu[:, 7], raw[:, 13], rtol=1e-12)
    np.testing.assert_allclose(xu[:, 8], raw[:, 14], rtol=1e-12)


def test_assemble_training_rows_folds_specialist_data(tmp_path,
                                                      reference_path):
    """The densified universal recipe trains on everything the blind
    nu_budget specialist saw: 15-col geo CSVs as-is, the 13-col multi-budget
    CSV at W=H=400, and the reference 18 mW TRAIN split (first 70% of the
    unshuffled CSV, ``classifier_free_NU.py:206-208``) at P=18, W=H=400."""
    from tools.train_nu_geo import assemble_training_rows

    rng = np.random.default_rng(3)
    geo = rng.uniform(0, 1, (5, 15))
    bud = rng.uniform(0, 1, (4, 13))
    gp, bp = tmp_path / "geo.csv", tmp_path / "bud.csv"
    np.savetxt(gp, geo, delimiter=",")
    np.savetxt(bp, bud, delimiter=",")
    ref_csv = str(reference_path / "datasets/3u_18mW_10000samples.csv")
    n_ref = sum(1 for _ in open(ref_csv))

    rows = assemble_training_rows([str(gp), str(gp)], budget_path=str(bp),
                                  indist_path=ref_csv)
    n_tr = int(n_ref * 0.7)
    assert rows.shape == (10 + 4 + n_tr, 15)
    np.testing.assert_allclose(rows[:5], geo, rtol=1e-12)
    np.testing.assert_allclose(rows[10:14, :13], bud, rtol=1e-12)
    np.testing.assert_allclose(rows[10:14, 13:], 400.0)   # budget CSV geometry
    ref_rows = rows[14:]
    np.testing.assert_allclose(ref_rows[:, 12], 18.0)     # P_sum
    np.testing.assert_allclose(ref_rows[:, 13:], 400.0)   # W, H
    # first reference row is the CSV's first row (train split is a prefix)
    import pandas as pd

    head = np.array(pd.read_csv(ref_csv, header=None, nrows=1))[0]
    np.testing.assert_allclose(ref_rows[0, :12], head, rtol=1e-12)

    # geo-only call is unchanged by the optional parts
    only = assemble_training_rows([str(gp)])
    np.testing.assert_allclose(only, geo, rtol=1e-12)


def test_augment_geo_stays_in_field():
    from tools.train_nu_geo import augment_geo

    rng = np.random.default_rng(2)
    n = 24
    raw = np.zeros((n, 15))
    raw[:, 13] = rng.choice([240.0, 520.0], n)
    raw[:, 14] = rng.choice([200.0, 600.0], n)
    raw[:, 12] = 18.0
    # users well inside each field; UAV inside the user triangle (the
    # oracle invariant the augmenter's translate bound relies on)
    raw[:, 0:6:2] = rng.uniform(0.1, 0.6, (n, 3)) * raw[:, 13:14]
    raw[:, 1:6:2] = rng.uniform(0.1, 0.6, (n, 3)) * raw[:, 14:15]
    raw[:, 6] = raw[:, 0:6:2].mean(axis=1)
    raw[:, 7] = raw[:, 1:6:2].mean(axis=1)
    raw[:, 8:11] = 6.0
    raw[:, 11] = 1.0

    ext = augment_geo(raw, times=3, seed=0)
    assert ext.shape == (n * 3, 15)
    # trailing physics columns ride along untouched; rate preserved
    for col in (11, 12):
        assert set(np.unique(ext[:, col])) <= set(np.unique(raw[:, col]))
    # coords stay inside each row's OWN field (smidge of slack: the
    # reference's flip+rotate can push boundary points epsilon outside)
    assert (ext[:, 0:8:2] <= ext[:, 13:14] + 1.0).all()
    assert (ext[:, 1:8:2] <= ext[:, 14:15] + 1.0).all()
    assert (ext[:, 0:8:2] >= -1.0).all() and (ext[:, 1:8:2] >= -1.0).all()


@pytest.mark.slow
def test_geo_conditioned_training_end_to_end():
    """Train a tiny geometry+budget conditioned model on two-geometry
    oracle data; check decoded quality on held-out rows of both geometries
    and that the geometry feature steers the sampled UAV position."""
    import dataclasses

    from diffsg_tpu.data.generators import nu_coordinates_gen
    from diffsg_tpu.data.native import nu_oracle_native
    from diffsg_tpu.data.loaders import TaskData
    from diffsg_tpu.tasks import TASKS, evaluate
    from diffsg_tpu.train import train_ddpm

    task = TASKS["nu_geo"]
    p_ref, w_ref, h_ref = 18.0, 400.0, 400.0
    rng = np.random.default_rng(0)
    n = 240
    geoms = [(200.0, 200.0), (600.0, 600.0)]
    which = np.arange(n) % 2
    qs = np.zeros((n, 6))
    sol = np.zeros((n, 6))
    for g, (w, h) in enumerate(geoms):
        idx = np.nonzero(which == g)[0]
        qs[idx] = nu_coordinates_gen(rng, idx.size, width=int(w),
                                     height=int(h))
        sol[idx] = nu_oracle_native(qs[idx], P_sum=18.0, grid_step=24.0,
                                    width=w, height=h)

    W_row = np.where(which == 0, 200.0, 600.0)
    H_row = W_row.copy()
    X = qs.copy()
    X[:, 0::2] /= W_row[:, None]
    X[:, 1::2] /= H_row[:, None]
    X = np.concatenate([X, np.full((n, 1), 1.0), (W_row / w_ref)[:, None],
                        (H_row / h_ref)[:, None]], axis=1)
    Y = sol[:, :5].copy()
    Y[:, 0] /= W_row
    Y[:, 1] /= H_row
    Y[:, 2:] /= 18.0

    cfg = dataclasses.replace(task.train_config, epochs=150, seed=0,
                              grad_clip=1.0)
    y_shift = Y.mean(axis=0)
    y_scale = 8.0
    model = task.build_model({"K": 3})
    params, _, sched = train_ddpm(model, X, (Y - y_shift) * y_scale, cfg,
                                  log_every=0)

    n_tr = 200
    for g, (w, h) in enumerate(geoms):
        te = np.nonzero(which[n_tr:] == g)[0] + n_tr
        d = TaskData(X_train=X[:n_tr], Y_train=Y[:n_tr],
                     X_test=X[te], Y_test=Y[te],
                     config={"K": 3, "P_sum": 18.0, "width": w, "height": h,
                             "p_ref": p_ref, "w_ref": w_ref, "h_ref": h_ref,
                             "y_scale": y_scale,
                             "y_shift": [float(v) for v in y_shift]})
        m = evaluate(task, params, sched, d, omega=0.25)
        # CPU smoke bar (same spirit as the nu_budget e2e test): certifies
        # the train->evaluate plumbing and the conditioning effect, not
        # headline quality (that takes ~10^5 rows; see tools/train_nu_geo).
        # Bar is lower than nu_budget's: two geometries split the same 240
        # rows (measured 0.60/0.72 at this configuration).
        assert m["less_ratio"] > 0.55, ((w, h), m)

    # conditioning effect: same normalized coords, 200-field vs 600-field
    # -> different decoded UAV positions (in meters)
    from diffsg_tpu.tasks.base import sample_solutions

    Xs = X[:32].copy()
    out = {}
    for g, (w, h) in enumerate(geoms):
        Xs2 = Xs.copy()
        Xs2[:, 7] = w / w_ref
        Xs2[:, 8] = h / h_ref
        cfg_d = {"K": 3, "P_sum": 18.0, "width": w, "height": h,
                 "p_ref": p_ref, "w_ref": w_ref, "h_ref": h_ref,
                 "y_scale": y_scale, "y_shift": [float(v) for v in y_shift]}
        dec, _ = sample_solutions(task, params, sched, Xs2, cfg_d,
                                  omega=0.25, seed=7)
        out[g] = dec
    assert np.abs(out[0][:, :2] - out[1][:, :2]).mean() > 1.0


def test_solver_serves_mixed_geometry_batch():
    """Production path: ONE ``serve.Solver`` over the universal checkpoint
    solves a single batch that mixes budgets AND field geometries.  Every
    row must come back feasible in its own box/simplex, and the decoded
    rates must beat each set's oracle grid labels in aggregate (the
    self-improved model measures 1.23x-2.01x per set; bar 1.02)."""
    import jax.numpy as jnp

    from diffsg_tpu.ops.objectives import nu_rate
    from diffsg_tpu.serve import Solver
    from diffsg_tpu.tasks import TASKS
    from tools.make_datasets import ensure_datasets

    sets = [("datasets/3u_geo600x600_33mW_500samples.csv", 600.0, 600.0, 33.0),
            ("datasets/3u_geo200x200_12mW_500samples.csv", 200.0, 200.0, 12.0),
            ("datasets/3u_geo480x360_21mW_1000samples.csv", 480.0, 360.0, 21.0)]
    ensure_datasets([s[0].split("/")[-1] for s in sets])

    n = 16
    task = TASKS["nu_geo"]
    X_parts, R_parts, WHP = [], [], []
    for path, w, h, p in sets:
        d = task.load(path, width=w, height=h, P_sum=p)
        X_parts.append(np.asarray(d.X_test[:n], float))
        R_parts.append(np.asarray(d.R_test[:n], float))
        WHP.append(np.tile([w, h, p], (n, 1)))
    X = np.concatenate(X_parts)
    R_label = np.concatenate(R_parts)
    WHP = np.concatenate(WHP)

    solver = Solver.from_checkpoint("ckpts/ddpm_nu_geo_refined",
                                    task="nu_geo")
    Y = np.asarray(solver.solve(X, omega=0.5, seed=0))

    # per-row feasibility in each row's OWN geometry and budget
    assert (Y[:, 0] >= 0).all() and (Y[:, 0] <= WHP[:, 0]).all()
    assert (Y[:, 1] >= 0).all() and (Y[:, 1] <= WHP[:, 1]).all()
    assert Y[:, 2:].min() >= -1e-4
    np.testing.assert_allclose(Y[:, 2:].sum(axis=1), WHP[:, 2], rtol=1e-4)

    # aggregate quality: beats the oracle grid labels on every sub-set
    coords = task.unnormalize_x(X, solver.config)[:, :6]
    rate = np.asarray(nu_rate(jnp.asarray(Y, jnp.float32),
                              jnp.asarray(coords, jnp.float32)))
    for g in range(3):
        sl = slice(g * n, (g + 1) * n)
        ratio = rate[sl].sum() / R_label[sl].sum()
        assert ratio > 1.02, (sets[g][0], ratio)
