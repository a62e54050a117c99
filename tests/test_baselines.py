"""Baseline parity + behavior tests.

Checkpoint parity targets are the BASELINE.md measured values for the
shipped mtfnn_*/ppo_* checkpoints (deterministic: mean-action eval).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffsg_tpu.data import load_msr, load_nu, load_co
from diffsg_tpu.ops import msr_sum_rate, nu_rate, co_cost, nu_decode
from diffsg_tpu.baselines import (
    mtfnn_msr_model, mtfnn_nu_model, mtfnn_co_model, load_mtfnn_ckpt,
    PPOAgent, load_ppo_ckpt, ppo_predict,
    msr_gd_solve, nu_gd_solve, co_gd_solve,
)


@pytest.fixture(scope="module")
def msr_data(reference_path):
    return load_msr(str(reference_path / "datasets" / "3c_10w_10000samples.csv"))


@pytest.fixture(scope="module")
def nu_data(reference_path):
    return load_nu(str(reference_path / "datasets" / "3u_18mW_10000samples.csv"))


def _msr_less_ratio(Y_pred, td):
    mn, mx = td.config["scaler_min"], td.config["scaler_max"]
    X = jnp.asarray(td.X_test * (mx - mn) + mn, jnp.float32)
    pred = msr_sum_rate(jnp.asarray(Y_pred, jnp.float32), X)
    true = msr_sum_rate(jnp.asarray(td.Y_test, jnp.float32), X)
    return float(pred.sum() / true.sum())


def _nu_less_ratio(Y_pred, td):
    cfg = td.config
    X = np.array(td.X_test)
    X[:, 0::2] *= cfg["width"]
    X[:, 1::2] *= cfg["height"]
    Yt = np.array(td.Y_test)
    Yt[:, 0] *= cfg["width"]
    Yt[:, 1] *= cfg["height"]
    Yt[:, 2:] *= cfg["P_sum"]
    pred = nu_rate(jnp.asarray(Y_pred, jnp.float32), jnp.asarray(X, jnp.float32))
    true = nu_rate(jnp.asarray(Yt, jnp.float32), jnp.asarray(X, jnp.float32))
    return float(np.asarray(pred).sum() / np.asarray(true).sum())


# --- MTFNN ckpt parity ---------------------------------------------------------


def test_mtfnn_msr_ckpt_parity(reference_path, msr_data):
    params = load_mtfnn_ckpt(str(reference_path / "ckpts" / "mtfnn_msr_3c.pt"), 4)
    model = mtfnn_msr_model(3)
    Y_pred = model.apply({"params": params}, jnp.asarray(msr_data.X_test, jnp.float32))
    ratio = _msr_less_ratio(np.asarray(Y_pred) * msr_data.config["W"], msr_data)
    assert abs(ratio - 0.99917) < 2e-3, ratio


def test_mtfnn_nu_ckpt_parity(reference_path, nu_data):
    params = load_mtfnn_ckpt(str(reference_path / "ckpts" / "mtfnn_nu.pt"), 5)
    model = mtfnn_nu_model(3)
    Y_pred = np.array(
        model.apply({"params": params}, jnp.asarray(nu_data.X_test, jnp.float32))
    )
    cfg = nu_data.config
    Y_pred[:, 0] *= cfg["width"]
    Y_pred[:, 1] *= cfg["height"]
    Y_pred[:, 2:] *= cfg["P_sum"]
    ratio = _nu_less_ratio(Y_pred, nu_data)
    assert abs(ratio - 0.93336) < 2e-3, ratio


def _co_exceeded_ratio(Y_pred, td):
    mn, mx = td.config["scaler_min"], td.config["scaler_max"]
    X = jnp.asarray(td.X_test * (mx - mn) + mn, jnp.float32)
    pred = co_cost(X, jnp.asarray(Y_pred, jnp.float32))
    true = co_cost(X, jnp.asarray(td.Y_test, jnp.float32))
    return float(pred.sum() / true.sum())


@pytest.fixture(scope="module")
def co_ood_data(reference_path):
    return load_co(str(reference_path / "datasets" / "3nodes_2000samples_ood.csv"))


def test_mtfnn_co_ckpt_parity(reference_path, co_ood_data):
    """mtfnn_co.pt through the converted pipeline on the reference OOD split
    (the 50k train CSV is a regenerated blob; the OOD CSV is reference-
    shipped, so this ratio is a pure reference-artifact number)."""
    params = load_mtfnn_ckpt(str(reference_path / "ckpts" / "mtfnn_co.pt"), 4)
    model = mtfnn_co_model()
    Y_pred = model.apply({"params": params},
                         jnp.asarray(co_ood_data.X_test, jnp.float32))
    ratio = _co_exceeded_ratio(np.asarray(Y_pred), co_ood_data)
    assert abs(ratio - 1.08345) < 2e-3, ratio


def test_ppo_co_ckpt_parity(reference_path, co_ood_data):
    """ppo_co.pt (PPO.py:102-213), mean-action eval, softmax action ->
    exceeded ratio — the weakest reference baseline on CO (~1.59)."""
    params = load_ppo_ckpt(str(reference_path / "ckpts" / "ppo_co.pt"))
    agent = PPOAgent(state_dim=9, action_dim=3)
    Y_pred = ppo_predict(agent, params, co_ood_data.X_test,
                         lambda a: jax.nn.softmax(a, axis=1))
    ratio = _co_exceeded_ratio(np.asarray(Y_pred), co_ood_data)
    assert abs(ratio - 1.59489) < 2e-2, ratio


@pytest.fixture(scope="module")
def msr80_data():
    """The 80c dataset is a regenerable missing-blob (KNOWN_DATASETS recipe,
    seconds) — regenerate on demand rather than silently skipping the two
    80c ckpt-parity tests on a fresh checkout."""
    import pathlib
    import sys

    repo = pathlib.Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo))
    from tools.make_datasets import ensure_datasets

    ensure_datasets(["80c_20w_10000samples.csv"])
    return load_msr(str(repo / "datasets" / "80c_20w_10000samples.csv"))


def test_mtfnn_msr_80c_ckpt_parity(reference_path, msr80_data):
    """mtfnn_msr_80c.pt on the REGENERATED 80c dataset (original blob
    missing): the ckpt was trained on the lost original, so this measures
    the artifact on a same-generator re-draw, not its own test split."""
    params = load_mtfnn_ckpt(
        str(reference_path / "ckpts" / "mtfnn_msr_80c.pt"), 4)
    model = mtfnn_msr_model(80)
    Y_pred = model.apply({"params": params},
                         jnp.asarray(msr80_data.X_test, jnp.float32))
    ratio = _msr_less_ratio(np.asarray(Y_pred) * msr80_data.config["W"],
                            msr80_data)
    assert abs(ratio - 0.84436) < 1e-2, ratio


def test_ppo_msr_80c_ckpt_parity(reference_path, msr80_data):
    """ppo_msr_80c.pt, mean-action eval, on the regenerated 80c dataset."""
    params = load_ppo_ckpt(str(reference_path / "ckpts" / "ppo_msr_80c.pt"))
    agent = PPOAgent(state_dim=80, action_dim=80)
    W = msr80_data.config["W"]
    Y_pred = ppo_predict(agent, params, msr80_data.X_test,
                         lambda a: jax.nn.softmax(a, axis=1) * W)
    ratio = _msr_less_ratio(np.asarray(Y_pred), msr80_data)
    assert abs(ratio - 0.80475) < 1e-2, ratio


# --- PPO ckpt parity ------------------------------------------------------------


def test_ppo_msr_ckpt_parity(reference_path, msr_data):
    params = load_ppo_ckpt(str(reference_path / "ckpts" / "ppo_msr_3c.pt"))
    agent = PPOAgent(state_dim=3, action_dim=3)
    W = msr_data.config["W"]
    Y_pred = ppo_predict(agent, params, msr_data.X_test,
                         lambda a: jax.nn.softmax(a, axis=1) * W)
    ratio = _msr_less_ratio(np.asarray(Y_pred), msr_data)
    assert abs(ratio - 0.99792) < 2e-3, ratio


def test_ppo_nu_ckpt_parity(reference_path, nu_data):
    params = load_ppo_ckpt(str(reference_path / "ckpts" / "ppo_nu.pt"))
    agent = PPOAgent(state_dim=6, action_dim=5)
    cfg = nu_data.config
    Y_pred = ppo_predict(
        agent, params, nu_data.X_test,
        lambda a: nu_decode(a, cfg["width"], cfg["height"], cfg["P_sum"]),
    )
    ratio = _nu_less_ratio(np.asarray(Y_pred), nu_data)
    assert abs(ratio - 0.56615) < 2e-2, ratio


# --- GD behavior -----------------------------------------------------------------


def test_msr_gd(msr_data):
    td = msr_data
    mn, mx = td.config["scaler_min"], td.config["scaler_max"]
    g = jnp.asarray(td.X_test[:512] * (mx - mn) + mn, jnp.float32)
    p = msr_gd_solve(g, W=td.config["W"])
    np.testing.assert_allclose(np.asarray(p).sum(1), td.config["W"], rtol=1e-4)
    pred = msr_sum_rate(p, g)
    true = msr_sum_rate(jnp.asarray(td.Y_test[:512], jnp.float32), g)
    ratio = float(pred.sum() / true.sum())
    assert 0.8 < ratio < 1.2, ratio


def test_nu_gd(nu_data):
    td = nu_data
    cfg = td.config
    # the reference feeds loader-normalized coords to the gradient (GD.py:131)
    X_norm = jnp.asarray(td.X_test[:512], jnp.float32)
    X = np.array(td.X_test[:512])
    X[:, 0::2] *= cfg["width"]
    X[:, 1::2] *= cfg["height"]
    sol = nu_gd_solve(X_norm, P_sum=cfg["P_sum"])
    np.testing.assert_allclose(np.asarray(sol)[:, 2:].sum(1), cfg["P_sum"], rtol=1e-4)
    Yt = np.array(td.Y_test[:512])
    Yt[:, 0] *= cfg["width"]
    Yt[:, 1] *= cfg["height"]
    Yt[:, 2:] *= cfg["P_sum"]
    pred = np.asarray(nu_rate(jnp.asarray(sol, jnp.float32), jnp.asarray(X, jnp.float32)))
    true = np.asarray(nu_rate(jnp.asarray(Yt, jnp.float32), jnp.asarray(X, jnp.float32)))
    ratio = pred.sum() / true.sum()
    assert np.isfinite(ratio), ratio


def test_co_gd(reference_path):
    td = load_co(str(reference_path / "datasets" / "3nodes_2000samples_ood.csv"))
    mn, mx = td.config["scaler_min"], td.config["scaler_max"]
    X = jnp.asarray(td.X_test * (mx - mn) + mn, jnp.float32)
    shares = co_gd_solve(X)
    assert shares.shape == (td.X_test.shape[0], 3)
    cost = co_cost(X, shares)
    assert bool(jnp.all(jnp.isfinite(cost)))


def test_waterfilling_is_optimal(msr_data):
    """Waterfilling beats every feasible competitor and satisfies KKT."""
    from diffsg_tpu.baselines import waterfilling

    td = msr_data
    mn, mx = td.config["scaler_min"], td.config["scaler_max"]
    g = jnp.asarray(td.X_test[:256] * (mx - mn) + mn, jnp.float32)
    W = td.config["W"]
    p = waterfilling(g, W)
    np.testing.assert_allclose(np.asarray(p).sum(1), W, rtol=1e-5)
    assert np.asarray(p).min() >= 0
    wf_rate = np.asarray(msr_sum_rate(p, g))
    # beats uniform and the GD solution on every sample (up to f32 noise)
    uni_rate = np.asarray(msr_sum_rate(jnp.full_like(g, W / 3), g))
    gd_rate = np.asarray(msr_sum_rate(msr_gd_solve(g, W=W), g))
    assert np.all(wf_rate >= uni_rate - 1e-4)
    assert np.all(wf_rate >= gd_rate - 1e-4)
    # KKT: active channels share one water level mu = p + 1/g
    mu = np.asarray(p + 1.0 / g)
    act = np.asarray(p) > 1e-6
    for i in range(8):
        lv = mu[i][act[i]]
        np.testing.assert_allclose(lv, lv[0], rtol=1e-4)


# --- GEKKO oracle: executed via the scipy backend --------------------------------


def test_gekko_msr_scipy_matches_waterfilling(msr_data):
    """The MSR NLP formulation, actually solved: must hit the exact
    waterfilling optimum (published IPOPT ratio: 1.0000000003)."""
    from diffsg_tpu.baselines.gekko_oracle import msr_solve_scipy
    from diffsg_tpu.baselines.waterfilling import waterfilling

    td = msr_data
    mn, mx = td.config["scaler_min"], td.config["scaler_max"]
    W = td.config["W"]
    G = td.X_test[:5] * (mx - mn) + mn
    P = np.stack([msr_solve_scipy(g, W) for g in G])
    np.testing.assert_allclose(P.sum(1), W, rtol=1e-8)
    wf = np.asarray(waterfilling(jnp.asarray(G, jnp.float32), W))
    r_slsqp = np.asarray(msr_sum_rate(jnp.asarray(P, jnp.float32),
                                      jnp.asarray(G, jnp.float32)))
    r_wf = np.asarray(msr_sum_rate(jnp.asarray(wf, jnp.float32),
                                   jnp.asarray(G, jnp.float32)))
    # SLSQP reaches the exact optimum (the lb=0.01 box off the true
    # waterfilling solution costs < 1e-4 relative)
    assert (r_slsqp.sum() / r_wf.sum()) > 1.0 - 1e-4
    # and beats the dataset labels like the published 1.0000000003
    ratio = float(r_slsqp.sum()
                  / np.asarray(msr_sum_rate(jnp.asarray(td.Y_test[:5], jnp.float32),
                                            jnp.asarray(G, jnp.float32))).sum())
    assert ratio > 0.9999


def test_gekko_co_scipy_exact_vs_labels(reference_path):
    """The CO MINLP formulation, solved exactly by decision enumeration:
    labels are min-cost, so exceeded ratio == 1 (published APOPT: 1.005359,
    i.e. branch-and-bound leaves ~0.5% on the table)."""
    from diffsg_tpu.baselines.gekko_oracle import co_solve_scipy, PUBLISHED

    td = load_co("datasets/3nodes_50000samples_new.csv")
    mn, mx = td.config["scaler_min"], td.config["scaler_max"]
    X = td.X_test[:20] * (mx - mn) + mn
    Y = np.stack([co_solve_scipy(x) for x in X])
    pred = np.asarray(co_cost(jnp.asarray(X, jnp.float32),
                              jnp.asarray(Y, jnp.float32)))
    true = np.asarray(co_cost(jnp.asarray(X, jnp.float32),
                              jnp.asarray(td.Y_test[:20], jnp.float32)))
    ratio = float(pred.sum() / true.sum())
    assert abs(ratio - 1.0) < 1e-5
    assert ratio <= PUBLISHED["co"]["exceeded_ratio"]


def test_gekko_nu_scipy_correct_scale_beats_published(nu_data):
    """The NU NLP on correctly-scaled (meter) coordinates lands near the
    oracle labels — the published 0.485 is the reference's coordinate-
    scaling quirk, not the formulation's ceiling."""
    from diffsg_tpu.baselines.gekko_oracle import nu_solve_scipy

    td = nu_data
    cfg = td.config
    n = 4
    X = np.array(td.X_test[:n])
    X[:, 0::2] *= cfg["width"]
    X[:, 1::2] *= cfg["height"]
    Y = np.stack([nu_solve_scipy(x, cfg["P_sum"]) for x in X])
    np.testing.assert_allclose(Y[:, 2:].sum(1), cfg["P_sum"], rtol=1e-6)
    Yt = np.array(td.Y_test[:n])
    Yt[:, 0] *= cfg["width"]
    Yt[:, 1] *= cfg["height"]
    Yt[:, 2:] *= cfg["P_sum"]
    pred = np.asarray(nu_rate(jnp.asarray(Y, jnp.float32),
                              jnp.asarray(X, jnp.float32)))
    true = np.asarray(nu_rate(jnp.asarray(Yt, jnp.float32),
                              jnp.asarray(X, jnp.float32)))
    assert pred.sum() / true.sum() > 0.95


def test_gekko_nu_scipy_reproduces_published_misscaling(nu_data):
    """Feeding loader-normalized 0..1 coordinates (exactly what the
    reference's sBB_nu does, GEKKO.py:160) collapses the less ratio to
    ~0.5 — reproducing the published 0.485004."""
    from diffsg_tpu.baselines.gekko_oracle import nu_solve_scipy

    td = nu_data
    cfg = td.config
    n = 4
    Xn = np.array(td.X_test[:n])              # normalized, as the reference
    Y = np.stack([nu_solve_scipy(x, cfg["P_sum"]) for x in Xn])
    X = np.array(td.X_test[:n])
    X[:, 0::2] *= cfg["width"]
    X[:, 1::2] *= cfg["height"]
    Yt = np.array(td.Y_test[:n])
    Yt[:, 0] *= cfg["width"]
    Yt[:, 1] *= cfg["height"]
    Yt[:, 2:] *= cfg["P_sum"]
    pred = np.asarray(nu_rate(jnp.asarray(Y, jnp.float32),
                              jnp.asarray(X, jnp.float32)))
    true = np.asarray(nu_rate(jnp.asarray(Yt, jnp.float32),
                              jnp.asarray(X, jnp.float32)))
    ratio = pred.sum() / true.sum()
    assert 0.3 < ratio < 0.7, ratio


# --- From-scratch retrain parity (round 4) --------------------------------------
#
# ckpts/retrain_* were produced by tools/train_baselines.py with the exact
# reference recipes (MTFNN.py:29-287, PPO.py:102-484).  Pinned values are the
# metrics printed at train time; eval here is deterministic, so tolerances are
# tight.  Where a retrain lands below the shipped reference ckpt (MTFNN-NU,
# PPO-NU), tools/ref_retrain_probe.py reran the REFERENCE'S OWN torch recipe
# and landed in the same cluster — see docs/RESULTS.md "From-scratch baseline
# retrains".

RETRAIN_PINS = {
    # dir, pinned ratio, higher_is_better
    "retrain_mtfnn_co": ("exceeded_ratio", 1.06299),
    "retrain_mtfnn_nu": ("less_ratio", 0.89001),
    "retrain_ppo_msr_3c": ("less_ratio", 0.99895),
    "retrain_ppo_co": ("exceeded_ratio", 1.59212),
    "retrain_ppo_nu": ("less_ratio", 0.46586),
}


def _retrain_eval(name, reference_path):
    import pathlib

    from diffsg_tpu.tasks import TASKS
    from diffsg_tpu.tasks.base import objective_metrics
    from diffsg_tpu.utils import load_checkpoint

    d = pathlib.Path("ckpts") / name
    if not d.exists():
        pytest.skip(f"{name} checkpoint missing")
    ck = load_checkpoint(str(d))
    meta = ck["metadata"]
    task = TASKS[meta["task"]]
    ds = meta["dataset"]
    if ds.startswith("/root/reference"):
        ds = str(reference_path / "datasets" / ds.split("/")[-1])
    td = task.load(ds)
    cfg = td.config
    params = ck["params"]

    if meta["algo"] == "mtfnn":
        if meta["task"] == "msr":
            model = mtfnn_msr_model(cfg["M"])
            Y_pred = np.asarray(model.apply(
                {"params": params}, jnp.asarray(td.X_test, jnp.float32))) * cfg["W"]
        elif meta["task"] == "co":
            model = mtfnn_co_model()
            Y_pred = np.asarray(model.apply(
                {"params": params}, jnp.asarray(td.X_test, jnp.float32)))
        else:
            model = mtfnn_nu_model(cfg["K"])
            Y_pred = np.array(model.apply(
                {"params": params}, jnp.asarray(td.X_test, jnp.float32)))
            Y_pred[:, 0] *= cfg["width"]
            Y_pred[:, 1] *= cfg["height"]
            Y_pred[:, 2:] *= cfg["P_sum"]
    else:
        if meta["task"] == "msr":
            agent = PPOAgent(cfg["M"], cfg["M"])
            tf = lambda a: jax.nn.softmax(a, axis=1) * cfg["W"]
        elif meta["task"] == "co":
            agent = PPOAgent(3 * cfg["node_num"], cfg["node_num"])
            tf = lambda a: jax.nn.softmax(a, axis=1)
        else:
            agent = PPOAgent(2 * cfg["K"], 2 + cfg["K"])
            tf = lambda a: nu_decode(a, cfg["width"], cfg["height"], cfg["P_sum"])
        Y_pred = np.asarray(ppo_predict(agent, params, td.X_test, tf))

    return objective_metrics(task, td, Y_pred)


@pytest.mark.parametrize("name", sorted(RETRAIN_PINS))
def test_retrain_ckpt_reproduces_pinned_quality(name, reference_path):
    key, pin = RETRAIN_PINS[name]
    metrics = _retrain_eval(name, reference_path)
    assert abs(metrics[key] - pin) < 2e-3, metrics
