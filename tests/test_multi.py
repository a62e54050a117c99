"""Multi-task (one net for MSR+CO+NU) wrapper tests — CPU.

Covers the shared-canvas embedding, the condition adapter, the cropping
decodes, and a tiny end-to-end train->sample->feasibility smoke across all
three wrapper tasks sharing one parameter set.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffsg_tpu.data.loaders import load_co, load_msr, load_nu_budget
from diffsg_tpu.tasks import TASKS
from diffsg_tpu.tasks.multi import (COND_UNI, D_UNI, PAYLOAD, SLOTS,
                                    embed_cond_np, embed_y_np,
                                    merge_multi_config, unet_multi)

REF = "/root/reference/datasets"


def test_embed_cond_layout():
    X = np.arange(12, dtype=np.float32).reshape(2, 6)
    E = embed_cond_np(X, "nu")
    assert E.shape == (2, COND_UNI)
    # one-hot slot
    np.testing.assert_array_equal(E[:, :3], [[0, 0, 1], [0, 0, 1]])
    # payload then zero pad
    np.testing.assert_array_equal(E[:, 3:9], X)
    np.testing.assert_array_equal(E[:, 9:], 0.0)
    # distinct slots
    assert embed_cond_np(X, "msr")[0, 0] == 1.0
    assert embed_cond_np(X, "co")[0, 1] == 1.0


def test_embed_y_pads_to_canvas():
    Y = np.ones((3, 3), np.float32)
    P = embed_y_np(Y)
    assert P.shape == (3, D_UNI)
    np.testing.assert_array_equal(P[:, 3:], 0.0)


def test_adapter_matches_manual_padding():
    """The wrapper's apply == the raw net on a manually padded condition."""
    cfg = {"M": 3, "W": 10.0, "proj_dim": 8, "dims": (8, 4)}
    task = TASKS["multi_msr"]
    model = task.build_model(cfg)
    key = jax.random.PRNGKey(0)
    y = jnp.ones((4, D_UNI))
    t = jnp.zeros((4,))
    cond = jnp.arange(12, dtype=jnp.float32).reshape(4, 3) / 12.0
    mask = jnp.ones((4, 1))
    variables = model.init(key, y, t, cond, mask)

    out = model.apply(variables, y, t, cond, mask)
    assert out.shape == (4, D_UNI)

    inner = unet_multi(8, (8, 4))
    cond_pad = jnp.concatenate(
        [jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (4, 1)), cond,
         jnp.zeros((4, PAYLOAD - 3))], axis=1)
    ref = inner.apply(variables, y, t, cond_pad, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=0, atol=0)


def test_wrapper_decode_crops_canvas():
    """multi_* decodes == specialist decodes on the cropped canvas."""
    rng = np.random.default_rng(0)
    Y5 = jnp.asarray(rng.normal(size=(8, D_UNI)).astype(np.float32))

    cfg_msr = {"M": 3, "W": 10.0, "y_scale": 3.0, "y_shift": 10.0 / 3.0}
    X_gains = jnp.asarray(rng.uniform(0.5, 2.5, (8, 3)).astype(np.float32))
    a = TASKS["multi_msr"].decode_with_x(Y5, X_gains, cfg_msr)
    b = TASKS["msr_wf"].decode_with_x(Y5[:, :3], X_gains, cfg_msr)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    cfg_nu = {"K": 3, "P_sum": 18.0, "width": 400.0, "height": 400.0,
              "y_scale": 8.0, "y_shift": [0.45, 0.45, 0.33, 0.33, 0.33]}
    c = TASKS["multi_nu"].decode(Y5, cfg_nu)
    d = TASKS["nu_direct"].decode(Y5, cfg_nu)
    np.testing.assert_allclose(np.asarray(c), np.asarray(d), atol=0)


def test_multi_nu_geo_wrapper():
    """The geometry-conditioned NU face (multi_nu_geo): its 9-dim payload
    fills the shared condition exactly (zero pad width 0), the adapter
    matches manual padding, and decode_with_x equals the specialist
    nu_geo decode (canvas dim == NU dim, crop is identity)."""
    rng = np.random.default_rng(1)
    cfg = {"K": 3, "P_sum": 18.0, "width": 400.0, "height": 400.0,
           "p_ref": 18.0, "w_ref": 400.0, "h_ref": 400.0,
           "y_scale": 8.0, "y_shift": [0.45, 0.45, 0.33, 0.33, 0.33]}
    task = TASKS["multi_nu_geo"]
    assert task.cond_dim(cfg) == PAYLOAD

    Y5 = jnp.asarray(rng.normal(size=(8, D_UNI)).astype(np.float32))
    X_un = np.concatenate([
        rng.uniform(0, 400, (8, 6)),
        np.tile([18.0, 400.0, 400.0], (8, 1))], axis=1).astype(np.float32)
    a = task.decode_with_x(Y5, jnp.asarray(X_un), cfg)
    b = TASKS["nu_geo"].decode_with_x(Y5, jnp.asarray(X_un), cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    model = task.build_model({**cfg, "proj_dim": 8, "dims": (8, 4)})
    key = jax.random.PRNGKey(0)
    y = jnp.ones((4, D_UNI))
    t = jnp.zeros((4,))
    cond = jnp.asarray(rng.uniform(0, 1, (4, PAYLOAD)).astype(np.float32))
    mask = jnp.ones((4, 1))
    variables = model.init(key, y, t, cond, mask)
    out = model.apply(variables, y, t, cond, mask)
    inner = unet_multi(8, (8, 4))
    cond_pad = jnp.concatenate(
        [jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (4, 1)), cond], axis=1)
    ref = inner.apply(variables, y, t, cond_pad, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0)


@pytest.fixture(scope="module")
def tiny_multi():
    """One tiny shared net trained a few epochs on 64 rows per task.

    Trained with the x0 parameterization like the shipped ckpts/ddpm_multi
    (the flag must ride subtask_configs into decode/serve)."""
    from diffsg_tpu.train import train_ddpm

    msr = load_msr(f"{REF}/3c_10w_10000samples.csv")
    co = load_co(f"{REF}/3nodes_2000samples_ood.csv")
    # multi_nu is budget-conditioned: the NU payload is [coords (6), P/p_ref]
    nu = load_nu_budget(f"{REF}/3u_18mW_10000samples.csv")
    n = 64
    nu_shift = nu.Y_train[:n].astype(np.float32).mean(0)
    X = np.concatenate([
        embed_cond_np(msr.X_train[:n].astype(np.float32), "msr"),
        embed_cond_np(co.X_train[:n].astype(np.float32), "co"),
        embed_cond_np(nu.X_train[:n].astype(np.float32), "nu")])
    Y = np.concatenate([
        embed_y_np(((msr.Y_train[:n] - 10 / 3) * 3.0).astype(np.float32)),
        embed_y_np(co.Y_train[:n].astype(np.float32)),
        embed_y_np(((nu.Y_train[:n] - nu_shift) * 8.0).astype(np.float32))])

    model = unet_multi(proj_dim=8, dims=(8, 4))
    cfg = dataclasses.replace(TASKS["multi_nu"].train_config, epochs=2,
                              batch_size=64, grad_clip=1.0,
                              parameterization="x0")
    params, _, sched = train_ddpm(model, X, Y, cfg)
    metadata = {"arch": {"proj_dim": 8, "dims": [8, 4]},
                "subtask_configs": {
                    "msr": {"y_scale": 3.0, "y_shift": 10 / 3,
                            "parameterization": "x0"},
                    "co": {"parameterization": "x0"},
                    "nu": {"y_scale": 8.0, "parameterization": "x0",
                           "y_shift": [float(v) for v in nu_shift]}}}
    return params, sched, metadata, {"msr": msr, "co": co, "nu": nu}


def test_multi_e2e_feasible(tiny_multi):
    """ONE parameter set drives all three wrapper tasks; every decoded
    solution satisfies its task's feasibility constraints."""
    from diffsg_tpu.tasks import sample_solutions

    params, sched, metadata, data = tiny_multi
    for slot, task_key in (("msr", "multi_msr"), ("co", "multi_co"),
                           ("nu", "multi_nu")):
        task = TASKS[task_key]
        d = data[slot]
        cfg = merge_multi_config(dict(d.config), metadata, slot)
        Y_dec, _ = sample_solutions(task, params, sched, d.X_test[:32], cfg,
                                    omega=1.0, batch_size=32)
        assert Y_dec.shape[1] == {"msr": 3, "co": 3, "nu": 5}[slot]
        assert np.isfinite(Y_dec).all()
        if slot == "msr":
            np.testing.assert_allclose(Y_dec.sum(1), cfg["W"], rtol=1e-4)
            assert (Y_dec >= -1e-5).all()
        elif slot == "nu":
            assert (Y_dec[:, 0] >= 0).all() and (Y_dec[:, 0] <= cfg["width"]).all()
            assert (Y_dec[:, 1] >= 0).all() and (Y_dec[:, 1] <= cfg["height"]).all()
            np.testing.assert_allclose(Y_dec[:, 2:].sum(1), cfg["P_sum"],
                                       rtol=1e-4)
            assert (Y_dec[:, 2:] >= -1e-5).all()
        else:  # co: ranked decode emits a feasible allocation per row
            assert (Y_dec >= -1e-6).all()
            assert (Y_dec.sum(1) <= 1.0 + 1e-5).all()


def test_multi_evaluate_runs(tiny_multi):
    """The generic evaluate() works through the wrappers (metrics finite)."""
    from diffsg_tpu.tasks import evaluate

    params, sched, metadata, data = tiny_multi
    d = data["msr"]
    d.X_test, d.Y_test = d.X_test[:32], d.Y_test[:32]
    merge_multi_config(d.config, metadata, "msr")
    m = evaluate(TASKS["multi_msr"], params, sched, d, omega=1.0,
                 batch_size=32)
    assert np.isfinite(m["less_ratio"])


def test_multi_solver_from_one_checkpoint(tiny_multi, tmp_path):
    """ONE saved multi checkpoint serves all three tasks through
    serve.Solver (subtask physics + transforms resolved from metadata)."""
    from diffsg_tpu.serve import Solver
    from diffsg_tpu.utils import save_checkpoint

    params, sched, metadata, data = tiny_multi
    sub_cfgs = {slot: {**data[slot].config,
                       **metadata["subtask_configs"][slot]}
                for slot in ("msr", "co", "nu")}
    ck = tmp_path / "ddpm_multi_tiny"
    save_checkpoint(str(ck), params, sched=sched, step=2,
                    metadata={"task": "multi", "arch": metadata["arch"],
                              "subtask_configs": sub_cfgs})
    for slot, task_key in (("msr", "multi_msr"), ("co", "multi_co"),
                           ("nu", "multi_nu")):
        solver = Solver.from_checkpoint(str(ck), task=task_key)
        X = data[slot].X_test[:8].astype(np.float32)
        out = solver.solve(X, omega=1.0)
        assert out.shape == (8, {"msr": 3, "co": 3, "nu": 5}[slot])
        assert np.isfinite(out).all()


def test_multi80_canvas_config():
    """Checkpoint-owned canvas/payload/slots config drives the multi-80
    layout: the msr80 face builds an 80-canvas net with the [one-hot(4) |
    gains | W] condition, the adapter matches manual padding, and the
    small-task faces crop the wide canvas back to their own dims."""
    rng = np.random.default_rng(2)
    arch = {"proj_dim": 8, "dims": (8, 4), "canvas_dim": 80,
            "payload_dim": 81, "slots": ["msr", "co", "nu", "msr80"]}
    cfg = {"M": 80, "W": 10.0, "w_ref": 10.0, "scaler_min": 0.5,
           "scaler_max": 2.5, "y_scale": 8.0, **arch}
    task = TASKS["multi_msr80"]
    assert task.data_dim(cfg) == 80
    assert task.cond_dim(cfg) == 81

    model = task.build_model(cfg)
    B = 4
    y = jnp.ones((B, 80))
    t = jnp.zeros((B,))
    cond = jnp.asarray(rng.uniform(0, 1, (B, 81)).astype(np.float32))
    mask = jnp.ones((B, 1))
    v = model.init(jax.random.PRNGKey(0), y, t, cond, mask)
    out = model.apply(v, y, t, cond, mask)
    assert out.shape == (B, 80)
    inner = unet_multi(8, (8, 4), canvas_dim=80, payload_dim=81, n_slots=4)
    onehot = jnp.tile(jnp.asarray([[0.0, 0.0, 0.0, 1.0]]), (B, 1))
    ref = inner.apply(v, y, t, jnp.concatenate([onehot, cond], axis=1), mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0)

    # host-side embeds follow the widened layout (payload exactly fills)
    E = embed_cond_np(np.ones((2, 81), np.float32), "msr80",
                      slots=arch["slots"], payload_dim=81)
    assert E.shape == (2, 85)
    np.testing.assert_array_equal(E[:, :4], [[0, 0, 0, 1]] * 2)
    P = embed_y_np(np.ones((2, 3), np.float32), canvas_dim=80)
    assert P.shape == (2, 80) and (P[:, 3:] == 0).all()

    # a small-task face on the wide canvas crops back to its own dims
    cfg3 = {"M": 3, "W": 10.0, "y_scale": 3.0, "y_shift": 10.0 / 3.0,
            **arch}
    Y80 = jnp.asarray(rng.normal(size=(8, 80)).astype(np.float32))
    gains = jnp.asarray(rng.uniform(0.5, 2.5, (8, 3)).astype(np.float32))
    a = TASKS["multi_msr"].decode_with_x(Y80, gains, cfg3)
    b = TASKS["msr_wf"].decode_with_x(Y80[:, :3], gains, cfg3)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_multi_msr8_face():
    """The 8c face on the widened canvas: payload [gains(8) | W] zero-pads
    into the 81-dim condition, the adapter matches manual padding, decode
    crops the 80-canvas to 8 dims."""
    rng = np.random.default_rng(3)
    arch = {"proj_dim": 8, "dims": (8, 4), "canvas_dim": 80,
            "payload_dim": 81,
            "slots": ["msr", "co", "nu", "msr80", "msr8"]}
    cfg = {"M": 8, "W": 10.0, "w_ref": 10.0, "scaler_min": 0.5,
           "scaler_max": 2.5, "y_scale": 8.0, **arch}
    task = TASKS["multi_msr8"]
    assert task.data_dim(cfg) == 80
    assert task.cond_dim(cfg) == 9

    model = task.build_model(cfg)
    B = 4
    y = jnp.ones((B, 80))
    t = jnp.zeros((B,))
    cond = jnp.asarray(rng.uniform(0, 1, (B, 9)).astype(np.float32))
    mask = jnp.ones((B, 1))
    v = model.init(jax.random.PRNGKey(0), y, t, cond, mask)
    out = model.apply(v, y, t, cond, mask)
    assert out.shape == (B, 80)
    inner = unet_multi(8, (8, 4), canvas_dim=80, payload_dim=81, n_slots=5)
    onehot = jnp.tile(jnp.asarray([[0.0] * 4 + [1.0]]), (B, 1))
    ref = inner.apply(v, y, t, jnp.concatenate(
        [onehot, cond, jnp.zeros((B, 81 - 9))], axis=1), mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0)

    # decode crops the wide canvas to the 8c dims == specialist decode
    Y80 = jnp.asarray(rng.normal(size=(8, 80)).astype(np.float32))
    gains = jnp.asarray(rng.uniform(0.5, 2.5, (8, 8)).astype(np.float32))
    Xb = jnp.concatenate([gains, jnp.ones((8, 1))], axis=1)
    a = task.decode_with_x(Y80, Xb, cfg)
    b = TASKS["msr_budget"].decode_with_x(Y80[:, :8], Xb, cfg)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_multi80_solver_serves_wide_faces(tmp_path):
    """ONE saved multi-80 checkpoint serves the msr80 AND msr8 faces
    through serve.Solver (the round-5 wide-canvas production path):
    feasible simplex decode at the configured W, physics resolved from
    checkpoint metadata alone."""
    from diffsg_tpu.data.generators import msr_waterfilling_labels
    from diffsg_tpu.serve import Solver
    from diffsg_tpu.train import train_ddpm
    from diffsg_tpu.utils import save_checkpoint

    slots = ["msr", "co", "nu", "msr80", "msr8"]
    rng = np.random.default_rng(0)
    parts_X, parts_Y, sub = [], [], {}
    for slot, M in (("msr80", 80), ("msr8", 8)):
        gs = rng.uniform(0.5, 2.5, (96, M))
        Ws = rng.choice([5.0, 15.0, 25.0], size=96)
        Yw = np.zeros_like(gs)
        for w in (5.0, 15.0, 25.0):
            idx = np.nonzero(Ws == w)[0]
            _, Yw[idx] = msr_waterfilling_labels(gs[idx], w)
        mn, mx = float(gs.min()), float(gs.max())
        X = np.concatenate([(gs - mn) / (mx - mn), Ws[:, None] / 10.0], 1)
        Yt = (Yw - Ws[:, None] / M) * 8.0
        parts_X.append(embed_cond_np(X.astype(np.float32), slot,
                                     slots=slots, payload_dim=81))
        parts_Y.append(embed_y_np(Yt.astype(np.float32), canvas_dim=80))
        sub[slot] = {"M": M, "W": 10.0, "w_ref": 10.0, "scaler_min": mn,
                     "scaler_max": mx, "y_scale": 8.0,
                     "parameterization": "x0"}
    model = unet_multi(8, (8, 4), canvas_dim=80, payload_dim=81, n_slots=5)
    cfg = dataclasses.replace(TASKS["multi_nu"].train_config, epochs=2,
                              batch_size=64, grad_clip=1.0,
                              parameterization="x0")
    params, _, sched = train_ddpm(model, np.concatenate(parts_X),
                                  np.concatenate(parts_Y), cfg)
    arch = {"proj_dim": 8, "dims": [8, 4], "n_blocks": 2,
            "is_attn": [False, False], "middle_attn": False,
            "canvas_dim": 80, "payload_dim": 81, "slots": slots}
    ck = tmp_path / "ck_multi80"
    save_checkpoint(str(ck), params, sched=sched, step=2,
                    metadata={"task": "multi", "arch": arch,
                              "subtask_configs": sub})
    for task_key, M in (("multi_msr80", 80), ("multi_msr8", 8)):
        sv = Solver.from_checkpoint(str(ck), task=task_key)
        gs = rng.uniform(0.5, 2.5, (8, M)).astype(np.float32)
        Xq = np.concatenate([(gs - 0.5) / 2.0,
                             np.full((8, 1), 1.5, np.float32)], 1)
        out = sv.solve(Xq, omega=1.0)
        assert out.shape == (8, M) and np.isfinite(out).all()
        np.testing.assert_allclose(out.sum(1), 10.0, rtol=1e-3)
        assert (out >= -1e-5).all()
