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


def test_bucket_boundary_invariance(solver, reference_path):
    """Padding to any bucket (or none) must not change the real rows.

    The validity mask keeps pad rows out of the sampler's batch-global
    re-standardization and the decoder's global min/max, and serving noise
    is drawn row-major so a row's noise is independent of batch size —
    together: bucketed == unbucketed (up to fp reduction order).
    """
    td = load_nu(str(reference_path / "datasets" / "3u_18mW_10000samples.csv"))
    X = td.X_test[:20]
    cfg = dict(K=3, P_sum=18.0, width=400.0, height=400.0)
    pt = str(reference_path / "ckpts" / "ddpm_nu_3u.pt")
    s32 = Solver.from_torch_checkpoint(pt, task="nu", dataset_config=cfg,
                                       buckets=(32,))
    s128 = Solver.from_torch_checkpoint(pt, task="nu", dataset_config=cfg,
                                        buckets=(128,))
    s_none = Solver.from_torch_checkpoint(pt, task="nu", dataset_config=cfg)
    y32 = s32.solve(X, seed=7)
    y128 = s128.solve(X, seed=7)
    y_plain = s_none.solve(X, seed=7)
    # Not bitwise: the batch-stat reductions associate differently per batch
    # shape and omega=500 amplifies last-ulp differences.  Measured residual
    # is ~1e-3 absolute on 400-scale outputs (vs O(10) shifts before the
    # masking fix, when pad rows entered the global stats).
    np.testing.assert_allclose(y32, y128, rtol=1e-3, atol=1e-2)
    np.testing.assert_allclose(y32, y_plain, rtol=1e-3, atol=1e-2)
    # ddim path: same invariance
    d32 = s32.solve(X, sampler="ddim", n_steps=10, seed=7)
    d_plain = s_none.solve(X, sampler="ddim", n_steps=10, seed=7)
    np.testing.assert_allclose(d32, d_plain, rtol=1e-3, atol=1e-2)


def test_best_of_with_ddim(solver, reference_path):
    """best_of composes with the DDIM sampler (VERDICT r1 item 5)."""
    td = load_nu(str(reference_path / "datasets" / "3u_18mW_10000samples.csv"))
    X = td.X_test[:32]
    y = solver.solve(X, omega=[150, 500, 2000], best_of=3,
                     sampler="ddim", n_steps=10, seed=5)
    assert y.shape == (32, 5)
    np.testing.assert_allclose(y[:, 2:].sum(1), 18.0, rtol=1e-4)
    # deterministic per seed (eta=0 DDIM + fixed candidate keys)
    y2 = solver.solve(X, omega=[150, 500, 2000], best_of=3,
                      sampler="ddim", n_steps=10, seed=5)
    np.testing.assert_array_equal(y, y2)


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


def test_solve_ddim_eta_and_renorm_knobs(solver, reference_path):
    """The few-step tuning knobs (eta stochasticity, renorm-step override)
    flow through the production solve path: distinct compile variants,
    feasible outputs, eta=0 stays deterministic per seed."""
    td = load_nu(str(reference_path / "datasets" / "3u_18mW_10000samples.csv"))
    X = td.X_test[:32]
    base = solver.solve(X, omega=500, sampler="ddim", n_steps=5, seed=3)
    y_r0 = solver.solve(X, omega=500, sampler="ddim", n_steps=5, seed=3,
                        renorm_steps=0)
    y_eta = solver.solve(X, omega=500, sampler="ddim", n_steps=5, seed=3,
                         eta=1.0)
    for y in (y_r0, y_eta):
        assert y.shape == (32, 5)
        np.testing.assert_allclose(y[:, 2:].sum(1), 18.0, rtol=1e-4)
    # the knobs actually change the trajectory
    assert np.abs(y_r0 - base).max() > 0
    assert np.abs(y_eta - base).max() > 0
    # eta=0 variants stay deterministic per seed
    np.testing.assert_array_equal(
        y_r0, solver.solve(X, omega=500, sampler="ddim", n_steps=5, seed=3,
                           renorm_steps=0))


def test_mesh_sharded_solver_matches_single_device(reference_path):
    """Solver(mesh=...) dp-shards each solve; batch-global reductions become
    cross-chip collectives and results match the unsharded solver."""
    from diffsg_tpu.parallel import make_mesh

    pt = reference_path / "ckpts" / "ddpm_nu_3u.pt"
    if not pt.exists():
        pytest.skip("NU ckpt missing")
    cfg = {"K": 3, "P_sum": 18.0, "width": 400.0, "height": 400.0}
    td = load_nu(str(reference_path / "datasets" / "3u_18mW_10000samples.csv"))
    X = np.asarray(td.X_test[:64])
    plain = Solver.from_torch_checkpoint(str(pt), task="nu",
                                         dataset_config=cfg)
    sharded = Solver.from_torch_checkpoint(str(pt), task="nu",
                                           dataset_config=cfg,
                                           mesh=make_mesh(8, tp=2))
    Yp = plain.solve(X, omega=500.0)
    Ys = sharded.solve(X, omega=500.0)
    np.testing.assert_allclose(Ys, Yp, rtol=5e-3, atol=5e-3)

    # non-dp-divisible batches are padded with validity-masked rows
    Y63 = sharded.solve(X[:63], omega=500.0)
    assert Y63.shape == (63, 5)
    np.testing.assert_allclose(Y63[:, 2:].sum(1), 18.0, rtol=1e-4)


def test_mesh_with_buckets_all_pad_shard(reference_path):
    """mesh + buckets: the sharded validity mask keeps an all-pad trailing
    dp shard out of the batch-global reductions (n=33 -> bucket 64, dp=4:
    the last 16-row shard is entirely pad)."""
    from diffsg_tpu.parallel import make_mesh

    pt = reference_path / "ckpts" / "ddpm_nu_3u.pt"
    if not pt.exists():
        pytest.skip("NU ckpt missing")
    cfg = {"K": 3, "P_sum": 18.0, "width": 400.0, "height": 400.0}
    td = load_nu(str(reference_path / "datasets" / "3u_18mW_10000samples.csv"))
    X = np.asarray(td.X_test[:33])
    plain = Solver.from_torch_checkpoint(str(pt), task="nu",
                                         dataset_config=cfg)
    meshed = Solver.from_torch_checkpoint(str(pt), task="nu",
                                          dataset_config=cfg,
                                          buckets=(64,),
                                          mesh=make_mesh(8, tp=2))
    with pytest.raises(ValueError, match="not divisible"):
        bad = Solver.from_torch_checkpoint(str(pt), task="nu",
                                           dataset_config=cfg, buckets=(33,),
                                           mesh=make_mesh(8, tp=2))
        bad.solve(X)
    Yp = plain.solve(X, omega=500.0)
    Ym = meshed.solve(X, omega=500.0)
    np.testing.assert_allclose(Ym, Yp, rtol=5e-3, atol=5e-3)
    # warmup goes through solve: same executables, no error, reusable
    meshed.warmup(sizes=(64,))


def test_solve_chunked_matches_serial(solver, reference_path):
    """Pipelined chunked solve == serial per-chunk solves (same seeds,
    same per-chunk batch-global statistics)."""
    td = load_nu(str(reference_path / "datasets" / "3u_18mW_10000samples.csv"))
    X = np.asarray(td.X_test[:96])
    serial = np.concatenate([
        solver.solve(X[i:i + 32], omega=500.0, seed=j)
        for j, i in enumerate(range(0, 96, 32))])
    chunked = solver.solve_chunked(X, 32, omega=500.0)
    np.testing.assert_allclose(chunked, serial, atol=1e-5)


def test_warmup_configs_compile_all_paths(reference_path):
    """warmup(configs=[...]) pre-compiles every configured serve path (the
    production multi-config warmup; solve afterwards hits warm executables
    and returns correct shapes)."""
    pt = reference_path / "ckpts" / "ddpm_nu_3u.pt"
    if not pt.exists():
        pytest.skip("NU ckpt missing")
    s = Solver.from_torch_checkpoint(
        str(pt), task="nu",
        dataset_config={"K": 3, "P_sum": 18.0, "width": 400.0,
                        "height": 400.0},
        buckets=(8,),
    )
    s.warmup(configs=[{},
                      {"best_of": 2, "omega": [100.0, 1000.0]},
                      {"sampler": "ddim", "n_steps": 3}])
    X = np.random.default_rng(0).uniform(0.1, 0.9, (5, 6)).astype(np.float32)
    for kw in ({}, {"best_of": 2, "omega": [100.0, 1000.0]},
               {"sampler": "ddim", "n_steps": 3}):
        Y = s.solve(X, **kw)
        assert Y.shape == (5, 5)


def test_suggest_buckets():
    from diffsg_tpu.serve import suggest_buckets

    assert suggest_buckets([]) == []
    bs = suggest_buckets([30, 60, 100, 500, 510, 520], max_buckets=4)
    assert bs == [128, 512, 576]
    assert max(bs) >= 520  # largest observed size never overflows
    for b in suggest_buckets([100, 200], max_buckets=4, align=64, dp=6):
        assert b % 6 == 0 and b % 64 == 0


def test_solver_refine_improves_and_composes(solver, reference_path):
    """Solver(refine_iters=K) appends the fused projected-gradient polish
    (ops.refine) to the decode: per-row never worse under the task
    objective, feasibility exact, and the per-row property survives
    bucketed padding and the mesh path."""
    import jax.numpy as jnp

    from diffsg_tpu.ops import nu_rate
    from diffsg_tpu.parallel import make_mesh

    pt = str(reference_path / "ckpts" / "ddpm_nu_3u.pt")
    cfg = {"K": 3, "P_sum": 18.0, "width": 400.0, "height": 400.0}
    td = load_nu(str(reference_path / "datasets" / "3u_18mW_10000samples.csv"))
    X = np.asarray(td.X_test[:20])
    Xu = np.array(X)
    Xu[:, 0::2] *= 400
    Xu[:, 1::2] *= 400

    refined = Solver.from_torch_checkpoint(pt, task="nu", dataset_config=cfg,
                                           refine_iters=25)
    Y0 = solver.solve(X, seed=11)          # module solver: refine_iters=0
    Y1 = refined.solve(X, seed=11)
    r0 = np.asarray(nu_rate(jnp.asarray(Y0), jnp.asarray(Xu)))
    r1 = np.asarray(nu_rate(jnp.asarray(Y1), jnp.asarray(Xu)))
    assert (r1 >= r0 - 1e-6).all() and r1.mean() > r0.mean()
    np.testing.assert_allclose(Y1[:, 2:].sum(1), 18.0, rtol=1e-4)
    assert Y1[:, 2:].min() >= -1e-5
    assert Y1[:, :2].min() >= 0 and Y1[:, :2].max() <= 400

    # refine is strictly per-row: meshed + bucketed == plain within the
    # pad-invariance tolerance of the underlying sampler
    meshed = Solver.from_torch_checkpoint(pt, task="nu", dataset_config=cfg,
                                          buckets=(32,),
                                          mesh=make_mesh(8, tp=2),
                                          refine_iters=25)
    Ym = meshed.solve(X, seed=11)
    np.testing.assert_allclose(Ym, Y1, rtol=5e-3, atol=5e-2)
