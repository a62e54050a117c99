"""Native (C++/OpenMP) oracle engines must match the NumPy generators exactly."""

import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(shutil.which("g++") is None, reason="no g++")


def test_nu_native_matches_numpy():
    from diffsg_tpu.data.generators import noma_uav_gen
    from diffsg_tpu.data.native import nu_oracle_native

    data = noma_uav_gen(4, P_sum=18.0, seed=3, grid_step=8)
    nat = nu_oracle_native(data[:, :6], grid_step=8.0)
    np.testing.assert_allclose(nat, data[:, 6:], rtol=1e-9, atol=1e-9)


def test_nu_native_legacy_mode():
    from diffsg_tpu.data.generators import noma_uav_gen
    from diffsg_tpu.data.native import nu_oracle_native

    data = noma_uav_gen(2, P_sum=18.0, seed=5, grid_step=8, legacy_sinr=True)
    nat = nu_oracle_native(data[:, :6], grid_step=8.0, legacy_sinr=True)
    np.testing.assert_allclose(nat, data[:, 6:], rtol=1e-9, atol=1e-9)


def test_co_native_matches_numpy():
    from diffsg_tpu.data.generators import co_minlp_gen
    from diffsg_tpu.data.native import co_oracle_native

    data, _ = co_minlp_gen(64, seed=7)
    raw = data[:, :18]
    feats = np.concatenate(
        [raw[:, 0::6], raw[:, 1::6], raw[:, 2::6], raw[:, 3::6], raw[:, 4::6]],
        axis=1,
    )
    nat = co_oracle_native(feats)
    np.testing.assert_array_equal(nat[:, 0].astype(int), data[:, 18].astype(int))
    np.testing.assert_allclose(nat[:, 1:], data[:, 19:22], atol=1e-12)


def test_co_native_matches_shipped_ood(reference_path):
    import pandas as pd
    from diffsg_tpu.data.native import co_oracle_native

    src = np.array(pd.read_csv(
        reference_path / "datasets" / "3nodes_2000samples_ood.csv", header=None))
    raw = src[:, :18]
    feats = np.concatenate(
        [raw[:, 0::6], raw[:, 1::6], raw[:, 2::6], raw[:, 3::6], raw[:, 4::6]],
        axis=1,
    )
    nat = co_oracle_native(feats[:200])
    np.testing.assert_array_equal(nat[:, 0].astype(int), src[:200, 18].astype(int))
    np.testing.assert_allclose(nat[:, 1:], src[:200, 19:22], atol=1e-9)


def test_nu_degenerate_triangle_centroid_fallback(monkeypatch):
    """Near-collinear user triangles thinner than the grid step contain no
    grid point; both engines must fall back to the centroid instead of
    emitting an all-zero row with a NaN/zero rate (observed 2/10000 rows in
    the regenerated nu-geo training set)."""
    import jax.numpy as jnp

    from diffsg_tpu.data import generators as G
    from diffsg_tpu.data.native import nu_oracle_native
    from diffsg_tpu.ops import nu_rate

    slivers = np.array([[185., 291., 351., 334., 31., 251.],
                        [86., 239., 189., 135., 292., 33.]])
    # confirm the premise: no grid point inside either triangle at step 2
    xs = np.arange(0, 480 + 2.0, 2.0)
    ys = np.arange(0, 520 + 2.0, 2.0)
    PX, PY = np.meshgrid(xs, ys)
    for tri in slivers:
        assert G._points_in_triangle(PX.ravel(), PY.ravel(), tri).sum() == 0

    nat = nu_oracle_native(slivers, P_sum=21.0, grid_step=2.0,
                           width=480.0, height=520.0)
    assert np.isfinite(nat).all()
    np.testing.assert_allclose(nat[:, 0], slivers[:, 0::2].mean(axis=1))
    np.testing.assert_allclose(nat[:, 1], slivers[:, 1::2].mean(axis=1))
    np.testing.assert_allclose(nat[:, 2:5].sum(axis=1), 21.0, atol=0.2)
    # the stored rate is the actual NOMA-SIC rate of the stored solution
    rate = np.asarray(nu_rate(jnp.asarray(nat[:, :5], jnp.float32),
                              jnp.asarray(slivers, jnp.float32)))
    np.testing.assert_allclose(nat[:, 5], rate, rtol=1e-3)  # f32 recompute

    # NumPy twin takes the same fallback and matches the native engine
    monkeypatch.setattr(G, "nu_coordinates_gen",
                        lambda rng, n, K=3, width=400, height=400: slivers)
    data = G.noma_uav_gen(2, P_sum=21.0, grid_step=2.0,
                          width=480, height=520)
    np.testing.assert_allclose(nat, data[:, 6:], rtol=1e-9, atol=1e-9)
