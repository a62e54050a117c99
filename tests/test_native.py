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
