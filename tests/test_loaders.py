"""Loader tests against the shipped reference CSVs (read in place, not copied)."""

import numpy as np
import pytest

from diffsg_tpu.data import load_msr, load_nu, load_co


def test_nu_loader_matches_reference(reference_path, fixture_dir):
    fx = np.load(fixture_dir / "nu_data_head.npz")
    td = load_nu(str(reference_path / "datasets" / "3u_18mW_10000samples.csv"))
    assert td.config["K"] == int(fx["K"])
    assert td.config["P_sum"] == float(fx["P_sum"])
    assert td.X_train.shape[0] == int(fx["n_train"])
    assert td.X_test.shape[0] == int(fx["n_test"])
    np.testing.assert_allclose(td.X_train[:8], fx["X_train_head"], rtol=1e-12)
    np.testing.assert_allclose(td.Y_train[:8], fx["Y_train_head"], rtol=1e-12)
    np.testing.assert_allclose(td.X_test[:8], fx["X_test_head"], rtol=1e-12)
    np.testing.assert_allclose(td.Y_test[:8], fx["Y_test_head"], rtol=1e-12)


def test_nu_loader_handles_ood_filename(reference_path):
    """The reference loader crashes on this filename (parses '1000sampl' as
    P_sum); ours must parse the 30mW token anywhere in the name."""
    td = load_nu(str(reference_path / "datasets" / "3u_30mW_1000samples_ood.csv"))
    assert td.config["P_sum"] == 30.0
    assert td.X_train.shape[1] == 6


def test_msr_loader(reference_path):
    td = load_msr(str(reference_path / "datasets" / "3c_10w_10000samples.csv"))
    assert td.config["M"] == 3 and td.config["W"] == 10.0
    assert td.X_train.shape == (7000, 3)
    assert td.X_test.shape == (3000, 3)
    # globally min-max scaled
    assert 0.0 <= td.X_train.min() and td.X_test.max() <= 1.0
    # OOD file: W parsed as 20
    td_ood = load_msr(str(reference_path / "datasets" / "3c_20w_2000samples_ood.csv"))
    assert td_ood.config["W"] == 20.0


def test_co_loader_ood(reference_path):
    """Only the 2k OOD CSV ships (the 50k train CSV is a missing blob)."""
    td = load_co(str(reference_path / "datasets" / "3nodes_2000samples_ood.csv"))
    assert td.config["node_num"] == 3
    assert td.X_train.shape[1] == 9  # 3 derived features per node
    assert td.Y_train.shape[1] == 3
    # de-abnormal filter: all derived features < 10 after inverse scaling
    mn, mx = td.config["scaler_min"], td.config["scaler_max"]
    assert (td.X_train * (mx - mn) + mn).max() < 10.0
