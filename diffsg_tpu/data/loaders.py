"""CSV dataset loaders for the MSR / CO / NU tasks.

Host-side NumPy re-implementations of the reference loaders with the same
scaling/splitting semantics but a robust config path: dataset-level
parameters (W, P_sum) are explicit arguments with a filename-parse fallback.
(The reference parses them from the filename — ``classifier_free_MSR.py:172``
and ``classifier_free_NU.py:197`` — which crashes on the shipped NU OOD
filename ``3u_30mW_1000samples_ood.csv``; the fallback here handles both
name layouts.)

Splits follow the reference exactly: first 70% train, last 30% test, no
shuffling (``classifier_free_MSR.py:163-164,182-183``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pandas as pd

from .preprocess import CO_COMMON_FEATURES, data_preprocess_co

TRAIN_RATIO, TEST_RATIO = 0.7, 0.3


@dataclass
class TaskData:
    """Loaded + scaled arrays and the task config needed to decode/score."""

    X_train: np.ndarray
    Y_train: np.ndarray
    X_test: np.ndarray
    Y_test: np.ndarray
    config: dict = field(default_factory=dict)
    R_test: Optional[np.ndarray] = None  # NU keeps the oracle rates column


def _parse_filename_float(path: str, suffix: str) -> Optional[float]:
    """Extract the ``{value}{suffix}`` token from names like ``3c_10w_10000samples.csv``
    or ``3u_30mW_1000samples_ood.csv`` (case-insensitive, any position)."""
    for token in re.split(r"[_/]", path):
        m = re.fullmatch(r"(\d+(?:\.\d+)?)" + suffix, token, flags=re.IGNORECASE)
        if m:
            return float(m.group(1))
    return None


def load_msr(dataset_path: str, W: Optional[float] = None) -> TaskData:
    """MSR loader (``classifier_free_MSR.py:159-184``).

    CSV columns: ``[g_1..g_M, rate, p_1..p_M]`` (no header).  X is the gain
    block, min-max scaled by the **global scalar** min/max of the whole
    matrix; Y is the power block (unscaled).
    """
    src = np.array(pd.read_csv(dataset_path, header=None))
    M = (src.shape[1] - 1) // 2
    if W is None:
        W = _parse_filename_float(dataset_path, "w")
        if W is None:
            raise ValueError(f"W not given and not parseable from {dataset_path!r}")
    X, Y = src[:, :M], src[:, -M:]
    scaler_min, scaler_max = float(np.min(X)), float(np.max(X))
    X = (X - scaler_min) / (scaler_max - scaler_min)
    n = src.shape[0]
    cfg = {"M": M, "W": W, "sfn": 1, "cfn": 0, "cdim": 1,
           "scaler_min": scaler_min, "scaler_max": scaler_max}
    return TaskData(
        X_train=X[: int(n * TRAIN_RATIO)], Y_train=Y[: int(n * TRAIN_RATIO)],
        X_test=X[-int(n * TEST_RATIO):], Y_test=Y[-int(n * TEST_RATIO):],
        config=cfg,
    )


def load_co(dataset_path: str, abnormal_threshold: float = 10.0) -> TaskData:
    """CO loader (``classifier_free_CO.py:158-200``).

    CSV columns: 6 raw features per node, then ``[D_1..D_N, R_1..R_N, cost]``
    -> X = raw block + appended physical constants -> derived 3-per-node
    features; rows with any derived feature >= 10.0 are dropped
    ("de-abnormal", ``:186-190``); global scalar min-max scaling.

    Split-size quirk reproduced: the reference computes split indices from
    the **pre-filter** row count (``:198-199``), so train+test can overlap
    or undercover after filtering; we reproduce that exactly.
    """
    src = np.array(pd.read_csv(dataset_path, header=None))
    node_num = (src.shape[1] - 1) // 7
    X_raw, Y = src[:, : 6 * node_num], src[:, -node_num:]
    X = np.concatenate(
        [X_raw, np.tile(CO_COMMON_FEATURES[None, :], (X_raw.shape[0], 1))], axis=1
    )
    X = data_preprocess_co(X)

    keep = np.all(X < abnormal_threshold, axis=1)
    X, Y = X[keep], Y[keep]
    scaler_min, scaler_max = float(np.min(X)), float(np.max(X))
    X = (X - scaler_min) / (scaler_max - scaler_min)

    n_pre_filter = src.shape[0]  # reference quirk: split on pre-filter count
    cfg = {"node_num": node_num, "sfn": 3, "cfn": 0, "cdim": 1,
           "scaler_min": scaler_min, "scaler_max": scaler_max}
    return TaskData(
        X_train=X[: int(n_pre_filter * TRAIN_RATIO)],
        Y_train=Y[: int(n_pre_filter * TRAIN_RATIO)],
        X_test=X[-int(n_pre_filter * TEST_RATIO):],
        Y_test=Y[-int(n_pre_filter * TEST_RATIO):],
        config=cfg,
    )


def load_nu(
    dataset_path: str,
    width: float = 400.0,
    height: float = 400.0,
    P_sum: Optional[float] = None,
) -> TaskData:
    """NU loader (``classifier_free_NU.py:184-210``).

    CSV columns: ``[user coords x 2K, uav_x, uav_y, P_1..P_K, rate]``.
    Coordinates normalized by width/height, powers by P_sum.
    """
    src = np.array(pd.read_csv(dataset_path, header=None))
    K = (src.shape[1] - 3) // 3
    if P_sum is None:
        P_sum = _parse_filename_float(dataset_path, "mw")
        if P_sum is None:
            raise ValueError(f"P_sum not given and not parseable from {dataset_path!r}")
    X = src[:, : 2 * K].astype(float).copy()
    Y = src[:, 2 * K : 2 + 3 * K].astype(float).copy()
    R = src[:, -1].astype(float)

    X[:, 0::2] /= width
    X[:, 1::2] /= height
    Y[:, 0] /= width
    Y[:, 1] /= height
    Y[:, 2:] /= P_sum

    n = src.shape[0]
    cfg = {"K": K, "P_sum": P_sum, "cdim": 1, "width": width, "height": height}
    return TaskData(
        X_train=X[: int(n * TRAIN_RATIO)], Y_train=Y[: int(n * TRAIN_RATIO)],
        X_test=X[-int(n * TEST_RATIO):], Y_test=Y[-int(n * TEST_RATIO):],
        R_test=R[-int(n * TEST_RATIO):],
        config=cfg,
    )


#: budget-feature normalizer for budget-conditioned NU models: the in-dist
#: training budget (18 mW), so the appended condition is 1.0 in-dist.
NU_P_REF = 18.0

#: same for W-conditioned MSR models (in-dist budget 10 W).
MSR_W_REF = 10.0


def load_nu_geo(dataset_path: str, width: float = 400.0,
                height: float = 400.0, P_sum: Optional[float] = None,
                p_ref: float = NU_P_REF, w_ref: float = 400.0,
                h_ref: float = 400.0) -> TaskData:
    """NU loader for the universal (budget + geometry conditioned)
    ``nu_geo`` task: standard single-config 12-column CSVs with the
    condition extended by ``[P_sum/p_ref, width/w_ref, height/h_ref]`` so
    the denoiser SEES the power budget and the service-area size.  The
    mixed-geometry 15-column training CSVs (``make_datasets.py nu-geo``)
    are consumed by ``tools/train_nu_geo.py`` directly."""
    td = load_nu(dataset_path, width, height, P_sum)
    feat = np.array([[td.config["P_sum"] / p_ref, width / w_ref,
                      height / h_ref]])
    td.X_train = np.concatenate(
        [td.X_train, np.repeat(feat, td.X_train.shape[0], axis=0)], axis=1)
    td.X_test = np.concatenate(
        [td.X_test, np.repeat(feat, td.X_test.shape[0], axis=0)], axis=1)
    td.config.update({"p_ref": p_ref, "w_ref": w_ref, "h_ref": h_ref})
    return td


def load_msr_budget(dataset_path: str, W: Optional[float] = None,
                    w_ref: float = MSR_W_REF) -> TaskData:
    """MSR loader for W-conditioned models (``msr_budget`` task): standard
    single-W CSVs with the condition extended by ``W / w_ref`` (the MSR
    analog of :func:`load_nu_budget`; the reference's ``cdim`` conditioning
    capability, ``classifier_free_MSR.py:32-46``, trained for real)."""
    td = load_msr(dataset_path, W)
    feat = np.full((1, 1), td.config["W"] / w_ref)
    td.X_train = np.concatenate(
        [td.X_train, np.repeat(feat, td.X_train.shape[0], axis=0)], axis=1)
    td.X_test = np.concatenate(
        [td.X_test, np.repeat(feat, td.X_test.shape[0], axis=0)], axis=1)
    td.config["w_ref"] = w_ref
    return td


def load_nu_budget(dataset_path: str, width: float = 400.0,
                   height: float = 400.0, P_sum: Optional[float] = None,
                   p_ref: float = NU_P_REF) -> TaskData:
    """NU loader for budget-conditioned models (``nu_budget`` task).

    Same scaling as :func:`load_nu` (this loads the standard single-budget
    12-column CSVs — the multi-budget 13-column training CSVs are consumed
    by ``tools/train_nu_budget.py`` directly), but the condition gets an
    extra column ``P_sum / p_ref`` so the denoiser SEES the power budget.
    The reference designs this capability (the ``cdim`` config key and the
    commented-out ``condition_C``, ``classifier_free_NU.py:35-75``) but
    never enables it; its conditions carry only user coordinates, which is
    why budget shifts (the 30 mW OOD split) are invisible to its models.
    """
    td = load_nu(dataset_path, width, height, P_sum)
    feat = np.full((1, 1), td.config["P_sum"] / p_ref)
    td.X_train = np.concatenate(
        [td.X_train, np.repeat(feat, td.X_train.shape[0], axis=0)], axis=1)
    td.X_test = np.concatenate(
        [td.X_test, np.repeat(feat, td.X_test.shape[0], axis=0)], axis=1)
    td.config["p_ref"] = p_ref
    return td
