"""MSR task plugin: Maximum Sum Rate power allocation over M channels.

Reference: ``ddpm_opt/classifier_free_MSR.py`` (loader :159, decoder :239,
metrics :248-298, trainer hyperparams :187-214).
"""

from __future__ import annotations

import numpy as np

from ..data.loaders import load_msr
from ..models.unet1d import unet_msr
from ..ops.decoders import msr_decode
from ..ops.objectives import msr_sum_rate
from ..train.trainer import TrainConfig
from .base import Task


def _decode(Y_raw, config):
    return config["W"] * msr_decode(Y_raw)


def _objective(Y_dec, X_unnorm, config):
    return msr_sum_rate(Y_dec, X_unnorm)


def _unnorm_x(X, config):
    mn, mx = config["scaler_min"], config["scaler_max"]
    return X * (mx - mn) + mn


def _unnorm_y(Y, config):
    return Y  # MSR labels are stored unscaled


MSR = Task(
    name="msr",
    build_model=lambda cfg: unet_msr(cfg["M"]),
    load=load_msr,
    decode=_decode,
    objective=_objective,
    unnormalize_x=_unnorm_x,
    unnormalize_y=_unnorm_y,
    higher_is_better=True,
    data_dim=lambda cfg: cfg["M"],
    cond_dim=lambda cfg: cfg["M"],
    # classifier_free_MSR.py:188-214: 200 epochs, T=20, Adam 5e-3, [100,150]
    train_config=TrainConfig(epochs=200, lr=5e-3, milestones=(100, 150)),
    default_omega=500.0,
)
