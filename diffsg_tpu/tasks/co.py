"""CO task plugin: Computation Offloading (MEC resource allocation).

Reference: ``ddpm_opt/classifier_free_CO.py`` (loader :158, decoder :281,
cost :255, metrics :293-356, trainer :203-252).  Extra metrics: "terrible
count" (pred/true > 1.2 and pred > 10, ``:344-345``) and offload-decision
accuracy via binary class encoding (``:335-343``).
"""

from __future__ import annotations

import numpy as np

from ..data.loaders import load_co
from ..models.unet1d import unet_co
from ..ops.decoders import co_decode
from ..ops.objectives import co_cost
from ..train.trainer import TrainConfig
from .base import Task


def _decode(Y_raw, config, valid_mask=None):
    return co_decode(Y_raw)  # per-row decode: pads cannot leak across rows


def _objective(Y_dec, X_unnorm, config):
    return co_cost(X_unnorm, Y_dec)


def _unnorm_x(X, config):
    mn, mx = config["scaler_min"], config["scaler_max"]
    return X * (mx - mn) + mn


def _unnorm_y(Y, config):
    return Y


def decision_class(Y: np.ndarray, threshold: float = 0.1) -> np.ndarray:
    """Binary-encode the offload decision vector (``classifier_free_CO.py:335-343``)."""
    D = (Y > threshold).astype(int)
    weights = 2 ** np.arange(Y.shape[1] - 1, -1, -1)
    return D @ weights


def _extra_metrics(Y_dec, Y_true, pred_cost, true_cost, config):
    terrible = (pred_cost / true_cost > 1.2) & (pred_cost > 10.0)
    acc = decision_class(Y_dec) == decision_class(Y_true)
    return {
        "terrible_count": float(terrible.sum()),
        "decision_accuracy": float(acc.mean()),
    }


def _decode_analytic(Y_raw, X_unnorm, config, valid_mask=None):
    """Decision from the sampler, allocation from the closed-form optimum
    (baselines.co_exact.co_analytic_decode).  Per-row: mask unused."""
    from ..baselines.co_exact import co_analytic_decode

    return co_analytic_decode(Y_raw, X_unnorm)


CO = Task(
    name="co",
    build_model=lambda cfg: unet_co(cfg["node_num"]),
    load=load_co,
    decode=_decode,
    objective=_objective,
    unnormalize_x=_unnorm_x,
    unnormalize_y=_unnorm_y,
    higher_is_better=False,
    data_dim=lambda cfg: cfg["node_num"],
    cond_dim=lambda cfg: 3 * cfg["node_num"],
    # classifier_free_CO.py:204-230: 200 epochs, T=20, Adam 5e-3, [15,80,150]
    train_config=TrainConfig(epochs=200, lr=5e-3, milestones=(15, 80, 150)),
    default_omega=500.0,
    extra_metrics=_extra_metrics,
)


import dataclasses as _dc

#: CO with the analytic-allocation decode (decision from the sampler,
#: continuous shares from the closed form) — see baselines/co_exact.py.
CO_ANALYTIC = _dc.replace(CO, name="co_analytic", decode_with_x=_decode_analytic)


def _decode_direct(Y_raw, X_unnorm, config, valid_mask=None):
    """Per-row feasibility decode for scale-normalized training (--y-scale):
    decision thresholded on the unscaled sample (identity on the labels'
    exact zeros), allocation from the closed form."""
    from ..baselines.co_exact import co_direct_decode

    return co_direct_decode(Y_raw, X_unnorm, config.get("y_scale", 1.0),
                            config.get("y_shift", 0.0))


#: CO trained directly on (scaled) allocation shares — pair with --y-scale
#: checkpoints; tuned omega is small like nu_direct/msr_wf (see docs/RESULTS.md).
CO_DIRECT = _dc.replace(CO, name="co_direct", decode_with_x=_decode_direct,
                        default_omega=1.0)


def _decode_ranked(Y_raw, X_unnorm, config, valid_mask=None):
    from ..baselines.co_exact import co_ranked_decode

    return co_ranked_decode(Y_raw, X_unnorm)


#: CO with the ranked-decision decode: the sampled row's node ordering
#: selects among the N+1 nested top-k offload sets, each costed closed-form
#: (baselines.co_exact.co_ranked_decode).  Breaks the one-hot saturation
#: ceiling of the softmax decode at high omega — single-draw exceeded ratio
#: ~1.004 at omega=5000 vs ~1.025 for co_analytic (docs/RESULTS.md round 3).
CO_RANKED = _dc.replace(CO, name="co_ranked", decode_with_x=_decode_ranked,
                        default_omega=5000.0)
