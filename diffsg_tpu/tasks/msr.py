"""MSR task plugin: Maximum Sum Rate power allocation over M channels.

Reference: ``ddpm_opt/classifier_free_MSR.py`` (loader :159, decoder :239,
metrics :248-298, trainer hyperparams :187-214).
"""

from __future__ import annotations

import numpy as np

from ..data.loaders import load_msr, load_msr_budget
from ..models.unet1d import unet_msr
from ..ops.decoders import msr_decode
from ..ops.objectives import msr_sum_rate
from ..train.trainer import TrainConfig
from .base import Task


def _decode(Y_raw, config, valid_mask=None):
    return config["W"] * msr_decode(Y_raw, valid_mask)


def _objective(Y_dec, X_unnorm, config):
    return msr_sum_rate(Y_dec, X_unnorm)


def _unnorm_x(X, config):
    mn, mx = config["scaler_min"], config["scaler_max"]
    return X * (mx - mn) + mn


def _unnorm_y(Y, config):
    return Y  # MSR labels are stored unscaled


MSR_DECODE_TEMPS = (0.5, 1.0, 2.0, 4.0, 8.0, 16.0)


def _decode_temp_selected(Y_raw, X_unnorm, config, valid_mask=None):
    """Temperature-selected decode (framework extension): decode the raw
    sample at several softmax temperatures and keep the best-rate one per
    sample.  Decode-only candidates — one sampling pass, a handful of cheap
    decodes.  The reference decoder is the t=1 member of the family.
    Measured on MSR-80c: less ratio 0.8758 (t=1) -> 0.9200 (= 97% of the
    waterfilling feasible optimum).
    """
    import jax

    from ..ops.objectives import msr_sum_rate

    from ..ops.decoders import masked_min_max

    W = config["W"]
    if valid_mask is None:
        mn, mx = jnp.min(Y_raw), jnp.max(Y_raw)
    else:
        mn, mx = masked_min_max(Y_raw, valid_mask)
    Yn = (Y_raw - mn) / (mx - mn)

    def decode_at(t):
        p = W * jax.nn.softmax(t * Yn, axis=1)
        return p, msr_sum_rate(p, X_unnorm)

    temps = jnp.asarray(MSR_DECODE_TEMPS, Y_raw.dtype)
    ps, rates = jax.vmap(decode_at)(temps)
    best = jnp.argmax(rates, axis=0)
    return jnp.take_along_axis(ps, best[None, :, None], axis=0)[0]


MSR_PROJ_SCALES = (0.75, 1.0, 1.5, 2.0, 3.0)


def _decode_proj_selected(Y_raw, X_unnorm, config, valid_mask=None):
    """Simplex-projection scale family + temperature family, best rate/row.

    Built for waterfilling-labeled, scale-normalized training (datasets
    80c_*_wf_*, trained with ``--y-scale``): ``proj(a * Y_raw / y_scale)``
    is the identity on feasible labels at a=1, so a sampler that learned the
    label distribution decodes losslessly; the scale candidates ``a`` cover
    budget-shifted OOD conditions (e.g. a 20w-trained model solving 40w) and
    the softmax temperatures cover off-scale samples.  Decode-only
    candidates — one sampling pass, cheap decodes, per-row rate selection
    (the same objective access the GD/GEKKO baselines use).

    Measured (ckpts/ddpm_msr_80c_wf, omega=8, vs the exact waterfilling
    optimum): 0.9958 in-dist single draw, 0.9926 on 40w OOD.
    """
    import jax

    from ..ops.decoders import msr_simplex_project
    from ..ops.objectives import msr_sum_rate

    W = config["W"]
    y_scale = config.get("y_scale", 1.0)

    def proj_at(a):
        p = msr_simplex_project(a * Y_raw / y_scale, W)
        return p, msr_sum_rate(p, X_unnorm)

    ps, rates = jax.vmap(proj_at)(jnp.asarray(MSR_PROJ_SCALES, Y_raw.dtype))
    best = jnp.argmax(rates, axis=0)
    proj = jnp.take_along_axis(ps, best[None, :, None], axis=0)[0]
    r_proj = jnp.take_along_axis(rates, best[None, :], axis=0)[0]

    soft = _decode_temp_selected(Y_raw, X_unnorm, config, valid_mask)
    r_soft = msr_sum_rate(soft, X_unnorm)
    return jnp.where((r_proj > r_soft)[:, None], proj, soft)


def _project(Y_dec, X_unnorm, config):
    """Feasibility projection for refinement (ops.refine): powers onto
    {p >= 0, sum p = W}.  The sum-rate is concave on this simplex, so
    projected ascent converges toward the exact waterfilling optimum."""
    from ..ops.decoders import msr_simplex_project

    return msr_simplex_project(Y_dec, config["W"])


def _project_budget(Y_dec, X_unnorm, config):
    # per-row budget from the unnormalized condition's trailing W column
    from ..ops.decoders import msr_simplex_project

    return msr_simplex_project(Y_dec, X_unnorm[:, config["M"]:config["M"] + 1])


def _build_model(cfg):
    return unet_msr(cfg["M"], cfg.get("proj_dim", 128),
                    tuple(cfg.get("dims", (64, 32, 16, 8))))


MSR = Task(
    name="msr",
    build_model=_build_model,
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
    project=_project,
    refine_step=0.25,
)


import jax.numpy as jnp
import dataclasses as _dc

#: MSR with temperature-selected decode (see _decode_temp_selected).
MSR_TEMP = _dc.replace(MSR, name="msr_temp", decode_with_x=_decode_temp_selected)

#: MSR decode family incl. the simplex-projection candidate — pair with
#: waterfilling-labeled datasets (see _decode_proj_selected).
MSR_WF = _dc.replace(MSR, name="msr_wf", decode_with_x=_decode_proj_selected)


def _unnorm_x_budget(X, config):
    X = np.array(X, dtype=float)
    M = config["M"]
    mn, mx = config["scaler_min"], config["scaler_max"]
    X[:, :M] = X[:, :M] * (mx - mn) + mn
    X[:, M] *= config.get("w_ref", 10.0)  # budget feature -> watts
    return X


def _objective_budget(Y_dec, X_unnorm, config):
    # trailing W column is conditioning only; the rate sees the gains
    return msr_sum_rate(Y_dec, X_unnorm[:, : config["M"]])


def _decode_wf_budget(Y_raw, X_unnorm, config, valid_mask=None):
    return _decode_proj_selected(Y_raw, X_unnorm[:, : config["M"]], config,
                                 valid_mask)


#: MSR conditioned on the power budget W (condition column ``W / w_ref``):
#: one model serves any budget — the MSR instance of the trained
#: ``condition_C``/``cdim`` capability (see tasks/nu.py NU_BUDGET).  Pair
#: with per-row-centered scaled training (``tools/train_msr_budget.py``;
#: the msr_wf projection decode is invariant to the per-row W/M shift).
MSR_BUDGET = _dc.replace(
    MSR, name="msr_budget",
    build_model=lambda cfg: unet_msr(cfg["M"], cfg.get("proj_dim", 128),
                                     tuple(cfg.get("dims", (64, 32, 16, 8))),
                                     cond_extra=1),
    load=load_msr_budget,
    decode_with_x=_decode_wf_budget,
    objective=_objective_budget,
    unnormalize_x=_unnorm_x_budget,
    cond_dim=lambda cfg: cfg["M"] + 1,
    default_omega=1.0,
    project=_project_budget,
)
