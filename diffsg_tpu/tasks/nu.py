"""NU task plugin: NOMA-UAV placement + power allocation.

Reference: ``ddpm_opt/classifier_free_NU.py`` (loader :184, decoder :267,
rate :279, metrics :306-361, trainer :213-242).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..data.loaders import load_nu, load_nu_budget
from ..models.unet1d import unet_nu
from ..ops.decoders import nu_decode, nu_direct_decode
from ..ops.objectives import nu_rate
from ..train.trainer import TrainConfig
from .base import Task


def _decode(Y_raw, config, valid_mask=None):
    return nu_decode(Y_raw, config["width"], config["height"], config["P_sum"],
                     valid_mask)


def _objective(Y_dec, X_unnorm, config):
    return nu_rate(Y_dec, X_unnorm)


def _unnorm_x(X, config):
    X = np.array(X, dtype=float)
    X[:, 0::2] *= config["width"]
    X[:, 1::2] *= config["height"]
    return X


def _unnorm_y(Y, config):
    Y = np.array(Y, dtype=float)
    Y[:, 0] *= config["width"]
    Y[:, 1] *= config["height"]
    Y[:, 2:] *= config["P_sum"]
    return Y


def _decode_direct(Y_raw, config, valid_mask=None):
    # strictly per-row — valid_mask not needed (see nu_direct_decode)
    import numpy as _np

    return nu_direct_decode(Y_raw, config["width"], config["height"],
                            config["P_sum"], config.get("y_scale", 1.0),
                            _np.asarray(config.get("y_shift", 0.0),
                                        _np.float32))


def _project(Y_dec, X_unnorm, config):
    """Feasibility projection for refinement (ops.refine): UAV position
    clipped into the service area, powers Euclidean-projected onto
    {p >= 0, sum p = P_sum}."""
    from ..ops.decoders import msr_simplex_project

    xy = jnp.clip(Y_dec[:, :2],
                  jnp.zeros((2,), Y_dec.dtype),
                  jnp.asarray([config["width"], config["height"]],
                              Y_dec.dtype))
    P = msr_simplex_project(Y_dec[:, 2:], config["P_sum"])
    return jnp.concatenate([xy, P], axis=1)


def _refine_precond(config):
    """Step scales for the mixed-units NU solution vector: coordinates move
    ~2% of the area per unit step, powers ~2% of the budget (falls back to
    the budget-conditioned reference scale when P_sum is per-row)."""
    K = config["K"]
    p = config.get("P_sum") or config.get("p_ref", 18.0)
    return np.asarray([config["width"] * 0.02, config["height"] * 0.02]
                      + [p * 0.02] * K, np.float32)


def _project_budget(Y_dec, X_unnorm, config):
    """Per-row-budget projection for ``nu_budget``: each row's powers land
    on ITS OWN simplex {p >= 0, sum p = P_row}, read from the trailing
    unnormalized condition column (mW)."""
    from ..ops.decoders import msr_simplex_project

    K = config["K"]
    xy = jnp.clip(Y_dec[:, :2],
                  jnp.zeros((2,), Y_dec.dtype),
                  jnp.asarray([config["width"], config["height"]],
                              Y_dec.dtype))
    P = msr_simplex_project(Y_dec[:, 2:], X_unnorm[:, 2 * K:2 * K + 1])
    return jnp.concatenate([xy, P], axis=1)


NU = Task(
    name="nu",
    build_model=lambda cfg: unet_nu(cfg["K"]),
    load=load_nu,
    decode=_decode,
    objective=_objective,
    unnormalize_x=_unnorm_x,
    unnormalize_y=_unnorm_y,
    higher_is_better=True,
    data_dim=lambda cfg: 2 + cfg["K"],
    cond_dim=lambda cfg: 2 * cfg["K"],
    # classifier_free_NU.py:214-242: 200 epochs, T=20, Adam 4e-3, [80,200]
    train_config=TrainConfig(epochs=200, lr=4e-3, milestones=(80, 200)),
    default_omega=500.0,
    project=_project,
    refine_step=1.0,
    refine_precond=_refine_precond,
)


import dataclasses as _dc

#: NU with the per-row feasibility decode for scale-normalized training
#: (pair with --y-scale checkpoints; tuned omega ~1, see docs/RESULTS.md).
NU_DIRECT = _dc.replace(NU, name="nu_direct", decode=_decode_direct,
                        default_omega=1.0)


def _unnorm_x_budget(X, config):
    X = np.array(X, dtype=float)
    K = config["K"]
    X[:, 0:2 * K:2] *= config["width"]
    X[:, 1:2 * K:2] *= config["height"]
    X[:, 2 * K] *= config.get("p_ref", 18.0)  # budget feature -> mW
    return X


def _objective_budget(Y_dec, X_unnorm, config):
    # the trailing budget column is conditioning only; the rate sees coords
    return nu_rate(Y_dec, X_unnorm[:, : 2 * config["K"]])


#: NU conditioned on the power budget (condition column ``P_sum / p_ref``):
#: the trained realization of the reference's designed-but-disabled
#: conditioning capability (``condition_C`` / ``cdim``,
#: ``classifier_free_NU.py:35-75``).  One model serves ANY budget; closes
#: the 30 mW OOD gap that budget-blind conditions cannot see.  Train with
#: ``tools/train_nu_budget.py`` on a multi-budget oracle set
#: (``tools/make_datasets.py nu-budget``).
NU_BUDGET = _dc.replace(
    NU, name="nu_budget",
    build_model=lambda cfg: unet_nu(cfg["K"], cond_extra=1),
    load=load_nu_budget,
    decode=_decode_direct,
    objective=_objective_budget,
    unnormalize_x=_unnorm_x_budget,
    cond_dim=lambda cfg: 2 * cfg["K"] + 1,
    default_omega=0.125,
    project=_project_budget,
)


# --- nu_geo: the universal NU solver (budget + field geometry conditioned) --

def _unnorm_x_geo(X, config):
    """Condition layout: [qx/W_row, qy/H_row interleaved (2K), P/p_ref,
    W/w_ref, H/h_ref].  Unnormalize the trailing physics features first,
    then the coordinates by the per-row geometry."""
    X = np.array(X, dtype=float)
    K = config["K"]
    P = X[:, 2 * K] * config.get("p_ref", 18.0)
    W = X[:, 2 * K + 1] * config.get("w_ref", 400.0)
    H = X[:, 2 * K + 2] * config.get("h_ref", 400.0)
    X[:, 0:2 * K:2] *= W[:, None]
    X[:, 1:2 * K:2] *= H[:, None]
    X[:, 2 * K], X[:, 2 * K + 1], X[:, 2 * K + 2] = P, W, H
    return X


def _decode_geo(Y_raw, X_unnorm, config):
    """Strictly per-row feasibility decode with PER-ROW budget and geometry
    read from the unnormalized condition: invert the train-time scale/shift,
    clip the UAV into the row's own W x H box, Euclidean-project the powers
    onto the row's own budget simplex.  Identity on feasible labels; safe
    under serving bucket padding (no batch-global reductions)."""
    from ..ops.decoders import msr_simplex_project

    K = config["K"]
    y_scale = config.get("y_scale", 1.0)
    y_shift = jnp.asarray(config.get("y_shift", 0.0), Y_raw.dtype)
    yd = Y_raw / y_scale + y_shift
    WH = X_unnorm[:, 2 * K + 1:2 * K + 3]
    xy = jnp.clip(yd[:, :2], 0.0, 1.0) * WH
    P = msr_simplex_project(yd[:, 2:], 1.0) * X_unnorm[:, 2 * K:2 * K + 1]
    return jnp.concatenate([xy, P], axis=1)


def _objective_geo(Y_dec, X_unnorm, config):
    return nu_rate(Y_dec, X_unnorm[:, : 2 * config["K"]])


def _project_geo(Y_dec, X_unnorm, config):
    """Per-row feasibility projection: the row's own geometry box and
    budget simplex (both read from the unnormalized condition)."""
    from ..ops.decoders import msr_simplex_project

    K = config["K"]
    WH = X_unnorm[:, 2 * K + 1:2 * K + 3]
    xy = jnp.clip(Y_dec[:, :2], 0.0, WH)
    P = msr_simplex_project(Y_dec[:, 2:], X_unnorm[:, 2 * K:2 * K + 1])
    return jnp.concatenate([xy, P], axis=1)


def _load_nu_geo(dataset_path, width=400.0, height=400.0, P_sum=None):
    from ..data.loaders import load_nu_geo

    return load_nu_geo(dataset_path, width, height, P_sum)


#: The universal NU solver: condition carries the power budget AND the
#: service-area geometry ``[P/p_ref, W/w_ref, H/h_ref]`` (cond_extra=3), so
#: ONE model serves any budget on any rectangular field.  Coordinates and
#: labels are normalized per-row by the row's own geometry/budget; decode
#: and refinement projection are strictly per-row (mixed-geometry batches
#: are fine at serving).  Train with ``tools/train_nu_geo.py`` on a
#: mixed-geometry oracle set (``tools/make_datasets.py nu-geo``).
NU_GEO = _dc.replace(
    NU, name="nu_geo",
    build_model=lambda cfg: unet_nu(cfg["K"], cond_extra=3,
                                    proj_dim=cfg.get("proj_dim", 32),
                                    dims=tuple(cfg.get("dims", (32, 16, 8)))),
    load=_load_nu_geo,
    decode=_decode_direct,            # fallback; sample paths use decode_with_x
    decode_with_x=_decode_geo,
    objective=_objective_geo,
    unnormalize_x=_unnorm_x_geo,
    cond_dim=lambda cfg: 2 * cfg["K"] + 3,
    default_omega=0.5,
    project=_project_geo,
)
