"""Multi-task DiffSG: ONE denoiser that solves MSR, CO and NU.

A framework extension past the reference (which trains one specialist per
problem — ``classifier_free_{MSR,CO,NU}.py`` are three separate models): the
three solution spaces are embedded in a shared ``D_UNI``-dim canvas (the max
task dim; shorter tasks zero-padded) and the condition carries ``[task
one-hot (3) | payload (9, zero-padded)]``.  Task identity enters ONLY
through the condition — the same conditioning mechanism the reference
designs but never enables (``condition_C`` / the ``cdim`` config key,
``classifier_free_NU.py:35-75``), here carrying a discrete task id instead
of an objective value.  The NU slot's payload additionally carries the
power budget ``P_sum / p_ref`` (the ``nu_budget`` conditioning that closed
the 30 mW OOD gap for the specialist), so the one net serves any budget.

The wrapper tasks ``multi_msr`` / ``multi_co`` / ``multi_nu`` reuse each
specialist's loader, decode, objective, metrics, and refinement projection
untouched:

* ``build_model`` returns an adapter that prepends the task one-hot and
  zero-pads the condition payload into the shared 12-dim condition;
* ``data_dim`` is ``D_UNI``, so the reverse chain runs in the full shared
  canvas (pad dims were trained toward 0-labels and see the SAME noise
  statistics at sampling as at training — cropping per step would feed the
  net off-distribution zeros);
* ``decode``/``decode_with_x`` crop the sampled canvas back to the
  subtask's dims before the specialist decode.

All three wrappers share ONE checkpoint (``tools/train_multi.py``); the
per-subtask label transforms (y_shift/y_scale) live in the checkpoint
metadata under ``subtask_configs`` and are merged into a freshly-loaded
dataset config with :func:`merge_multi_config`.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..models.unet1d import UNet1D
from .co import CO_RANKED
from .msr import MSR_BUDGET, MSR_WF
from .nu import NU_BUDGET, NU_GEO

#: shared solution canvas = max task dim (NU's 2+K=5; MSR-3c and CO pad up).
#: Checkpoint-overridable via the ``canvas_dim`` config key — the multi-80
#: family widens the canvas to 80 so the MSR-80c zoo rides the one net.
D_UNI = 5
#: condition payload width = max specialist cond dim (CO's 3N=9);
#: checkpoint-overridable via ``payload_dim`` (multi-80: 81 = gains + W).
PAYLOAD = 9
#: default one-hot slot order (first condition columns); checkpoint-
#: overridable via ``slots`` (multi-80 appends "msr80").
SLOTS = ("msr", "co", "nu")
COND_UNI = len(SLOTS) + PAYLOAD


def unet_multi(proj_dim: int = 128, dims=(64, 32, 16, 8),
               canvas_dim: int = D_UNI, payload_dim: int = PAYLOAD,
               n_slots: int = len(SLOTS)) -> UNet1D:
    """The shared denoiser: the MSR-class architecture (the largest of the
    reference zoo) over the shared canvas and [one-hot | payload] condition."""
    return UNet1D(input_dim=canvas_dim, proj_dim=proj_dim,
                  cond_dim=n_slots + payload_dim,
                  dims=tuple(dims), is_attn=(False,) * len(dims),
                  middle_attn=False, n_blocks=2)


def embed_cond_np(X: np.ndarray, slot: str, slots=SLOTS,
                  payload_dim: int = PAYLOAD) -> np.ndarray:
    """Host-side condition embedding for training: [one-hot | payload | 0s]."""
    i = tuple(slots).index(slot)
    n, c = X.shape
    assert c <= payload_dim, f"payload {c} exceeds {payload_dim}"
    one = np.zeros((n, len(slots)), X.dtype)
    one[:, i] = 1.0
    return np.concatenate(
        [one, X, np.zeros((n, payload_dim - c), X.dtype)], axis=1)


def embed_y_np(Y: np.ndarray, canvas_dim: int = D_UNI) -> np.ndarray:
    """Host-side label embedding: zero-pad to the shared canvas."""
    n, d = Y.shape
    assert d <= canvas_dim, f"solution dim {d} exceeds {canvas_dim}"
    return np.concatenate([Y, np.zeros((n, canvas_dim - d), Y.dtype)], axis=1)


class _CondAdapter:
    """Duck-typed flax-module stand-in: pads the specialist condition into
    the shared layout, leaves the solution canvas untouched.  The
    sample/serve paths only call ``apply``; ``init`` mirrors it."""

    def __init__(self, inner: UNet1D, slot_idx: int, payload_dim: int,
                 n_slots: int = len(SLOTS), payload_total: int = PAYLOAD):
        self.inner = inner
        self.slot_idx = slot_idx
        self.payload_dim = payload_dim
        self.n_slots = n_slots
        self.payload_total = payload_total

    def _pad_cond(self, cond):
        n = cond.shape[0]
        one = jnp.zeros((n, self.n_slots),
                        cond.dtype).at[:, self.slot_idx].set(1.0)
        pad = jnp.zeros((n, self.payload_total - self.payload_dim),
                        cond.dtype)
        return jnp.concatenate([one, cond, pad], axis=1)

    def init(self, key, y, t, cond, mask):
        return self.inner.init(key, y, t, self._pad_cond(cond), mask)

    def apply(self, variables, y, t, cond, mask):
        return self.inner.apply(variables, y, t, self._pad_cond(cond), mask)


def _wrap(sub, slot: str, name: Optional[str] = None):
    """Build the multi-task wrapper around a specialist task plugin.

    ``slot`` picks the one-hot class; ``name`` overrides the registry key
    when one slot has several condition flavors (e.g. the NU slot's budget
    vs geometry payloads — same one-hot, different payload width).  Canvas
    width, payload width, and the slot list are checkpoint-owned config
    (``canvas_dim`` / ``payload_dim`` / ``slots``) resolved at build time,
    defaulting to the round-4 5-dim layout."""

    def build_model(cfg: Dict):
        slots = tuple(cfg.get("slots", SLOTS))
        payload = int(cfg.get("payload_dim", PAYLOAD))
        inner = unet_multi(cfg.get("proj_dim", 128),
                           tuple(cfg.get("dims", (64, 32, 16, 8))),
                           canvas_dim=int(cfg.get("canvas_dim", D_UNI)),
                           payload_dim=payload, n_slots=len(slots))
        return _CondAdapter(inner, slots.index(slot), sub.cond_dim(cfg),
                            n_slots=len(slots), payload_total=payload)

    # valid_mask is forwarded only when set, so strictly per-row specialist
    # decoders without the kwarg (e.g. nu_geo) still work bucket-less —
    # same convention as serve.Solver._decode.
    def decode(Y_raw, cfg, valid_mask=None):
        kw = {} if valid_mask is None else {"valid_mask": valid_mask}
        return sub.decode(Y_raw[:, : sub.data_dim(cfg)], cfg, **kw)

    decode_with_x = None
    if sub.decode_with_x is not None:
        def decode_with_x(Y_raw, X_unnorm, cfg, valid_mask=None):
            kw = {} if valid_mask is None else {"valid_mask": valid_mask}
            return sub.decode_with_x(Y_raw[:, : sub.data_dim(cfg)], X_unnorm,
                                     cfg, **kw)

    return dataclasses.replace(
        sub, name=name or f"multi_{slot}", build_model=build_model,
        data_dim=lambda cfg: int(cfg.get("canvas_dim", D_UNI)),
        decode=decode, decode_with_x=decode_with_x)


#: The three faces of the one multi-task checkpoint.  Decode flavors are the
#: headline specialists': msr_wf projection-family, co_ranked, and the
#: budget-conditioned nu_budget (payload ``[coords (2K) | P_sum/p_ref]`` —
#: the conditioning that closed NU's 30 mW OOD gap rides INSIDE the shared
#: condition, so the one multi net serves any budget like the specialist).
MULTI_MSR = _wrap(MSR_WF, "msr")
MULTI_CO = _wrap(CO_RANKED, "co")
MULTI_NU = _wrap(NU_BUDGET, "nu")
#: NU face with the FULL nu_geo condition ``[coords (2K) | P/p_ref |
#: W/w_ref | H/h_ref]`` — the 9-dim payload fills the shared condition
#: exactly, so ONE multi checkpoint serves any task x budget x rectangle.
#: Same one-hot slot as multi_nu but a different payload layout: a
#: checkpoint is trained for one NU flavor or the other
#: (``tools/train_multi.py --nu-mode geo`` stores the subtask config under
#: ``"nu_geo"``; the budget-mode ckpts store ``"nu"``).
MULTI_NU_GEO = _wrap(NU_GEO, "nu", name="multi_nu_geo")
#: MSR-80c face for the widened (multi-80) canvas: W-conditioned payload
#: ``[gains (M) | W/w_ref]`` (the ddpm_msr_80c_budget recipe).  Requires a
#: checkpoint whose ``slots`` config includes "msr80" (train_multi.py
#: --canvas-dim 80 --with-msr80).
MULTI_MSR80 = _wrap(MSR_BUDGET, "msr80")
#: MSR-8c face (same W-conditioned recipe at M=8; payload ``[gains (8) |
#: W/w_ref]`` zero-padded into the widened condition) — the middle of the
#: channel-count zoo rides the same net as 3c and 80c.
MULTI_MSR8 = _wrap(MSR_BUDGET, "msr8")

MULTI_TASKS = {"multi_msr": MULTI_MSR, "multi_co": MULTI_CO,
               "multi_nu": MULTI_NU, "multi_nu_geo": MULTI_NU_GEO,
               "multi_msr80": MULTI_MSR80, "multi_msr8": MULTI_MSR8}

#: per-subtask config keys owned by the multi checkpoint (label transforms
#: + the shared architecture) — see merge_multi_config.
_ARCH_KEYS = ("proj_dim", "dims", "canvas_dim", "payload_dim", "slots")
_LABEL_KEYS = ("y_scale", "y_shift", "parameterization")


def merge_multi_config(config: Dict, metadata: Optional[Dict],
                       slot: str) -> Dict:
    """Copy the multi checkpoint's architecture keys and the ``slot``
    subtask's label-transform keys into a freshly-loaded dataset config
    (the multi analogue of ``tasks.base.merge_ckpt_config``)."""
    md = metadata or {}
    sub_cfg = (md.get("subtask_configs") or {}).get(slot) or {}
    arch = md.get("arch") or {}
    for k in _ARCH_KEYS:
        if k in arch:
            config[k] = arch[k]
    for k in _LABEL_KEYS:
        if k in sub_cfg:
            config[k] = sub_cfg[k]
    return config
