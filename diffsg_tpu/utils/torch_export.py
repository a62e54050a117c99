"""JAX -> torch checkpoint export (the inverse of torch_import).

Lets reference users round-trip: models trained with this framework save as
``torch.save``-compatible state_dicts that load strictly into the reference
DDPM classes (``classifier_free_*.py`` DDPM with a UNetCF.UNet1D model),
including the 8 schedule buffers and the EMA shadow copy.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

from ..diffusion.schedule import Schedule
from ..train.ema import EmaState

_LIST_MODULES = ("down", "up")


def _torch_key(path) -> str:
    """flax path tuple -> torch dotted key ('down_3' -> 'down.3')."""
    parts = []
    for p in path:
        name = p.key if hasattr(p, "key") else str(p)
        head, _, idx = str(name).partition("_")
        if head in _LIST_MODULES and idx.isdigit():
            parts.extend([head, idx])
        else:
            parts.append(str(name))
    return ".".join(parts)


def unet_params_to_torch(params: Dict[str, Any], prefix: str = "model."
                         ) -> Dict[str, np.ndarray]:
    """flax UNet1D params -> torch state_dict entries (numpy values)."""
    import jax

    out: Dict[str, np.ndarray] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        leaf = np.asarray(leaf)
        leaf_name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        parent = _torch_key(path[:-1])
        if leaf_name == "kernel":
            out[f"{prefix}{parent}.weight"] = leaf.T
        elif leaf_name == "scale":
            out[f"{prefix}{parent}.weight"] = leaf
        elif leaf_name == "bias":
            out[f"{prefix}{parent}.bias"] = leaf
        else:
            raise ValueError(f"unexpected leaf {leaf_name!r}")
    return out


def ddpm_to_torch(
    path: str,
    params: Dict[str, Any],
    sched: Schedule,
    ema: Optional[EmaState] = None,
) -> str:
    """Write a reference-compatible DDPM checkpoint (.pt).

    Layout matches ``classifier_free_*.py``: 8 schedule buffers + ``model.*``
    + ``ema.n_averaged`` + ``ema.module.*`` (EMA defaults to a copy of the
    params when not provided, like a freshly constructed AveragedModel).
    """
    import torch

    sd: Dict[str, "torch.Tensor"] = {}
    for name in ("betas", "alphas", "alphas_cumprod", "sqrt_alphas_cumprod",
                 "sqrt_one_minus_alphas_cumprod", "reciprocal_sqrt_alphas",
                 "remove_noise_coeff", "sqrt_betas"):
        sd[name] = torch.tensor(np.asarray(getattr(sched, name)),
                                dtype=torch.float32)
    for k, v in unet_params_to_torch(params, "model.").items():
        sd[k] = torch.tensor(v, dtype=torch.float32)

    ema_params = ema.params if ema is not None else params
    n_avg = int(ema.n_averaged) if ema is not None else 0
    sd["ema.n_averaged"] = torch.tensor(n_avg, dtype=torch.long)
    for k, v in unet_params_to_torch(ema_params, "ema.module.").items():
        sd[k] = torch.tensor(v, dtype=torch.float32)

    torch.save(sd, path)
    return path
