"""Torch -> JAX checkpoint converters.

The reference ships torch ``state_dict`` checkpoints (``ckpts/*.pt``): DDPM
checkpoints hold 8 schedule buffers + ``model.*`` + an EMA shadow copy
(``ema.n_averaged`` + ``ema.module.*``) — layout verified on
``ckpts/ddpm_nu_3u.pt`` (805 keys).  Baseline checkpoints (MTFNN/PPO) are
plain module state_dicts.

Conversion rules:
  * ``nn.Linear.weight`` (out, in)  -> flax ``Dense`` ``kernel`` (in, out): transpose
  * ``nn.LayerNorm.weight``         -> flax ``LayerNorm`` ``scale``
  * ``down.3.res...`` ModuleList indices -> flax list names ``down_3.res...``

Torch is only needed for reading ``.pt`` files; the converted pytree is pure
NumPy/JAX.  Loading uses ``weights_only=True`` — checkpoints are treated as
untrusted data.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint into {key: np.ndarray} without executing code."""
    import torch  # local import: torch is optional at runtime

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


_LIST_MODULES = ("down", "up")


def _flax_path(tokens) -> Tuple[str, ...]:
    """Map torch dotted-path tokens to the flax module path (sans leaf)."""
    out = []
    i = 0
    while i < len(tokens):
        tok = tokens[i]
        if tok in _LIST_MODULES and i + 1 < len(tokens) and tokens[i + 1].isdigit():
            out.append(f"{tok}_{tokens[i + 1]}")
            i += 2
        else:
            out.append(tok)
            i += 1
    return tuple(out)


def _insert(tree: Dict, path: Tuple[str, ...], leaf: str, value: np.ndarray) -> None:
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf] = value


def unet_params_from_torch(
    sd: Dict[str, np.ndarray], prefix: str = "model.", dtype=np.float32
) -> Dict[str, Any]:
    """Convert the UNet1D subtree of a torch state_dict to flax params.

    Returns the flax ``params`` dict (to be wrapped as ``{"params": ...}``
    by the caller).
    """
    tree: Dict[str, Any] = {}
    for key, arr in sd.items():
        if not key.startswith(prefix):
            continue
        tokens = key[len(prefix):].split(".")
        leaf = tokens[-1]
        path = _flax_path(tokens[:-1])
        arr = arr.astype(dtype)
        if leaf == "weight":
            if arr.ndim == 2:  # Linear
                _insert(tree, path, "kernel", arr.T)
            else:  # LayerNorm
                _insert(tree, path, "scale", arr)
        elif leaf == "bias":
            _insert(tree, path, "bias", arr)
        else:
            raise ValueError(f"unexpected leaf {leaf!r} in {key!r}")
    return tree


def ddpm_from_torch(path: str):
    """Load a reference DDPM checkpoint -> (params, ema_params, Schedule, n_averaged).

    Checkpoint layout per ``classifier_free_*.py:81-98`` + ``ema.py``.
    """
    from ..diffusion.schedule import schedule_from_betas

    sd = load_torch_state_dict(path)
    params = unet_params_from_torch(sd, "model.")
    ema_params = unet_params_from_torch(sd, "ema.module.")
    sched = schedule_from_betas(sd["betas"].astype(np.float64))
    n_averaged = int(sd.get("ema.n_averaged", np.array(0)))
    return params, ema_params, sched, n_averaged


def sequential_mlp_from_torch(
    sd: Dict[str, np.ndarray], layer_names, prefix: str = "", dtype=np.float32
) -> Dict[str, Any]:
    """Convert a torch ``nn.Sequential``/flat-MLP state_dict to flax params.

    ``layer_names``: iterable of torch layer names in order, e.g.
    ``["lin1", "lin2", ...]``; output keys are the same names.
    """
    tree: Dict[str, Any] = {}
    for name in layer_names:
        tree[name] = {
            "kernel": sd[f"{prefix}{name}.weight"].astype(dtype).T,
            "bias": sd[f"{prefix}{name}.bias"].astype(dtype),
        }
    return tree
