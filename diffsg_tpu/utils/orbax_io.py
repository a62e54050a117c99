"""Orbax checkpoint backend (optional; complements the npz format).

The framework's native format (utils.checkpoint) is dependency-free npz;
this adapter reads/writes the same logical content through orbax for users
standardized on it (async-friendly, versioned, multi-host-aware).  Gated:
importing this module without orbax installed raises a clear error.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np
import jax

from ..diffusion.schedule import Schedule, schedule_from_betas
from ..train.ema import EmaState


def _require_orbax():
    try:
        import orbax.checkpoint as ocp

        return ocp
    except ImportError as e:  # pragma: no cover - environment dependent
        raise ImportError(
            "orbax-checkpoint is not installed; use diffsg_tpu.utils.checkpoint "
            "(npz) or pip install orbax-checkpoint"
        ) from e


def save_checkpoint_orbax(
    directory: str,
    params: Any,
    ema: Optional[EmaState] = None,
    step: int = 0,
    sched: Optional[Schedule] = None,
    metadata: Optional[Dict] = None,
) -> str:
    ocp = _require_orbax()
    tree = {"params": params, "step": np.asarray(step)}
    if ema is not None:
        tree["ema_params"] = ema.params
        tree["ema_n_averaged"] = np.asarray(ema.n_averaged)
    if sched is not None:
        tree["schedule_betas"] = np.asarray(sched.betas, dtype=np.float64)
    import json
    import pathlib

    path = pathlib.Path(directory).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)
    # StandardCheckpointer rejects strings: metadata goes in a JSON sidecar
    if metadata:
        (path / "diffsg_metadata.json").write_text(
            json.dumps(dict(metadata), default=str))
    return str(path)


def load_checkpoint_orbax(directory: str) -> Dict[str, Any]:
    """Returns the same dict layout as utils.checkpoint.load_checkpoint."""
    ocp = _require_orbax()
    import pathlib

    import json

    path = pathlib.Path(directory).absolute()
    with ocp.StandardCheckpointer() as ckptr:
        tree = ckptr.restore(path)
    meta_file = path / "diffsg_metadata.json"
    out: Dict[str, Any] = {
        "params": tree["params"],
        "step": int(np.asarray(tree.get("step", 0))),
        "metadata": json.loads(meta_file.read_text()) if meta_file.exists() else {},
    }
    if "ema_params" in tree:
        out["ema"] = EmaState(tree["ema_params"],
                              np.asarray(tree.get("ema_n_averaged", 0)))
    if "schedule_betas" in tree:
        out["sched"] = schedule_from_betas(np.asarray(tree["schedule_betas"]))
    return out
