"""Device-mesh scale-out: sharded sampling and data-parallel training.

The reference is strictly single-device (no torch.distributed anywhere; see
SURVEY.md §2.10).  The real parallel axis of this workload is the batch:
B independent reverse-diffusion chains (sampling) and B-row SGD batches
(training).  On TPU we express both through ``jax.sharding`` + ``jit``
(GSPMD): inputs carry a NamedSharding over the ``dp`` mesh axis, parameters
are replicated (or width-sharded over ``tp`` for the wide MSR-80c configs),
and XLA inserts the ICI collectives — the batch-global reductions inside the
sampler (early-step re-standardization) and decoders (global min/max) become
cross-chip all-reduces automatically, preserving the reference's exact
batch-global semantics across chips.

Axes exposed:
  dp — data parallel over the batch (the axis that matters here)
  tp — tensor parallel over hidden width: kernels with a wide output dim are
       sharded column-wise; GSPMD inserts the all-gathers/reduce-scatters.
       At <=1.7M params this is about exercising the mesh path, not memory.

Pipeline/sequence/expert parallelism are intentionally absent: the denoisers
are ~30 Linear layers on 3-80-dim vectors — there is no pipeline depth or
sequence axis to shard (SURVEY.md §2.10, §5 long-context note).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, tp: int = 1,
              devices=None) -> Mesh:
    """Build a (dp, tp) mesh over the first ``n_devices`` devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = np.asarray(devices[:n_devices])
    if n_devices % tp != 0:
        raise ValueError(f"n_devices={n_devices} not divisible by tp={tp}")
    return Mesh(devices.reshape(n_devices // tp, tp), ("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp, replicate features."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def param_shardings(params: Any, mesh: Mesh, tp_min_width: int = 128) -> Any:
    """Column-shard wide Dense kernels over ``tp``; replicate the rest.

    A kernel (in, out) with ``out >= tp_min_width`` and divisible by the tp
    size gets P(None, 'tp'); everything else (including biases) replicates —
    GSPMD inserts the gathers where a replicated bias meets a tp-sharded
    activation.
    """
    tp_size = mesh.shape["tp"]

    def leaf_spec(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if (
            tp_size > 1
            and name == "kernel"
            and leaf.ndim == 2
            and leaf.shape[1] >= tp_min_width
            and leaf.shape[1] % tp_size == 0
        ):
            return NamedSharding(mesh, P(None, "tp"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(leaf_spec, params)


def shard_params(params: Any, mesh: Mesh, tp_min_width: int = 128) -> Any:
    """Place a params pytree on the mesh according to :func:`param_shardings`."""
    shardings = param_shardings(params, mesh, tp_min_width)
    return jax.tree.map(jax.device_put, params, shardings)


def shard_batch(arrays, mesh: Mesh):
    """Place batch-leading arrays with the dp sharding."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, s), arrays)
