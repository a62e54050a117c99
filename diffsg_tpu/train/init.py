"""Parameter initialization matching the reference's training setup.

The reference applies ``init_weights`` (``diffusion.py:82-84``) to the whole
model before training: every ``nn.Linear`` weight is redrawn from N(0, 0.01)
while biases keep torch's default ``U(-1/sqrt(fan_in), +1/sqrt(fan_in))``;
LayerNorm affine stays at (1, 0).  Reproducing the init distribution matters
for retraining the missing MSR/CO checkpoints to paper-level quality.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def torch_style_init(params: Dict[str, Any], key: jax.Array) -> Dict[str, Any]:
    """Re-draw an initialized flax params tree with reference init semantics.

    Dense: kernel ~ N(0, 0.01); bias ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
    LayerNorm ({scale, bias}): scale=1, bias=0.
    """
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    keys = jax.random.split(key, len(leaves))
    new_leaves = []
    for (path, leaf), k in zip(leaves, keys):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "kernel":
            new_leaves.append(0.01 * jax.random.normal(k, leaf.shape, leaf.dtype))
        elif name == "scale":
            new_leaves.append(jnp.ones_like(leaf))
        elif name == "bias":
            # parent Dense kernel determines fan_in; LayerNorm bias -> 0.
            parent = path[:-1]
            kern = params
            for p in parent:
                kern = kern[p.key if hasattr(p, "key") else p]
            if "kernel" in kern:
                fan_in = kern["kernel"].shape[0]
                bound = 1.0 / jnp.sqrt(fan_in)
                new_leaves.append(jax.random.uniform(k, leaf.shape, leaf.dtype, -bound, bound))
            else:
                new_leaves.append(jnp.zeros_like(leaf))
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
