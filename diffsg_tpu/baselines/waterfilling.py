"""Waterfilling: the exact feasible optimum for the MSR task.

maximize sum_i log2(1 + p_i g_i)  s.t.  sum p = W, p >= 0
has the closed-form solution p_i = max(mu - 1/g_i, 0) with the water level
mu chosen so the powers sum to W.  Vectorized over the batch in JAX — a true
oracle at microseconds/sample (the reference's GEKKO NLP needs ~8.6 s/sample
for the same optimum, ``baselines/GEKKO.py:197``).

Context this oracle provides (docs/RESULTS.md): the reference's LRH label
generator (``dataset_generate.py:247-313``) does NOT project to p >= 0 —
22% of the shipped/regenerated 80c label entries are negative, so the label
rates exceed any feasible allocation (labels/waterfilling = 1.055 on 80c).
Feasible solvers should therefore be compared against waterfilling, not the
labels, on MSR.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def waterfilling(g: jnp.ndarray, W: float) -> jnp.ndarray:
    """Optimal feasible power allocation.  g: (B, M) channel gains > 0."""
    inv = 1.0 / g
    inv_sorted = jnp.sort(inv, axis=1)                      # ascending
    csum = jnp.cumsum(inv_sorted, axis=1)
    k = jnp.arange(1, g.shape[1] + 1, dtype=g.dtype)[None, :]
    mu_k = (W + csum) / k                                   # water level if k channels active
    valid = mu_k > inv_sorted                               # channel k still above water
    # the largest valid k gives the true water level
    k_star = jnp.sum(valid.astype(jnp.int32), axis=1) - 1   # (B,)
    mu = jnp.take_along_axis(mu_k, k_star[:, None], axis=1) # (B, 1)
    return jnp.maximum(mu - inv, 0.0)
