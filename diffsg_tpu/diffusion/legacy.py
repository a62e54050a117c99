"""Legacy (pre-CFG) diffusion sampler and noise utilities.

Functional port of the reference's older ``DiffusionOpt`` path
(``ddpm_opt/diffusion.py:129-385``) — kept for capability parity and for
reproducing the repo's earlier experiments.  The shipped CFG scripts do not
use it (they import only the schedule + init from that file), so this module
is correctness-tested but not performance-tuned.

Pieces:
  * Dirichlet-based noise samplers (``noise_single_sample`` /
    ``custom_noise_sample``, ``diffusion.py:47-80``): rows sum to a target
    (optionally shifted to allow negatives) — "simplex-ish" initializations.
  * ``legacy_denoise_step``: the ``custom_denoise`` update with its **4x**
    noise-removal coefficient (``:316``) and per-task clamping (``:319-321``).
  * ``legacy_sample``: the reverse loop (``forward``, ``:324-385``) —
    Dirichlet-ish init summing to 1, per-step min-max renormalization of the
    whole tensor (``:371-373``), optional per-step objective recording
    (the ``loss_record`` debug capability, ``:352-359``).
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp

from .schedule import Schedule


def dirichlet_noise(key: jax.Array, shape: Tuple[int, int], target_sum: float,
                    alpha: float = 1.0, enable_neg: bool = True) -> jnp.ndarray:
    """Rows ~ Dirichlet(alpha * 1), shifted so each row sums to ``target_sum``.

    ``enable_neg=True`` reproduces ``noise - 1/size + target/size`` (values
    may be negative, row sum == target); ``False`` scales the simplex sample
    by ``target_sum`` (non-negative).  Reference ``diffusion.py:47-80``.
    """
    n, size = shape
    d = jax.random.dirichlet(key, jnp.full((size,), alpha), (n,))
    if enable_neg:
        return d - 1.0 / size + target_sum / size
    return d * target_sum


def legacy_denoise_step(
    sched: Schedule,
    y_t: jnp.ndarray,
    eps_hat: jnp.ndarray,
    step: int,
    noise: jnp.ndarray,
    task: str = "CONV_CO",
    noise_removal_scale: float = 4.0,
) -> jnp.ndarray:
    """``custom_denoise`` (``diffusion.py:302-322``): posterior step with a
    4x noise-removal coefficient; MSR additionally clamps to (0, 1]."""
    prev = max(step - 1, 0)
    y = (y_t - noise_removal_scale * sched.remove_noise_coeff[step] * eps_hat) \
        * sched.reciprocal_sqrt_alphas[step] \
        + (1.0 - sched.alphas_cumprod[prev]) / (1.0 - sched.alphas_cumprod[step]) * noise
    if task == "MAX SUM RATE":
        y = jnp.where(y > 1, 1.0, y)
        y = jnp.where(y < 0, 0.00001, y)
    return y


def legacy_sample(
    apply_fn: Callable[..., jnp.ndarray],
    params: Any,
    sched: Schedule,
    cond: jnp.ndarray,
    data_dim: int,
    key: jax.Array,
    task: str = "CONV_CO",
    record_objective: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
) -> Tuple[jnp.ndarray, List]:
    """The legacy reverse loop (``diffusion.py:324-385``).

    apply_fn(params, y_t, t, cond) -> eps_hat, with integer (unnormalized)
    timesteps like the legacy model consumed.  After each step the whole
    tensor is min-max renormalized to [0, 1] (``:371-373``).  ``noise`` per
    step is row-wise Dirichlet summing to 0 (``custom_denoise`` uses
    ``noise_single_sample(0, ...)``), zeroed at the final step.

    Returns (y_0, records) where records holds per-step objective values if
    ``record_objective`` is given (the loss_record debug capability).
    """
    B = cond.shape[0]
    T = sched.T
    k_init, key = jax.random.split(key)
    y_t = dirichlet_noise(k_init, (B, data_dim), target_sum=1.0, enable_neg=False)

    records = []
    for i in range(T - 1, -1, -1):
        t = jnp.full((B,), i, dtype=cond.dtype)
        eps_hat = apply_fn(params, y_t, t, cond)
        key, k = jax.random.split(key)
        noise = (jnp.zeros_like(y_t) if i == 0
                 else dirichlet_noise(k, (B, data_dim), 0.0, alpha=3.0))
        y_t = legacy_denoise_step(sched, y_t, eps_hat, i, noise, task)
        y_t = (y_t - jnp.min(y_t)) / (jnp.max(y_t) - jnp.min(y_t))
        if record_objective is not None:
            records.append(record_objective(y_t))
    return y_t, records
