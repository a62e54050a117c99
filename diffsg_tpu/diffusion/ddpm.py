"""Classifier-free-guidance DDPM engine — one generic, jittable implementation.

The reference repo carries three near-identical copies of this logic
(``ddpm_opt/classifier_free_{MSR,CO,NU}.py``, DDPM class at ``:50-155`` /
``:55-154`` / ``:79-180``).  Here it is factored once, as pure functions over
a parameter pytree, shaped for TPU execution:

* the reverse sampler is a single ``lax.scan`` over the T denoise steps —
  one compiled program, no per-step dispatch;
* the two CFG passes (unconditional mask=0 and conditional mask=1) are
  **folded into the batch dimension**: one forward of ``2B`` rows per step
  instead of two forwards of ``B``.  The network is strictly per-sample
  (Linears + per-row LayerNorm), so this is numerically identical to the
  reference's two calls;
* random numbers come from explicit ``jax.random`` keys; for checkpoint-
  parity tests the sampler accepts externally supplied noise tensors.

Reference numerics reproduced exactly (verified by golden fixtures):

* training forward (``classifier_free_MSR.py:100-112``): per-sample uniform
  timestep, ``y_t = sqrt(a_bar_t) y + sqrt(1-a_bar_t) eps``, Bernoulli
  condition mask with keep-probability ``1 - uncond_prob``, model sees the
  *normalized* time ``t / T``, loss is MSE in epsilon;
* reverse step (``classifier_free_MSR.py:124-137``):
  ``y_{t-1} = (y_t - beta_t/sqrt(1-a_bar_t) * eps_cfg) / sqrt(alpha_t)
  + (1-a_bar_{t-1})/(1-a_bar_t) * z`` with the **un-square-rooted** variance
  ratio on ``z``; ``z = 0`` for the final two steps (``i <= 1``);
* CFG combine ``eps = (1+omega) eps_cond - omega eps_uncond``;
* for the first four steps (``i > T-5``) the state is re-standardized to
  zero-mean/unit-variance over the **whole batch tensor**, with the
  *unbiased* (ddof=1) variance — this matches ``torch.var``'s default and is
  load-bearing at omega=500.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .schedule import Schedule

# apply_fn(params, y_t, t_norm, cond, cond_mask) -> eps_hat
#   y_t:       (B, D) noisy solution
#   t_norm:    (B,)   normalized time t/T
#   cond:      (B, C) condition vector
#   cond_mask: (B, 1) 1.0 = conditional, 0.0 = unconditional
ApplyFn = Callable[..., jnp.ndarray]


def q_sample(sched: Schedule, y0: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
    """Forward (noising) process: draw ``y_t | y_0``.

    ``t`` is an integer array of shape ``(B,)`` with values in ``[0, T)``.
    Matches reference ``classifier_free_MSR.py:103``.
    """
    a = sched.sqrt_alphas_cumprod[t][:, None]
    b = sched.sqrt_one_minus_alphas_cumprod[t][:, None]
    return a * y0 + b * noise


def ddpm_loss(
    apply_fn: ApplyFn,
    params: Any,
    sched: Schedule,
    y0: jnp.ndarray,
    cond: jnp.ndarray,
    key: jax.Array,
    uncond_prob: float = 0.1,
    parameterization: str = "eps",
) -> jnp.ndarray:
    """CFG training loss: MSE in epsilon (reference), in y0 for
    ``parameterization="x0"``, or in the velocity
    ``v = sqrt(abar_t) eps - sqrt(1-abar_t) y0`` for ``"v"`` (Salimans &
    Ho 2022 progressive-distillation parameterization — a bounded mix of
    the two targets that avoids the eps=0 collapse mode of scaled-label
    eps training; samplers convert back to epsilon, see :func:`cfg_sample`).

    Reference: ``classifier_free_MSR.py:100-112``.  Timesteps are sampled
    per-row uniform in ``[0, T)``; the condition is dropped (masked to zero
    inside the network) with probability ``uncond_prob`` per sample.
    """
    B = y0.shape[0]
    T = sched.T
    k_t, k_eps, k_mask = jax.random.split(key, 3)
    t = jax.random.randint(k_t, (B,), 0, T)
    noise = jax.random.normal(k_eps, y0.shape, dtype=y0.dtype)
    y_t = q_sample(sched, y0, t, noise)
    cond_mask = jax.random.bernoulli(k_mask, 1.0 - uncond_prob, (B, 1)).astype(y0.dtype)
    t_norm = t.astype(y0.dtype) / T
    pred = apply_fn(params, y_t, t_norm, cond, cond_mask)
    if parameterization == "eps":
        target = noise
    elif parameterization == "x0":
        target = y0
    elif parameterization == "v":
        a = sched.sqrt_alphas_cumprod[t][:, None]
        b = sched.sqrt_one_minus_alphas_cumprod[t][:, None]
        target = a * noise - b * y0
    else:
        raise ValueError(f"unknown parameterization {parameterization!r}")
    return jnp.mean((target - pred) ** 2)


class SampleTrace(NamedTuple):
    """Per-step denoise trajectory captured in the scan carry.

    The reference's ``record_denoise_path`` flag moves data device->host on
    every step (``classifier_free_MSR.py:139-154``); here the trace is a
    scan-stacked on-device tensor transferred once at the end.
    Layout: ``ys[s]`` / ``eps[s]`` is the state / CFG-combined epsilon after
    reverse step ``s`` (s=0 is the first, i.e. t=T-1).
    """

    ys: jnp.ndarray   # (T, B, D)
    eps: jnp.ndarray  # (T, B, D)


def masked_mean_var(y: jnp.ndarray, valid_mask: jnp.ndarray):
    """Mean / unbiased variance over the valid rows only.

    ``valid_mask`` is (B, 1) with 1.0 on real rows, 0.0 on padding.  With an
    all-ones mask this equals ``jnp.mean`` / ``jnp.var(ddof=1)`` up to fp
    reduction order.  Used by serving's bucket padding so pad rows cannot
    perturb the reference's batch-global re-standardization.
    """
    cnt = jnp.sum(valid_mask) * y.shape[1]
    mean = jnp.sum(y * valid_mask) / cnt
    var = jnp.sum(valid_mask * (y - mean) ** 2) / (cnt - 1.0)
    return mean, var


def _reverse_step(
    sched: Schedule,
    y_t: jnp.ndarray,
    i: jnp.ndarray,
    eps_cfg: jnp.ndarray,
    z: jnp.ndarray,
    T: int,
    renorm_steps: int,
    valid_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """One reverse-diffusion update with the reference's exact coefficients."""
    prev = jnp.maximum(i - 1, 0)
    noise_coeff = (1.0 - sched.alphas_cumprod[prev]) / (1.0 - sched.alphas_cumprod[i])
    y_next = (y_t - sched.remove_noise_coeff[i] * eps_cfg) * sched.reciprocal_sqrt_alphas[i] \
        + noise_coeff * z

    # Early-step re-standardization over the whole batch tensor, unbiased
    # variance (torch.var default).  Reference: classifier_free_MSR.py:136-137.
    if valid_mask is None:
        mean = jnp.mean(y_next)
        var = jnp.var(y_next, ddof=1)
    else:
        mean, var = masked_mean_var(y_next, valid_mask)
    y_renorm = (y_next - mean) / jnp.sqrt(var)
    return jnp.where(i > T - 1 - renorm_steps, y_renorm, y_next)


def cfg_sample(
    apply_fn: ApplyFn,
    params: Any,
    sched: Schedule,
    cond: jnp.ndarray,
    omega: float,
    data_dim: int,
    key: Optional[jax.Array] = None,
    init_noise: Optional[jnp.ndarray] = None,
    step_noise: Optional[jnp.ndarray] = None,
    renorm_steps: int = 4,
    record_trace: bool = False,
    compute_dtype: Optional[jnp.dtype] = None,
    valid_mask: Optional[jnp.ndarray] = None,
    guidance_fn: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    guidance_scale: float = 0.0,
    guidance_relative: bool = False,
    parameterization: str = "eps",
    skip_uncond: bool = False,
) -> Tuple[jnp.ndarray, Optional[SampleTrace]]:
    """Batched CFG reverse sampler as a single ``lax.scan``.

    ``parameterization``: "eps" (reference) or "x0" — the denoiser predicts
    y0 directly; CFG combines in x0 space and the prediction is converted
    to an equivalent epsilon before the (unchanged) reference reverse step:
    ``eps = (y_t - sqrt(abar_i) x0_hat) / sqrt(1-abar_i)``.

    Args:
      apply_fn/params: the denoiser.
      sched: coefficient table (defines T).
      cond: (B, C) conditions.
      omega: guidance scale (reference uses 500 for the shipped evals).
      data_dim: solution dimensionality D.
      key: PRNG key; required unless both noise tensors are given.
      init_noise: optional (B, D) y_T override (parity testing).
      step_noise: optional (T, B, D) per-step z override (parity testing);
        entries for steps with ``i <= 1`` are ignored (z forced to 0),
        matching the reference (``:129-130``).
      renorm_steps: number of initial steps with batch re-standardization.
      record_trace: capture the per-step trajectory (scan-carried on device).
      compute_dtype: optional lower-precision dtype (e.g. bfloat16) for the
        denoiser forward; the CFG combine and the posterior update stay f32.
        Pass params already cast to the same dtype for full effect.
      valid_mask: optional (B, 1) 1.0/0.0 mask; when given, the early-step
        re-standardization statistics are computed over the valid rows only
        (serving bucket padding — pad rows must not perturb real rows).
      guidance_fn: optional objective guidance (framework extension): a
        differentiable per-row cost ``(B, D) x0_hat -> (B,)`` to MINIMIZE.
        Each step forms the posterior-mean estimate
        ``x0_hat = (y_t - sqrt(1-abar_i) eps_cfg) / sqrt(abar_i)`` and tilts
        the epsilon toward lower cost:
        ``eps += guidance_scale * sqrt(1-abar_i) * grad(sum cost)(x0_hat)``
        (classifier-guidance geometry with log p ∝ -cost; the derivative is
        taken through the linear map only, not back through the denoiser —
        the standard cheap approximation).  For maximization pass the
        negated objective.  No-op at ``guidance_scale=0``.
      guidance_relative: normalize the cost gradient per row and scale the
        tilt by that row's epsilon RMS, so ``guidance_scale`` is a
        *fraction of the CFG epsilon* rather than an absolute step.  High
        guidance scales (the reference's omega=500-5000 regime) drive the
        state magnitude to O(100-1000) where any fixed absolute gradient
        step is invisible (measured on CO); relative mode stays effective
        at every omega.  Rows at a gradient zero keep shift ~0 (soft
        1e-8 gate in the normalizer).
      skip_uncond: static fast path for ``omega == 0``: run only the
        conditional half of the CFG fold (a B-row forward per step instead
        of 2B).  At omega=0 the combine ``(1+0) eps_cond - 0 eps_uncond``
        is exactly ``eps_cond``, so the math is identical; outputs agree up
        to XLA reassociation (differently-shaped programs fuse the renorm
        reductions differently — measured <1e-5 over a 20-step trajectory)
        at ~2x the throughput.  The caller must guarantee omega == 0
        (dispatch sites check the Python-level omega before tracing).

    Returns ``(y_0, trace_or_None)``.
    """
    B = cond.shape[0]
    T = sched.T
    dtype = cond.dtype

    if init_noise is None or step_noise is None:
        if key is None:
            raise ValueError("cfg_sample needs `key` when noise is not supplied")
        k_init, k_steps = jax.random.split(key)
        if init_noise is None:
            init_noise = jax.random.normal(k_init, (B, data_dim), dtype=dtype)
        if step_noise is None:
            step_noise = jax.random.normal(k_steps, (T, B, data_dim), dtype=dtype)

    # Fold cond/uncond into one 2B forward: rows [0:B] unconditional,
    # rows [B:2B] conditional.  Equivalent to the reference's two model calls
    # (classifier_free_MSR.py:126-127) because the network is per-sample.
    # With skip_uncond (omega==0 fast path) only the conditional half runs.
    if skip_uncond:
        mask1 = jnp.ones((B, 1), dtype)

        def net_cfg(y_t, t_norm):
            if compute_dtype is not None:
                return apply_fn(params, y_t.astype(compute_dtype),
                                t_norm.astype(compute_dtype),
                                cond.astype(compute_dtype),
                                mask1.astype(compute_dtype)).astype(dtype)
            return apply_fn(params, y_t, t_norm, cond, mask1)
    else:
        cond2 = jnp.concatenate([cond, cond], axis=0)
        mask2 = jnp.concatenate(
            [jnp.zeros((B, 1), dtype), jnp.ones((B, 1), dtype)], axis=0
        )

        def net_cfg(y_t, t_norm):
            y2 = jnp.concatenate([y_t, y_t], axis=0)
            if compute_dtype is not None:
                eps2 = apply_fn(params, y2.astype(compute_dtype),
                                t_norm.astype(compute_dtype),
                                cond2.astype(compute_dtype),
                                mask2.astype(compute_dtype)).astype(dtype)
            else:
                eps2 = apply_fn(params, y2, t_norm, cond2, mask2)
            eps_uncond, eps_cond = eps2[:B], eps2[B:]
            return (1.0 + omega) * eps_cond - omega * eps_uncond

    def step(y_t, inp):
        i, z = inp
        # t is constant across the batch within a step: evaluate the time
        # MLP (the widest matmuls in the net) at batch 1 and let the
        # per-block additions broadcast.  Numerically identical to a full-
        # batch t, but removes ~40% of the per-step FLOPs.
        t_norm = jnp.full((1,), i, dtype=dtype) / T
        eps_cfg = net_cfg(y_t, t_norm)
        if parameterization == "x0":
            # model output was x0: the CFG combine above happened in x0
            # space; convert to the equivalent epsilon for the reverse step
            eps_cfg = (y_t - sched.sqrt_alphas_cumprod[i] * eps_cfg) \
                / sched.sqrt_one_minus_alphas_cumprod[i]
        elif parameterization == "v":
            # model output was v = sqrt(abar) eps - sqrt(1-abar) x0; with
            # y_t = sqrt(abar) x0 + sqrt(1-abar) eps the identity
            # eps = sqrt(1-abar) y_t + sqrt(abar) v converts back exactly
            eps_cfg = sched.sqrt_one_minus_alphas_cumprod[i] * y_t \
                + sched.sqrt_alphas_cumprod[i] * eps_cfg
        if guidance_fn is not None:
            sq1m = sched.sqrt_one_minus_alphas_cumprod[i]
            x0_hat = (y_t - sq1m * eps_cfg) / sched.sqrt_alphas_cumprod[i]
            g = jax.grad(lambda x: jnp.sum(guidance_fn(x)))(x0_hat)
            if guidance_relative:
                g = g / (jnp.linalg.norm(g, axis=1, keepdims=True) + 1e-8)
                eps_rms = jnp.sqrt(jnp.mean(eps_cfg**2, axis=1, keepdims=True))
                eps_cfg = eps_cfg + guidance_scale * eps_rms * g
            else:
                eps_cfg = eps_cfg + guidance_scale * sq1m * g
        z = jnp.where(i > 1, z, jnp.zeros_like(z))
        y_next = _reverse_step(sched, y_t, i, eps_cfg, z, T, renorm_steps,
                               valid_mask)
        out = (y_next, eps_cfg) if record_trace else None
        return y_next, out

    steps = jnp.arange(T - 1, -1, -1)
    y0, outs = jax.lax.scan(step, init_noise, (steps, step_noise))
    trace = SampleTrace(ys=outs[0], eps=outs[1]) if record_trace else None
    return y0, trace
