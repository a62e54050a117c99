"""Diffusion noise schedules and derived coefficient tables.

TPU-native re-implementation of the schedule capabilities of the reference
DiffSG repo (``ddpm_opt/diffusion.py:17-45`` for the schedules and
``ddpm_opt/classifier_free_MSR.py:81-91`` for the registered coefficient
buffers).  Everything here is pure NumPy/JAX and runs at trace/setup time —
the resulting ``Schedule`` is a pytree of small arrays that is closed over by
the jitted training/sampling programs and lives in device memory.

Numerical quirks reproduced intentionally (required for checkpoint parity):

* The cosine schedule clips betas at **0.84** (not the standard 0.999);
  see ``diffusion.py:34`` in the reference.
* ``remove_noise_coeff = beta_t / sqrt(1 - alpha_bar_t)`` and the sampler's
  added-noise coefficient is the *un-square-rooted* posterior variance ratio
  ``(1 - alpha_bar_{t-1}) / (1 - alpha_bar_t)`` (see sampler module).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp


def cosine_beta_schedule(T: int, s: float = 0.008, beta_clip: float = 0.84) -> np.ndarray:
    """Nichol–Dhariwal cosine schedule over ``T`` steps.

    Matches the reference ``generate_cosine_schedule`` (``diffusion.py:17-35``)
    including its nonstandard ``min(beta, 0.84)`` clip.  Returns ``betas`` of
    shape ``(T,)`` as float64 NumPy (converted to f32 when building a
    :class:`Schedule`).
    """
    t = np.arange(T + 1, dtype=np.float64)
    f = np.cos((t / T + s) / (1 + s) * np.pi / 2) ** 2
    alphas_bar = f / f[0]
    betas = 1.0 - alphas_bar[1:] / alphas_bar[:-1]
    return np.minimum(betas, beta_clip)


def linear_beta_schedule(T: int, low: float, high: float) -> np.ndarray:
    """Linear schedule (reference ``generate_linear_schedule``, ``diffusion.py:37-45``)."""
    return np.linspace(low, high, T)


class Schedule(NamedTuple):
    """Precomputed diffusion coefficients.

    Field-for-field equivalent of the eight registered buffers of the
    reference DDPM (``classifier_free_MSR.py:84-91``); stored as float32
    device arrays, shape ``(T,)`` each.  Being a NamedTuple it is a JAX
    pytree: jitted programs take it as an argument and XLA constant-folds or
    keeps it resident in HBM/VMEM as appropriate.
    """

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    reciprocal_sqrt_alphas: jnp.ndarray
    remove_noise_coeff: jnp.ndarray
    sqrt_betas: jnp.ndarray

    @property
    def T(self) -> int:
        return self.betas.shape[0]


def schedule_from_betas(betas: np.ndarray, dtype=jnp.float32) -> Schedule:
    """Build the full coefficient table from ``betas``.

    All derived quantities are computed in float64 and cast once, mirroring
    the reference which computes with NumPy float64 then casts buffers to
    torch float32.
    """
    betas = np.asarray(betas, dtype=np.float64)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    return Schedule(
        betas=jnp.asarray(betas, dtype=dtype),
        alphas=jnp.asarray(alphas, dtype=dtype),
        alphas_cumprod=jnp.asarray(alphas_cumprod, dtype=dtype),
        sqrt_alphas_cumprod=jnp.asarray(np.sqrt(alphas_cumprod), dtype=dtype),
        sqrt_one_minus_alphas_cumprod=jnp.asarray(np.sqrt(1.0 - alphas_cumprod), dtype=dtype),
        reciprocal_sqrt_alphas=jnp.asarray(np.sqrt(1.0 / alphas), dtype=dtype),
        remove_noise_coeff=jnp.asarray(betas / np.sqrt(1.0 - alphas_cumprod), dtype=dtype),
        sqrt_betas=jnp.asarray(np.sqrt(betas), dtype=dtype),
    )


def cosine_schedule(T: int, s: float = 0.008, beta_clip: float = 0.84) -> Schedule:
    """Convenience: cosine betas -> full :class:`Schedule`."""
    return schedule_from_betas(cosine_beta_schedule(T, s=s, beta_clip=beta_clip))
