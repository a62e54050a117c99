"""Denoise-trajectory capture and export.

The reference's ``record_denoise_path`` detaches every step to host inside
the sampling loop and post-processes with per-step decoders
(``classifier_free_MSR.py:139-154``, trajectory scripts in ``datasets/``).
Here the trace is captured on-device in the sampler's scan carry
(diffusion.ddpm.SampleTrace) and transferred once; this module reproduces
the reference's per-step decode + layout conventions:

  * MSR: the first 3 recorded steps are decoded with a plain row softmax,
    later steps with the full custom decoder (``:145-151``);
  * CO / NU: every step uses the task decoder;
  * output layout: one row per sample, ``T * D`` wide — step-major blocks
    ``[step0 dims..., step1 dims..., ...]`` (transpose(1, 0, 2) + reshape).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..diffusion.ddpm import SampleTrace
from ..ops.decoders import msr_decode, co_decode, nu_decode


def decode_trace(task_name: str, trace: SampleTrace, config: Dict) -> np.ndarray:
    """Per-step decode of a captured trajectory -> (B, T*D) array."""
    ys = trace.ys  # (T, B, D)
    T = ys.shape[0]

    if task_name == "msr":
        def step_decode(i, y):
            return jax.nn.softmax(y, axis=1) if i <= 2 else msr_decode(y)

        decoded = jnp.stack([step_decode(i, ys[i]) for i in range(T)])
    elif task_name == "co":
        decoded = jax.vmap(co_decode)(ys)
    elif task_name == "nu":
        decoded = jnp.stack([
            nu_decode(ys[i], config["width"], config["height"], config["P_sum"])
            for i in range(T)
        ])
    else:
        raise ValueError(f"unknown task {task_name!r}")

    arr = np.asarray(decoded)  # (T, B, D)
    return arr.transpose(1, 0, 2).reshape(arr.shape[1], -1)


def eps_trace(trace: SampleTrace) -> np.ndarray:
    """(B, T*D) layout of the CFG-combined epsilons."""
    arr = np.asarray(trace.eps)
    return arr.transpose(1, 0, 2).reshape(arr.shape[1], -1)
