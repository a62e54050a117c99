"""EMA shadow parameters.

Functional equivalent of the reference's ``ExponentialMovingAverage``
(``ddpm_opt/ema.py``, a torch ``AveragedModel`` with
``ema = decay * ema + (1 - decay) * param`` and ``use_buffers=True``).

torch semantics reproduced: the **first** ``update`` copies the parameters
(AveragedModel initializes the average on first call); subsequent updates
apply the exponential rule.  ``n_averaged`` is carried so converted
checkpoints round-trip.  The reference trainers construct EMA but ship with
``use_ema=False`` — the shadow copy still lives in every checkpoint, so we
always carry it.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EmaState(NamedTuple):
    params: Any
    n_averaged: jnp.ndarray  # scalar int32


def ema_init(params: Any) -> EmaState:
    return EmaState(params=jax.tree.map(jnp.copy, params), n_averaged=jnp.zeros((), jnp.int32))


def ema_update(state: EmaState, params: Any, decay: float) -> EmaState:
    def blend(avg, p):
        return jnp.where(state.n_averaged == 0, p, decay * avg + (1.0 - decay) * p)

    return EmaState(
        params=jax.tree.map(blend, state.params, params),
        n_averaged=state.n_averaged + 1,
    )
