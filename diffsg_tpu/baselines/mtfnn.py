"""MTFNN baseline: supervised MLP regressors (reference ``baselines/MTFNN.py``).

Three per-task MLPs trained with MSE on the oracle labels.  Architectures
match the reference exactly so the shipped ``mtfnn_*.pt`` checkpoints import
1:1 (layer names lin1..lin5 preserved):

  * CO  (``MTFNN.py:44-53``):  9 -> 32 -> 64 -> 16 -> 3, ReLU, Sigmoid head
  * MSR (``MTFNN.py:123-132``): M -> 8 -> 16 -> 8 -> M, ReLU, Softmax head
  * NU  (``MTFNN.py:187-211``): 2K -> 64 -> 32 -> 16 -> 32 -> (2+K), ReLU,
    split head: sigmoid on the 2 coords, softmax on the K powers

Training defaults from the reference: Adam 5e-3, batch 512,
CO/MSR 50 epochs milestones [20]; NU 100 epochs milestones [20, 60];
``init_weights`` (N(0, 0.01) on Linear weights) applied.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax
import flax.linen as nn

from ..train.init import torch_style_init
from ..train.trainer import multistep_lr
from ..utils.torch_import import load_torch_state_dict, sequential_mlp_from_torch


class MLP(nn.Module):
    """lin1..linN MLP with ReLU between layers and a configurable head."""

    features: Sequence[int]
    head: str = "none"  # none | sigmoid | softmax | nu_split

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, name=f"lin{i + 1}")(x)
            if i < len(self.features) - 1:
                x = nn.relu(x)
        if self.head == "sigmoid":
            return jax.nn.sigmoid(x)
        if self.head == "softmax":
            return jax.nn.softmax(x, axis=1)
        if self.head == "nu_split":
            return jnp.concatenate(
                [jax.nn.sigmoid(x[:, :2]), jax.nn.softmax(x[:, 2:], axis=1)], axis=1
            )
        return x


def mtfnn_co_model() -> MLP:
    return MLP(features=(32, 64, 16, 3), head="sigmoid")


def mtfnn_msr_model(M: int = 3) -> MLP:
    return MLP(features=(8, 16, 8, M), head="softmax")


def mtfnn_nu_model(K: int = 3) -> MLP:
    return MLP(features=(64, 32, 16, 32, 2 + K), head="nu_split")


def load_mtfnn_ckpt(path: str, n_layers: int):
    """Convert a reference mtfnn_*.pt into flax params."""
    sd = load_torch_state_dict(path)
    return sequential_mlp_from_torch(sd, [f"lin{i + 1}" for i in range(n_layers)])


@dataclasses.dataclass(frozen=True)
class MTFNNConfig:
    epochs: int = 50
    batch_size: int = 512
    lr: float = 5e-3
    milestones: Sequence[int] = (20,)
    seed: int = 0


def train_mtfnn(model: MLP, X_train: np.ndarray, Y_train: np.ndarray,
                cfg: MTFNNConfig = MTFNNConfig(),
                log_fn: Callable[[str], None] = print, log_every: int = 10):
    """MSE regression train loop, one jitted scan per epoch."""
    key = jax.random.PRNGKey(cfg.seed)
    k_init, k_re, key = jax.random.split(key, 3)
    params = torch_style_init(
        model.init(k_init, jnp.zeros((1, X_train.shape[1])))["params"], k_re
    )
    n = X_train.shape[0]
    batch = min(cfg.batch_size, n)
    steps = max(n // batch, 1)
    optimizer = optax.adam(multistep_lr(cfg.lr, cfg.milestones, steps))
    opt_state = optimizer.init(params)

    X = jnp.asarray(X_train, jnp.float32)
    Y = jnp.asarray(Y_train, jnp.float32)

    @jax.jit
    def epoch_fn(params, opt_state, key):
        perm = jax.random.permutation(key, n)[: steps * batch]
        Xs = X[perm].reshape(steps, batch, -1)
        Ys = Y[perm].reshape(steps, batch, -1)

        def body(carry, batch):
            p, o = carry
            xb, yb = batch
            loss, grads = jax.value_and_grad(
                lambda pp: jnp.mean((yb - model.apply({"params": pp}, xb)) ** 2)
            )(p)
            updates, o = optimizer.update(grads, o, p)
            return (optax.apply_updates(p, updates), o), loss

        (params, opt_state), losses = jax.lax.scan(body, (params, opt_state), (Xs, Ys))
        return params, opt_state, jnp.mean(losses)

    for epoch in range(cfg.epochs):
        key, k = jax.random.split(key)
        params, opt_state, loss = epoch_fn(params, opt_state, k)
        if log_every and (epoch % log_every == 0 or epoch == cfg.epochs - 1):
            log_fn(f"mtfnn epoch {epoch}: loss {float(loss):.6f}")
    return params
