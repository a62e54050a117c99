"""Jitted CFG-DDPM trainer.

The reference train loops (``classifier_free_MSR.py:187-236`` and the CO/NU
twins) are host-side Python: per-batch host->device transfer, eager torch
ops, EMA gating flags.  Here the whole epoch is **one jitted program**: the
dataset lives in device memory, each epoch draws a fresh permutation, and a
``lax.scan`` runs `steps_per_epoch` fused train steps (forward + backward +
Adam update + optional EMA blend) without returning to Python.  On TPU this
keeps the MXU fed and removes per-batch dispatch entirely.

Reference hyperparameters are the defaults (Adam lr 5e-3, MultiStepLR with
gamma 0.1 at per-task milestones, batch 512, 200 epochs, uncond_prob 0.1,
EMA decay 0.9999 / start 10 / update-rate 5 with use_ema=False).

Deviation (documented): batches are drawn as `floor(N/B)` full batches per
epoch from a fresh permutation — the reference's torch DataLoader also
shuffles per epoch but keeps a smaller remainder batch.  Dropping the
remainder keeps shapes static under jit; every sample still appears in
expectation.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..diffusion.ddpm import ddpm_loss
from ..diffusion.schedule import Schedule, cosine_schedule
from .ema import EmaState, ema_init, ema_update


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Per-task training hyperparameters (reference defaults).

    milestones are epoch indices for the LR x0.1 drops:
    MSR [100,150] (``classifier_free_MSR.py:214``), CO [15,80,150]
    (``_CO.py:230``), NU [80,200] (``_NU.py:242``).
    """

    epochs: int = 200
    batch_size: int = 512
    lr: float = 5e-3
    milestones: Sequence[int] = (100, 150)
    lr_gamma: float = 0.1
    T: int = 20
    uncond_prob: float = 0.1
    use_ema: bool = False
    ema_decay: float = 0.9999
    ema_start: int = 10
    ema_update_rate: int = 5
    warmup_epoch: int = 5
    seed: int = 0
    #: optional global-norm gradient clip (framework extension, default off =
    #: the reference's bare Adam).  Scaled-label training (--y-scale) can
    #: diverge mid-run at the reference lr (observed: CO y_scale-2 collapses
    #: to the trivial eps=0 minimum between epochs 10-20); clipping tames it
    #: without changing the reference-parity default path.
    grad_clip: Optional[float] = None
    #: "eps" (reference), "x0" (predict y0 directly), or "v" (velocity
    #: sqrt(abar) eps - sqrt(1-abar) y0; Salimans & Ho 2022).  Framework
    #: extension; samplers convert back to epsilon — see
    #: diffusion.ddpm.cfg_sample.
    parameterization: str = "eps"


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    ema: EmaState
    step: jnp.ndarray  # global step counter (int32)


def multistep_lr(base_lr: float, milestones: Sequence[int], steps_per_epoch: int,
                 gamma: float = 0.1) -> optax.Schedule:
    """torch MultiStepLR: multiply lr by gamma at each milestone epoch."""
    boundaries = {int(m) * steps_per_epoch: gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    sched = multistep_lr(cfg.lr, cfg.milestones, steps_per_epoch, cfg.lr_gamma)
    # torch Adam defaults: b1=0.9, b2=0.999, eps=1e-8 — optax matches.
    adam = optax.adam(sched)
    if cfg.grad_clip is not None:
        return optax.chain(optax.clip_by_global_norm(cfg.grad_clip), adam)
    return adam


def build_train_epoch(
    apply_fn: Callable,
    sched: Schedule,
    optimizer: optax.GradientTransformation,
    cfg: TrainConfig,
    n_samples: int,
) -> Callable:
    """Returns a jitted ``epoch_fn(state, X, Y, key) -> (state, mean_loss)``.

    X: (N, C) conditions, Y: (N, D) solutions — both resident device arrays.
    """
    B = min(cfg.batch_size, n_samples)
    steps = max(n_samples // B, 1)

    def train_step(state: TrainState, batch, key) -> Tuple[TrainState, jnp.ndarray]:
        x, y = batch

        def loss_fn(p):
            return ddpm_loss(apply_fn, p, sched, y, x, key, cfg.uncond_prob,
                             cfg.parameterization)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        step = state.step + 1

        if cfg.use_ema:
            # reference gating: epoch > warmup, step_cnt > ema_start,
            # step_cnt % ema_update_rate == 0 (classifier_free_MSR.py:227-229)
            epoch_idx = state.step // steps
            do_ema = jnp.logical_and(
                epoch_idx > cfg.warmup_epoch,
                jnp.logical_and(step > cfg.ema_start, step % cfg.ema_update_rate == 0),
            )
            new_ema = ema_update(state.ema, params, cfg.ema_decay)
            ema = jax.tree.map(
                lambda a, b: jnp.where(do_ema, a, b), new_ema, state.ema
            )
        else:
            ema = state.ema
        return TrainState(params, opt_state, ema, step), loss

    # the TrainState is donated: its buffers are reused in place across
    # epochs instead of round-tripping through fresh HBM allocations
    @partial(jax.jit, donate_argnums=(0,))
    def epoch_fn(state: TrainState, X, Y, key):
        k_perm, k_steps = jax.random.split(key)
        perm = jax.random.permutation(k_perm, n_samples)[: steps * B]
        Xs = X[perm].reshape(steps, B, -1)
        Ys = Y[perm].reshape(steps, B, -1)
        step_keys = jax.random.split(k_steps, steps)

        def body(state, inp):
            xb, yb, k = inp
            return train_step(state, (xb, yb), k)

        state, losses = jax.lax.scan(body, state, (Xs, Ys, step_keys))
        return state, jnp.mean(losses)

    return epoch_fn


def train_ddpm(
    model,
    X_train: np.ndarray,
    Y_train: np.ndarray,
    cfg: TrainConfig,
    init_params: Optional[Any] = None,
    log_every: int = 10,
    log_fn: Callable[[str], None] = print,
    resume_state: Optional[dict] = None,
    checkpoint_every: int = 0,
    checkpoint_dir: Optional[str] = None,
) -> Tuple[Any, EmaState, Schedule]:
    """Full training run for one task.  Returns (params, ema, schedule).

    Mid-training resume (a capability beyond the reference's bare
    state_dict persistence): pass ``checkpoint_every``/``checkpoint_dir``
    to persist {params, EMA, optimizer state, global step} periodically,
    and ``resume_state`` (the dict from ``utils.checkpoint.load_checkpoint``)
    to continue exactly where a run stopped — the epoch RNG stream is
    derived from the epoch index, so a resumed run consumes the same keys
    the uninterrupted run would have.
    """
    from .init import torch_style_init

    sched = cosine_schedule(cfg.T)
    root_key = jax.random.PRNGKey(cfg.seed)
    k_init, k_reinit, root_key = jax.random.split(root_key, 3)

    D, C = Y_train.shape[1], X_train.shape[1]
    variables = model.init(
        k_init, jnp.zeros((1, D)), jnp.zeros((1,)), jnp.zeros((1, C)), jnp.ones((1, 1))
    )
    params = init_params if init_params is not None else torch_style_init(
        variables["params"], k_reinit
    )

    def apply_fn(p, y, t, c, m):
        return model.apply({"params": p}, y, t, c, m)

    n = X_train.shape[0]
    steps_per_epoch = max(n // cfg.batch_size, 1)
    optimizer = make_optimizer(cfg, steps_per_epoch)
    state = TrainState(
        params=params,
        opt_state=optimizer.init(params),
        ema=ema_init(params),
        step=jnp.zeros((), jnp.int32),
    )
    start_epoch = 0
    if resume_state is not None:
        state, start_epoch = restore_train_state(resume_state, optimizer, state)

    epoch_fn = build_train_epoch(apply_fn, sched, optimizer, cfg, n)

    X = jnp.asarray(X_train, jnp.float32)
    Y = jnp.asarray(Y_train, jnp.float32)
    for epoch in range(start_epoch, cfg.epochs):
        k = jax.random.fold_in(root_key, epoch)
        state, loss = epoch_fn(state, X, Y, k)
        if log_every and (epoch % log_every == 0 or epoch == cfg.epochs - 1):
            log_fn(f"epoch {epoch}: loss {float(loss):.6f}")
        if checkpoint_every and checkpoint_dir and (epoch + 1) % checkpoint_every == 0:
            from ..utils.checkpoint import save_checkpoint

            save_checkpoint(checkpoint_dir, state.params, ema=state.ema,
                            opt_state=state.opt_state, step=int(state.step),
                            sched=sched, metadata={"epoch": epoch + 1})
    return state.params, state.ema, sched


def restore_train_state(ck: dict, optimizer, template: TrainState
                        ) -> Tuple[TrainState, int]:
    """Rebuild a TrainState from a loaded checkpoint dict.

    The optimizer state is restored by mapping the flat-saved arrays onto a
    freshly initialized opt_state of identical structure.
    """
    params = jax.tree.map(jnp.asarray, ck["params"])
    ema = ck.get("ema")
    if ema is None:
        ema = ema_init(params)
    else:
        ema = EmaState(jax.tree.map(jnp.asarray, ema.params),
                       jnp.asarray(ema.n_averaged))
    opt_state = template.opt_state
    if "opt_state_raw" in ck:
        saved_map = _flatten_strkeys(ck["opt_state_raw"])
        fresh = optimizer.init(params)
        flat_fresh, treedef = jax.tree_util.tree_flatten_with_path(fresh)
        rebuilt = []
        for path, leaf in flat_fresh:
            key = "/".join(_path_str(p) for p in path)
            if key in saved_map:
                rebuilt.append(jnp.asarray(saved_map[key]).astype(leaf.dtype))
            else:
                rebuilt.append(leaf)
        opt_state = jax.tree_util.tree_unflatten(treedef, rebuilt)
    step = int(ck.get("step", 0))
    state = TrainState(params, opt_state, ema, jnp.asarray(step, jnp.int32))
    epoch = int(ck.get("metadata", {}).get("epoch", 0))
    return state, epoch


def _path_str(p) -> str:
    # must stay string-identical to utils.checkpoint._flatten's key scheme
    from ..utils.checkpoint import path_component_str

    return path_component_str(p)


def _flatten_strkeys(tree, prefix="") -> dict:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten_strkeys(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = tree
    return out
