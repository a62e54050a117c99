"""Task-plugin interface.

The reference repo's three ``classifier_free_*.py`` files are ~85% identical;
the actual per-task surface is: a loader, a denoiser config, a decoder, an
objective, and a metric report.  This module defines that interface once;
``diffsg_tpu.tasks.{msr,co,nu}`` provide the three instances, and the
diffusion engine / trainer / baselines are all task-generic.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.loaders import TaskData
from ..diffusion.ddim import ddim_sample
from ..diffusion.ddpm import cfg_sample
from ..diffusion.schedule import Schedule
from ..train.trainer import TrainConfig


def _make_draw(apply_fn, params, sched, D, sampler: str, n_steps,
               parameterization: str = "eps", skip_uncond: bool = False):
    """Uniform (cond, omega, key) -> y0 draw over the two samplers.

    ``skip_uncond`` is the static omega==0 fast path (conditional-half-only
    forwards, identical at omega=0 up to XLA reassociation — see
    ``cfg_sample``); callers set it from the Python-level omega before
    tracing."""
    if sampler == "ddim":
        steps = n_steps or sched.T

        def draw(cond, omega, key, record_trace=False):
            return ddim_sample(apply_fn, params, sched, cond, omega, D,
                               key=key, n_steps=steps,
                               parameterization=parameterization,
                               skip_uncond=skip_uncond)
    elif sampler == "ddpm":
        def draw(cond, omega, key, record_trace=False):
            return cfg_sample(apply_fn, params, sched, cond, omega, D,
                              key=key, record_trace=record_trace,
                              parameterization=parameterization,
                              skip_uncond=skip_uncond)
    else:
        raise ValueError(f"unknown sampler {sampler!r}")
    return draw


@dataclasses.dataclass(frozen=True)
class Task:
    """One network-optimization problem plugged into the generic engine.

    ``decode(Y_raw, config, valid_mask=None)``: raw sampler output ->
      feasible solutions (unnormalized, ready for the objective).  The
      optional ``valid_mask`` (B, 1) excludes serving pad rows from any
      batch-global reductions (see ops.decoders).
    ``objective(Y_dec, X_unnorm, config)``: per-sample objective values.
    ``unnormalize_x/y``: loader-scaled arrays -> physical units.
    ``higher_is_better``: rate-maximization (MSR, NU) vs cost-minimization (CO).
    """

    name: str
    build_model: Callable[[Dict], Any]
    load: Callable[..., TaskData]
    decode: Callable[[jnp.ndarray, Dict], jnp.ndarray]
    objective: Callable[[jnp.ndarray, jnp.ndarray, Dict], jnp.ndarray]
    unnormalize_x: Callable[[np.ndarray, Dict], np.ndarray]
    unnormalize_y: Callable[[np.ndarray, Dict], np.ndarray]
    higher_is_better: bool
    data_dim: Callable[[Dict], int]
    cond_dim: Callable[[Dict], int]
    train_config: TrainConfig
    default_omega: float = 500.0
    extra_metrics: Optional[Callable[..., Dict[str, float]]] = None
    # optional decoder that also sees the unnormalized condition (e.g. the
    # CO analytic-allocation decode); overrides `decode` in the sample paths
    decode_with_x: Optional[Callable[[jnp.ndarray, jnp.ndarray, Dict],
                                     jnp.ndarray]] = None
    # optional Euclidean feasibility projection in PHYSICAL solution space
    # (identity on feasible points): enables projected-gradient refinement
    # (ops.refine, `refine_solutions`).  Tasks whose continuous block is
    # already closed-form optimal given the discrete decision (CO's
    # ranked/analytic decodes) leave this None — there refinement has
    # nothing continuous left to improve.
    project: Optional[Callable[[jnp.ndarray, jnp.ndarray, Dict],
                               jnp.ndarray]] = None
    # default first-step L2 length for refine_solutions (physical units of
    # the task's solution space, in `refine_precond` metric if set)
    refine_step: float = 0.1
    # optional (D,)-shaped per-dimension step scales (see ops.refine precond)
    refine_precond: Optional[Callable[[Dict], np.ndarray]] = None


#: dataset-config keys owned by the CHECKPOINT (training-time choices), not
#: the dataset: label transforms and model-architecture overrides.
CKPT_CONFIG_KEYS = ("y_scale", "y_shift", "proj_dim", "dims",
                    "parameterization")


def merge_ckpt_config(config: Dict, metadata: Optional[Dict]) -> Dict:
    """Copy checkpoint-owned keys from ckpt metadata's dataset_config into a
    freshly-loaded dataset config (W/P_sum/scalers stay the dataset's own)."""
    md_cfg = (metadata or {}).get("dataset_config") or {}
    for k in CKPT_CONFIG_KEYS:
        if k in md_cfg:
            config[k] = md_cfg[k]
    return config


def sample_solutions(
    task: Task,
    params: Any,
    sched: Schedule,
    X_test: np.ndarray,
    config: Dict,
    omega: Optional[float] = None,
    batch_size: int = 512,
    seed: int = 0,
    record_trace: bool = False,
    sampler: str = "ddpm",
    n_steps: Optional[int] = None,
):
    """Batched sampling over a test split, decoding per batch.

    Decoding happens per batch of ``batch_size`` to reproduce the
    reference's batch-global decoder normalization at eval batch 512.
    ``sampler``: "ddpm" (reference ancestral) or "ddim" (deterministic,
    respaced to ``n_steps``).  Returns (Y_decoded (N, D) np, traces or None).
    """
    model = task.build_model(config)

    def apply_fn(p, y, t, c, m):
        return model.apply({"params": p}, y, t, c, m)

    omega = task.default_omega if omega is None else omega
    D = task.data_dim(config)
    X_unnorm = task.unnormalize_x(X_test, config)
    draw = _make_draw(apply_fn, params, sched, D, sampler, n_steps,
                      config.get("parameterization", "eps"),
                      skip_uncond=(float(omega) == 0.0))

    # omega is a traced argument so guidance-scale grids reuse one compile.
    @jax.jit
    def run(cond, cond_unnorm, key, omega_):
        y0, trace = draw(cond, omega_, key, record_trace=record_trace)
        if task.decode_with_x is not None:
            dec = task.decode_with_x(y0, cond_unnorm, config)
        else:
            dec = task.decode(y0, config)
        return dec, trace

    key = jax.random.PRNGKey(seed)
    outs, traces = [], []
    for i in range(0, X_test.shape[0], batch_size):
        key, k = jax.random.split(key)
        cond = jnp.asarray(X_test[i : i + batch_size], jnp.float32)
        cu = jnp.asarray(X_unnorm[i : i + batch_size], jnp.float32)
        dec, trace = run(cond, cu, k, jnp.float32(omega))
        outs.append(np.asarray(dec))
        if record_trace:
            traces.append(jax.tree.map(np.asarray, trace))
    return np.concatenate(outs), (traces if record_trace else None)


def refine_solutions(task: Task, Y_dec: jnp.ndarray, X_unnorm: jnp.ndarray,
                     config: Dict, iters: int,
                     step: Optional[float] = None) -> jnp.ndarray:
    """Hybrid diffusion + local search: polish decoded solutions with
    ``iters`` projected-gradient steps on the exact task objective
    (ops.refine).  Jit-safe; compose inside any sampling program.  Raises
    for tasks without a feasibility projection (see ``Task.project``)."""
    if task.project is None:
        raise ValueError(
            f"task {task.name!r} has no feasibility projection; "
            "projected-gradient refinement is unsupported (CO's continuous "
            "allocation is already closed-form optimal given the decision)")
    from ..ops.refine import projected_refine

    precond = (None if task.refine_precond is None
               else task.refine_precond(config))
    return projected_refine(
        lambda Y: task.objective(Y, X_unnorm, config),
        lambda Y: task.project(Y, X_unnorm, config),
        Y_dec, iters, task.refine_step if step is None else step,
        higher_is_better=task.higher_is_better, precond=precond)


def select_best(decs: jnp.ndarray, scores: jnp.ndarray,
                higher_is_better: bool) -> jnp.ndarray:
    """Pick the best candidate per sample: decs (n, B, D), scores (n, B)."""
    pick = (jnp.argmax(scores, axis=0) if higher_is_better
            else jnp.argmin(scores, axis=0))
    return jnp.take_along_axis(decs, pick[None, :, None], axis=0)[0]


def objective_metrics(task: Task, data: TaskData, Y_pred: np.ndarray
                      ) -> Dict[str, float]:
    """The reference's ratio/diff metric block for any solver's predictions."""
    X_unnorm = task.unnormalize_x(data.X_test, data.config)
    Y_true = task.unnormalize_y(data.Y_test, data.config)
    pred = np.asarray(task.objective(
        jnp.asarray(Y_pred, jnp.float32), jnp.asarray(X_unnorm, jnp.float32),
        data.config))
    true = np.asarray(task.objective(
        jnp.asarray(Y_true, jnp.float32), jnp.asarray(X_unnorm, jnp.float32),
        data.config))
    name = "less_ratio" if task.higher_is_better else "exceeded_ratio"
    return {name: float(pred.sum() / true.sum()),
            "avg_diff": float((pred - true).mean())}


def sample_best_of_n(
    task: Task,
    params: Any,
    sched: Schedule,
    X_test: np.ndarray,
    config: Dict,
    n: int = 8,
    omega=None,
    batch_size: int = 512,
    seed: int = 0,
    sampler: str = "ddpm",
    n_steps: Optional[int] = None,
) -> np.ndarray:
    """Best-of-N solution selection (a capability beyond the reference).

    Draws ``n`` independent reverse-diffusion candidates per condition and
    keeps the one with the best task objective — the objective evaluators
    are vmapped on-device, so selection costs one extra elementwise pass.
    Classical solvers (GD/GEKKO) also exploit objective access; the
    reference DDPM evals use a single draw.

    ``omega`` may be a scalar, or a sequence of per-candidate guidance
    scales (overriding ``n``): a guidance **mixture** — low-omega candidates
    add decision diversity, high-omega ones add precision.  Measured on CO:
    16 candidates at mixed [30, 150, 1000, 5000] reach exceeded ratio 1.009
    vs 1.025 for 16 at a uniform omega=5000.

    Returns the selected decoded solutions (N_test, D).
    """
    model = task.build_model(config)

    def apply_fn(p, y, t, c, m):
        return model.apply({"params": p}, y, t, c, m)

    if omega is None:
        omega = task.default_omega
    omegas = (np.full(n, omega, np.float32) if np.isscalar(omega)
              else np.asarray(omega, np.float32))
    n = len(omegas)
    D = task.data_dim(config)
    X_unnorm = task.unnormalize_x(X_test, config)
    draw = _make_draw(apply_fn, params, sched, D, sampler, n_steps,
                      config.get("parameterization", "eps"),
                      skip_uncond=bool(np.all(omegas == 0.0)))

    @jax.jit
    def run(cond, cond_unnorm, key, omegas_):
        keys = jax.random.split(key, n)

        def one(k, w):
            y0, _ = draw(cond, w, k)
            if task.decode_with_x is not None:
                dec = task.decode_with_x(y0, cond_unnorm, config)
            else:
                dec = task.decode(y0, config)
            return dec, task.objective(dec, cond_unnorm, config)

        decs, scores = jax.vmap(one)(keys, omegas_)   # (n, B, D), (n, B)
        return select_best(decs, scores, task.higher_is_better)

    key = jax.random.PRNGKey(seed)
    outs = []
    for i in range(0, X_test.shape[0], batch_size):
        key, k = jax.random.split(key)
        cond = jnp.asarray(X_test[i : i + batch_size], jnp.float32)
        cu = jnp.asarray(X_unnorm[i : i + batch_size], jnp.float32)
        outs.append(np.asarray(run(cond, cu, k, jnp.asarray(omegas))))
    return np.concatenate(outs)


def evaluate(
    task: Task,
    params: Any,
    sched: Schedule,
    data: TaskData,
    omega: Optional[float] = None,
    batch_size: int = 512,
    seed: int = 0,
    best_of: int = 1,
    sampler: str = "ddpm",
    n_steps: Optional[int] = None,
    refine_iters: int = 0,
    refine_step: Optional[float] = None,
) -> Dict[str, float]:
    """Reference metric block: objective ratio + avg diff (+ task extras).

    "less ratio" (maximization) / "exceeded ratio" (minimization)
    = sum(pred objective) / sum(true objective)
    (``classifier_free_MSR.py:297``, ``_CO.py:353``, ``_NU.py:360``).

    ``refine_iters`` > 0 appends projected-gradient refinement
    (``refine_solutions``) to the decoded samples — the hybrid
    diffusion + local-search mode; report such rows as hybrid, not
    single-draw parity.
    """
    if best_of > 1:
        Y_dec = sample_best_of_n(task, params, sched, data.X_test, data.config,
                                 n=best_of, omega=omega,
                                 batch_size=batch_size, seed=seed,
                                 sampler=sampler, n_steps=n_steps)
    else:
        Y_dec, _ = sample_solutions(
            task, params, sched, data.X_test, data.config, omega, batch_size,
            seed, sampler=sampler, n_steps=n_steps
        )
    X_unnorm = task.unnormalize_x(data.X_test, data.config)
    Y_true = task.unnormalize_y(data.Y_test, data.config)

    if refine_iters > 0:
        rf = jax.jit(lambda Y, X: refine_solutions(
            task, Y, X, data.config, refine_iters, refine_step))
        Y_dec = np.asarray(rf(jnp.asarray(Y_dec, jnp.float32),
                              jnp.asarray(X_unnorm, jnp.float32)))

    pred = np.asarray(task.objective(
        jnp.asarray(Y_dec, jnp.float32), jnp.asarray(X_unnorm, jnp.float32), data.config
    ))
    true = np.asarray(task.objective(
        jnp.asarray(Y_true, jnp.float32), jnp.asarray(X_unnorm, jnp.float32), data.config
    ))

    ratio_name = "less_ratio" if task.higher_is_better else "exceeded_ratio"
    metrics = {
        ratio_name: float(pred.sum() / true.sum()),
        "avg_diff": float((pred - true).mean()),
        "n_samples": float(len(pred)),
    }
    if task.extra_metrics is not None:
        metrics.update(task.extra_metrics(Y_dec, Y_true, pred, true, data.config))
    return metrics
