"""Serving API: a warmed, jitted solver handle.

The reference's "inference" is a research eval loop; this wraps the engine
the way a production consumer would hold it: load once, warm the compile
cache for fixed batch buckets, then call ``solve`` with raw conditions and
get decoded feasible solutions back.  Guidance scale and candidate count are
runtime knobs (omega is traced; best_of selects via the on-device objective).

Example:
    from diffsg_tpu.serve import Solver
    solver = Solver.from_checkpoint("ckpts/ddpm_nu_3u", task="nu",
                                    dataset_config={"K": 3, "P_sum": 18.0,
                                                    "width": 400, "height": 400})
    Y = solver.solve(X)                      # (B, 5) feasible solutions
    Y = solver.solve(X, omega=2000, best_of=8)
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .diffusion.ddpm import cfg_sample
from .diffusion.ddim import ddim_sample
from .diffusion.schedule import Schedule
from .tasks import TASKS
from .tasks.base import Task, select_best


def suggest_buckets(sizes: Sequence[int], max_buckets: int = 4,
                    align: int = 64, dp: int = 1) -> list:
    """Pick batch-size buckets from an observed request-size histogram.

    Heuristic: upper quantiles of the observed sizes (every request pads UP
    to its bucket, so buckets must sit at the top of each size band),
    rounded up to ``align`` (and to the dp mesh size for meshed solvers),
    deduplicated.  The largest observed size always gets a bucket, so no
    request overflows into an unbucketed compile.  Padding waste is bounded
    by the inter-quantile spread; with uniformly distributed sizes and 4
    buckets the expected waste is ~12%.

    >>> suggest_buckets([30, 60, 100, 500, 510, 520], max_buckets=4)
    [128, 512, 576]
    """
    if not sizes:
        return []
    import math

    a = math.lcm(align, max(1, dp))
    arr = np.sort(np.asarray(sizes))
    qs = np.linspace(1.0 / max_buckets, 1.0, max_buckets)
    picks = sorted({int(-(-int(np.quantile(arr, q, method="higher")) // a) * a)
                    for q in qs})
    return picks


class Solver:
    """A loaded task + checkpoint with jitted single-draw and best-of-N paths.

    ``buckets``: optional batch-size buckets.  When set, conditions are
    padded up to the nearest bucket so repeated calls with varying sizes
    reuse a handful of compiled programs.  The sampler's early-step
    re-standardization and the MSR/NU decoders are batch-global, so a
    validity mask is threaded through both: pad rows are excluded from every
    global reduction, and bucketed results equal unbucketed ones exactly
    (tested: tests/test_serve.py bucket-invariance).  The default (None)
    compiles per distinct batch size.  Noise is drawn row-major outside the
    sampler (see ``_draw_noise``) so per-row results are batch-size-stable;
    this is a different RNG stream than ``tasks.base.evaluate``'s internal
    draws, so per-seed outputs differ from evaluate (same distribution,
    same measured quality).
    """

    def __init__(self, task: Task, params: Any, sched: Schedule,
                 config: Dict, buckets: Optional[Sequence[int]] = None,
                 matmul_precision: Optional[str] = "highest",
                 mesh=None, refine_iters: int = 0,
                 refine_step: Optional[float] = None):
        self.task = task
        self.sched = sched
        self.config = dict(config)
        self.buckets = sorted(buckets) if buckets else None
        # Hybrid mode: projected-gradient polish on the task objective fused
        # after the decode (tasks.base.refine_solutions) — strictly per-row,
        # so bucket padding and mesh sharding stay exact.  Requires the task
        # to define a feasibility projection (raises at first compile if not).
        self.refine_iters = int(refine_iters)
        self.refine_step = refine_step
        # Optional device-mesh scale-out (parallel.mesh): params are placed
        # per their (dp, tp) shardings and each solve's batch is dp-sharded.
        # The sampler/decoder batch-global reductions become cross-chip
        # collectives under GSPMD, so sharded results equal single-device
        # ones (reduction-order tolerance).  Batches are padded up to the
        # next dp multiple with validity-masked rows; explicit bucket sizes
        # must themselves be dp multiples.
        self.mesh = mesh
        if mesh is not None:
            from .parallel import shard_params

            params = shard_params(params, mesh)
        self.params = params
        # NU-style tasks are sensitive to matmul precision at high guidance
        # (~2% less-ratio between TPU-default bf16 matmuls and f32); traces
        # are taken under this precision. None = backend default (faster).
        self.matmul_precision = matmul_precision
        self._model = task.build_model(self.config)
        self._D = task.data_dim(self.config)

        def apply_fn(p, y, t, c, m):
            return self._model.apply({"params": p}, y, t, c, m)

        def _decode(y0, cond_unnorm, valid):
            # valid_mask is passed only in bucket mode so task plugins whose
            # decoders lack the kwarg still work bucket-less.
            kw = {} if valid is None else {"valid_mask": valid}
            if self.task.decode_with_x is not None:
                dec = self.task.decode_with_x(y0, cond_unnorm, self.config,
                                              **kw)
            else:
                dec = self.task.decode(y0, self.config, **kw)
            if self.refine_iters > 0:
                from .tasks.base import refine_solutions

                dec = refine_solutions(self.task, dec, cond_unnorm,
                                       self.config, self.refine_iters,
                                       self.refine_step)
            return dec

        def _draw_noise(key, B):
            # Row-major layout: row r's noise is a function of (key, r) only,
            # independent of the batch size (jax.random fills the flattened
            # array by counter, so a (B, T+1, D) draw is row-prefix-stable).
            # This is what makes bucket padding invisible: a padded batch
            # gives every real row the exact same noise as an unpadded one.
            flat = jax.random.normal(key, (B, self.sched.T + 1, self._D),
                                     jnp.float32)
            return flat[:, 0, :], jnp.transpose(flat[:, 1:, :], (1, 0, 2))

        # `valid` is None (legacy whole-batch semantics, no buckets) or a
        # (B, 1) 1.0/0.0 mask excluding pad rows from batch-global reductions.
        param = self.config.get("parameterization", "eps")

        # `skip` is the static omega==0 fast path (conditional-half-only CFG
        # forwards, identical at omega=0 up to XLA reassociation, ~2x
        # throughput — see diffusion.ddpm.cfg_sample).  _dispatch sets it
        # from the Python-level omega, so it is a separate compile variant.
        def _single(cond, cond_unnorm, key, omega, valid, skip=False):
            init, steps = _draw_noise(key, cond.shape[0])
            y0, _ = cfg_sample(apply_fn, self.params, self.sched, cond,
                               omega, self._D, init_noise=init,
                               step_noise=steps, valid_mask=valid,
                               parameterization=param, skip_uncond=skip)
            return _decode(y0, cond_unnorm, valid)

        def _single_ddim(cond, cond_unnorm, key, omega, n_steps, valid,
                         skip=False, eta=0.0, renorm_steps=None):
            y0, _ = ddim_sample(apply_fn, self.params, self.sched, cond,
                                omega, self._D, key=key, n_steps=n_steps,
                                eta=eta, renorm_steps=renorm_steps,
                                valid_mask=valid, parameterization=param,
                                skip_uncond=skip)
            return _decode(y0, cond_unnorm, valid)

        def _pick(cond, cond_unnorm, key, omegas, valid, draw):
            keys = jax.random.split(key, omegas.shape[0])

            def one(k, w):
                dec = draw(cond, cond_unnorm, k, w, valid)
                return dec, self.task.objective(dec, cond_unnorm, self.config)

            decs, scores = jax.vmap(one)(keys, omegas)
            return select_best(decs, scores, self.task.higher_is_better)

        def _best_of(cond, cond_unnorm, key, omegas, valid, skip=False):
            def draw(c, cu, k, w, v):
                return _single(c, cu, k, w, v, skip)

            return _pick(cond, cond_unnorm, key, omegas, valid, draw)

        def _best_of_ddim(cond, cond_unnorm, key, omegas, n_steps, valid,
                          skip=False, eta=0.0, renorm_steps=None):
            # DDIM is deterministic per init noise; candidate diversity comes
            # from per-candidate init noise (keys) and the omega mixture.
            def draw(c, cu, k, w, v):
                return _single_ddim(c, cu, k, w, n_steps, v, skip, eta,
                                    renorm_steps)

            return _pick(cond, cond_unnorm, key, omegas, valid, draw)

        self._single = jax.jit(_single, static_argnames=("skip",))
        self._single_ddim = jax.jit(
            _single_ddim,
            static_argnames=("n_steps", "skip", "eta", "renorm_steps"))
        self._best_of = jax.jit(_best_of, static_argnames=("skip",))
        self._best_of_ddim = jax.jit(
            _best_of_ddim,
            static_argnames=("n_steps", "skip", "eta", "renorm_steps"))

    @classmethod
    def from_checkpoint(cls, ckpt_dir: str, task: str,
                        dataset_config: Optional[Dict] = None, **kw) -> "Solver":
        """Load a framework checkpoint (utils.checkpoint layout)."""
        from .utils.checkpoint import load_checkpoint

        ck = load_checkpoint(ckpt_dir)
        config = dict(ck["metadata"].get("dataset_config") or {})
        if task.startswith("multi_") and "subtask_configs" in ck["metadata"]:
            # multi-task checkpoint (tools/train_multi.py): start from the
            # wrapper's own subtask config (physics + label transforms) and
            # the shared-net architecture keys
            from .tasks.multi import merge_multi_config

            slot = task.split("_", 1)[1]
            config.update(ck["metadata"]["subtask_configs"].get(slot) or {})
            merge_multi_config(config, ck["metadata"], slot)
        config.update(dataset_config or {})
        return cls(TASKS[task], ck["params"], ck["sched"], config, **kw)

    @classmethod
    def from_torch_checkpoint(cls, pt_path: str, task: str,
                              dataset_config: Dict, **kw) -> "Solver":
        """Load a reference torch DDPM checkpoint directly."""
        from .utils.torch_import import ddpm_from_torch

        params, _, sched, _ = ddpm_from_torch(pt_path)
        return cls(TASKS[task], params, sched, dataset_config, **kw)

    def _bucket(self, n: int) -> int:
        if not self.buckets:
            return n
        for b in self.buckets:
            if n <= b:
                return b
        return n  # larger than the biggest bucket: compile for exact size

    def warmup(self, omega=None,
               sizes: Optional[Sequence[int]] = None,
               sampler: str = "ddpm",
               n_steps: Optional[int] = None,
               best_of: int = 1,
               configs: Optional[Sequence[Dict]] = None) -> None:
        """Pre-compile the solve path for every bucket (or ``sizes``).

        Goes through :meth:`solve` itself so the warmed executable matches
        the serving one by construction — same matmul-precision context,
        same input placement/sharding (mesh), same validity-mask config.

        A production deployment usually serves several configurations
        (single-draw, best-of mixtures, DDIM few-step); pass ``configs`` as
        a list of solve-kwarg dicts to compile EVERY path requests will hit,
        e.g. ``solver.warmup(configs=[{}, {"best_of": 32, "omega": [10, 100,
        1000, 10000]}, {"sampler": "ddim", "n_steps": 3}])`` — otherwise a
        ``solve(best_of=32)`` pays its first compile at request time.
        ``omega`` may be a scalar or (with ``best_of > 1``) a mixture list,
        exactly as in :meth:`solve`.
        """
        cfgs = list(configs) if configs is not None else [
            {"omega": omega, "sampler": sampler, "n_steps": n_steps,
             "best_of": best_of}]
        C = self.task.cond_dim(self.config)
        for b in (sizes or self.buckets or ()):
            for cfg in cfgs:
                self.solve(np.zeros((b, C), np.float32), **cfg)

    def solve(self, X: np.ndarray, omega=None,
              best_of: int = 1, seed: int = 0,
              sampler: str = "ddpm", n_steps: Optional[int] = None,
              eta: float = 0.0, renorm_steps: Optional[int] = None,
              _block: bool = True) -> np.ndarray:
        """Conditions (B, C), loader-normalized -> decoded solutions (B, D).

        omega: scalar or (for best_of > 1) a per-candidate guidance mixture.
        sampler: "ddpm" (reference ancestral sampler) or "ddim"
          (deterministic, supports step respacing via ``n_steps``).
        eta / renorm_steps: DDIM-only knobs (stochasticity on the respaced
          sub-sequence; early-step re-standardization count — defaults to
          the adaptive clamp(n/5, 1, 4)).  Static per-value compile variants.
        """
        omega = self.task.default_omega if omega is None else omega
        n = X.shape[0]
        b = self._bucket(n)
        if self.mesh is not None:
            dp = self.mesh.shape["dp"]
            # Only configured buckets must be dp multiples; sizes larger than
            # the biggest bucket fall through _bucket() as b=n and are padded
            # up to the next dp multiple like the bucketless mesh path.
            if self.buckets and b in self.buckets and b % dp != 0:
                raise ValueError(
                    f"bucket {b} not divisible by dp={dp}; pick bucket "
                    f"sizes that are multiples of the dp mesh size")
            b = -(-b // dp) * dp  # pad up to the next dp multiple
        pad = b - n
        Xp = np.concatenate([X, np.repeat(X[-1:], pad, axis=0)]) if pad else X
        cu_np = np.asarray(
            self.task.unnormalize_x(np.asarray(Xp), self.config), np.float32)
        # When bucketing or meshed, always pass a mask (even at pad=0) so
        # every call of a size class shares one compiled program and pad rows
        # stay out of the batch-global reductions; without either, pass None
        # so no masked reductions appear in the trace (legacy whole-batch
        # semantics, same program structure as tasks.base.evaluate).
        valid_np = None
        if self.buckets or self.mesh is not None:
            valid_np = (np.arange(b) < n).astype(np.float32)[:, None]
        if self.mesh is not None:
            # one transfer per array, placed shard-by-shard on the mesh
            from .parallel import batch_sharding

            s = batch_sharding(self.mesh)
            cond = jax.device_put(np.asarray(Xp, np.float32), s)
            cu = jax.device_put(cu_np, s)
            valid = jax.device_put(valid_np, s)
        else:
            cond = jnp.asarray(Xp, jnp.float32)
            cu = jnp.asarray(cu_np)
            valid = None if valid_np is None else jnp.asarray(valid_np)
        key = jax.random.PRNGKey(seed)
        import contextlib

        prec_ctx = (jax.default_matmul_precision(self.matmul_precision)
                    if self.matmul_precision else contextlib.nullcontext())
        with prec_ctx:
            out = self._dispatch(cond, cu, key, omega, best_of, sampler,
                                 n_steps, valid, eta, renorm_steps)
        return np.asarray(out)[:n] if _block else out[:n]

    def solve_chunked(self, X: np.ndarray, chunk_size: int = 512,
                      seed: int = 0, **kw) -> np.ndarray:
        """Pipelined chunked solve for large batches of conditions.

        Dispatches EVERY chunk before gathering any result: JAX dispatch is
        asynchronous, so chunk i+1's transfer and launch overlap chunk i's
        device compute and the serial per-chunk round-trip (which dominates
        over a tunneled link) is paid once, not per chunk.  Each chunk is
        decoded with its own batch-global statistics — identical to the
        reference's batch-512 eval protocol — and gets its own noise seed
        (``seed`` + chunk index).  Measured (NU, 16k rows in 512-chunks over
        the tunneled v5e, DDIM-5): 1.44x over serial ``solve`` calls with
        bit-identical results.
        """
        pending = [self.solve(X[i:i + chunk_size], seed=seed + j, _block=False,
                              **kw)
                   for j, i in enumerate(range(0, X.shape[0], chunk_size))]
        return np.concatenate([np.asarray(p) for p in pending])

    def _dispatch(self, cond, cu, key, omega, best_of, sampler, n_steps,
                  valid, eta=0.0, renorm_steps=None):
        single = best_of <= 1 and np.isscalar(omega)
        # omega is still a Python scalar/list here: choose the static omega==0
        # fast-path variant (skip the uncond half of the CFG fold) before
        # tracing.  Identical at omega=0 up to XLA reassociation (see
        # cfg_sample); each variant is its own compile, so mixed-omega
        # serving keeps its cached programs.
        skip = bool(np.all(np.asarray(omega, np.float32) == 0.0))
        if not single:
            omegas = jnp.asarray(
                np.full(best_of, omega, np.float32) if np.isscalar(omega)
                else np.asarray(omega, np.float32))
        if sampler == "ddim":
            steps = n_steps or self.sched.T
            if single:
                out = self._single_ddim(cond, cu, key, jnp.float32(omega),
                                        steps, valid, skip=skip, eta=eta,
                                        renorm_steps=renorm_steps)
            else:
                out = self._best_of_ddim(cond, cu, key, omegas, steps, valid,
                                         skip=skip, eta=eta,
                                         renorm_steps=renorm_steps)
        elif single:
            out = self._single(cond, cu, key, jnp.float32(omega), valid,
                               skip=skip)
        else:
            out = self._best_of(cond, cu, key, omegas, valid, skip=skip)
        return out
