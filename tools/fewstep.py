"""Few-step serving quality table: DDIM respacing vs the T-step DDPM sampler.

The reference always samples at the training T (20 ancestral steps,
``classifier_free_MSR.py:124``); the framework's DDIM sampler
(diffusion/ddim.py) respaces any checkpoint to n steps at serving time.
This CLI measures the quality/steps tradeoff per task through the serving
``Solver`` (the exact production path), printing one JSON line per
(dataset, sampler, steps) row.

Usage:
  python tools/fewstep.py --task nu_direct --ckpt ckpts/ddpm_nu_3u_aug_s8 \
      --datasets /root/reference/datasets/3u_18mW_10000samples.csv \
      --omega 1 --steps 3 5 10 20
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--datasets", nargs="+", required=True)
    ap.add_argument("--omega", type=float, default=None)
    ap.add_argument("--steps", type=int, nargs="+", default=[3, 5, 10, 20])
    ap.add_argument("--best-of", type=int, default=1)
    ap.add_argument("--eta", type=float, default=0.0,
                    help="DDIM stochasticity on the respaced sub-sequence "
                         "(0 = deterministic, 1 = DDPM-like)")
    ap.add_argument("--renorm-steps", type=int, default=None,
                    help="early-step re-standardization count override "
                         "(default: adaptive clamp(n/5, 1, 4))")
    ap.add_argument("--batch", type=int, default=512,
                    help="eval batch (reference protocol: 512)")
    ap.add_argument("--limit", type=int, default=None,
                    help="evaluate only the first N test rows (smoke runs)")
    ap.add_argument("--no-ddpm-row", action="store_true",
                    help="skip the full-T ancestral-sampler reference row")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from diffsg_tpu.serve import Solver
    from diffsg_tpu.tasks import TASKS
    from diffsg_tpu.tasks.base import objective_metrics

    task = TASKS[args.task]
    omega = task.default_omega if args.omega is None else args.omega

    def run(solver, data, sampler, n_steps):
        outs = []
        t0 = time.time()
        for i, lo in enumerate(range(0, data.X_test.shape[0], args.batch)):
            X = np.asarray(data.X_test[lo:lo + args.batch])
            kw = {}
            if sampler == "ddim":
                kw = {"eta": args.eta, "renorm_steps": args.renorm_steps}
            outs.append(solver.solve(X, omega=omega, best_of=args.best_of,
                                     seed=i, sampler=sampler, n_steps=n_steps,
                                     **kw))
        return np.concatenate(outs), time.time() - t0

    for ds in args.datasets:
        data = task.load(ds)
        if args.limit:
            data.X_test = data.X_test[:args.limit]
            data.Y_test = data.Y_test[:args.limit]
        # per-dataset solver: the DATASET owns physical config (W, P_sum,
        # scaler min/max — OOD splits differ from the training ones), while
        # the CHECKPOINT owns training-time keys (y_scale, y_shift) that
        # from_checkpoint keeps when absent from dataset_config.
        solver = Solver.from_checkpoint(args.ckpt, task=args.task,
                                        dataset_config=data.config)
        from diffsg_tpu.tasks.base import merge_ckpt_config

        merge_ckpt_config(data.config, {"dataset_config": solver.config})
        rows = ([] if args.no_ddpm_row else [("ddpm", None)])
        rows += [("ddim", s) for s in args.steps]
        for sampler, n_steps in rows:
            Y, secs = run(solver, data, sampler, n_steps)
            m = objective_metrics(task, data, Y)
            if task.extra_metrics is not None:
                import jax.numpy as jnp

                Xu = task.unnormalize_x(data.X_test, data.config)
                Yt = task.unnormalize_y(data.Y_test, data.config)
                pred = np.asarray(task.objective(
                    jnp.asarray(Y, jnp.float32), jnp.asarray(Xu, jnp.float32),
                    data.config))
                true = np.asarray(task.objective(
                    jnp.asarray(Yt, jnp.float32), jnp.asarray(Xu, jnp.float32),
                    data.config))
                m.update(task.extra_metrics(Y, Yt, pred, true, data.config))
            extra = {}
            if sampler == "ddim" and (args.eta or
                                      args.renorm_steps is not None):
                extra = {"eta": args.eta, "renorm_steps": args.renorm_steps}
            print(json.dumps({
                "task": args.task, "dataset": ds, "sampler": sampler,
                "steps": n_steps or int(solver.sched.T),
                "omega": omega, "best_of": args.best_of, **extra,
                "elapsed_s": round(secs, 2), **m}, ), flush=True)


if __name__ == "__main__":
    main()
