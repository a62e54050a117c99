"""Gap-reporting harness: DDPM vs baselines, OOD sweep, guidance-scale grid.

Produces the comparison table the reference scatters across its __main__
blocks (BASELINE.json configs: "OOD sweep: 20w/30mW/40w OOD splits,
guidance-scale grid + GD/MTFNN/PPO baseline gap eval").

Usage examples:
  python tools/report.py --task nu --ckpt ckpts/ddpm_nu \
      --datasets /root/reference/datasets/3u_18mW_10000samples.csv \
                 /root/reference/datasets/3u_30mW_1000samples_ood.csv \
      --omegas 100 500 1000 --baselines gd \
      --mtfnn-ckpt /root/reference/ckpts/mtfnn_nu.pt \
      --ppo-ckpt /root/reference/ckpts/ppo_nu.pt \
      --out results/nu_report.jsonl
"""

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def baseline_metrics(task_name, data, Y_pred, task):
    from diffsg_tpu.tasks.base import objective_metrics

    return objective_metrics(task, data, Y_pred)


def run_gd(task_name, data, task):
    import jax.numpy as jnp
    from diffsg_tpu.baselines import co_gd_solve, msr_gd_solve, nu_gd_solve

    X_unnorm = task.unnormalize_x(data.X_test, data.config)
    X = jnp.asarray(X_unnorm, jnp.float32)
    if task_name == "msr":
        return np.asarray(msr_gd_solve(X, W=data.config["W"]))
    if task_name == "co":
        return np.asarray(co_gd_solve(X, node_num=data.config["node_num"]))
    # reference GD.py:131 feeds the loader-NORMALIZED coords to the gradient
    X_norm = jnp.asarray(data.X_test, jnp.float32)
    return np.asarray(nu_gd_solve(X_norm, P_sum=data.config["P_sum"]))


def _load_baseline_params(ckpt, torch_loader):
    """Accept either a reference torch .pt file or a framework npz ckpt dir
    (written by tools/train_baselines.py --out)."""
    import pathlib as _pl

    if _pl.Path(ckpt).is_dir():
        from diffsg_tpu.utils import load_checkpoint

        return load_checkpoint(ckpt)["params"]
    return torch_loader()


def run_mtfnn(task_name, data, task, ckpt):
    import jax.numpy as jnp
    from diffsg_tpu.baselines import (
        load_mtfnn_ckpt, mtfnn_co_model, mtfnn_msr_model, mtfnn_nu_model)

    X = jnp.asarray(data.X_test, jnp.float32)
    cfg = data.config
    if task_name == "msr":
        model = mtfnn_msr_model(cfg["M"])
        params = _load_baseline_params(ckpt, lambda: load_mtfnn_ckpt(ckpt, 4))
        return np.asarray(model.apply({"params": params}, X)) * cfg["W"]
    if task_name == "co":
        model = mtfnn_co_model()
        params = _load_baseline_params(ckpt, lambda: load_mtfnn_ckpt(ckpt, 4))
        return np.asarray(model.apply({"params": params}, X))
    model = mtfnn_nu_model(cfg["K"])
    params = _load_baseline_params(ckpt, lambda: load_mtfnn_ckpt(ckpt, 5))
    Y = np.array(model.apply({"params": params}, X))
    Y[:, 0] *= cfg["width"]
    Y[:, 1] *= cfg["height"]
    Y[:, 2:] *= cfg["P_sum"]
    return Y


def run_ppo(task_name, data, task, ckpt):
    import jax
    from diffsg_tpu.baselines import PPOAgent, load_ppo_ckpt, ppo_predict
    from diffsg_tpu.ops import nu_decode

    cfg = data.config
    params = _load_baseline_params(ckpt, lambda: load_ppo_ckpt(ckpt))
    if task_name == "msr":
        agent = PPOAgent(cfg["M"], cfg["M"])
        return np.asarray(ppo_predict(
            agent, params, data.X_test,
            lambda a: jax.nn.softmax(a, axis=1) * cfg["W"]))
    if task_name == "co":
        agent = PPOAgent(3 * cfg["node_num"], cfg["node_num"])
        return np.asarray(ppo_predict(
            agent, params, data.X_test, lambda a: jax.nn.softmax(a, axis=1)))
    agent = PPOAgent(2 * cfg["K"], 2 + cfg["K"])
    return np.asarray(ppo_predict(
        agent, params, data.X_test,
        lambda a: nu_decode(a, cfg["width"], cfg["height"], cfg["P_sum"])))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", choices=["msr", "msr_temp", "msr_wf",
                                       "msr_budget", "co", "co_analytic",
                                       "co_direct", "co_ranked", "nu",
                                       "nu_direct", "nu_budget"], required=True)
    ap.add_argument("--sampler", choices=["ddpm", "ddim"], default="ddpm",
                    help="ddim enables few-step respacing via --n-steps "
                         "(one-command few-step OOD sweeps; fewstep.py "
                         "drives the serving Solver for the same numbers)")
    ap.add_argument("--n-steps", type=int, default=None,
                    help="DDIM respaced step count (default: full T)")
    ap.add_argument("--datasets", nargs="+", required=True)
    ap.add_argument("--ckpt", default=None, help="DDPM checkpoint dir")
    ap.add_argument("--omegas", type=float, nargs="+", default=[500.0])
    ap.add_argument("--baselines", nargs="*", default=[],
                    choices=["gd", "mtfnn", "ppo"])
    ap.add_argument("--mtfnn-ckpt", default=None)
    ap.add_argument("--ppo-ckpt", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--best-of", type=int, default=1,
                    help="best-of-N candidate selection (framework extension)")
    ap.add_argument("--mix-omegas", type=float, nargs="+", default=None,
                    help="per-candidate guidance mixture for best-of (tiled "
                         "to --best-of candidates); overrides --omegas for "
                         "the candidate draws")
    ap.add_argument("--refine-iters", type=int, default=0,
                    help="projected-gradient refinement steps on the task "
                         "objective after decoding (hybrid diffusion + "
                         "local-search mode; tasks.base.refine_solutions)")
    ap.add_argument("--refine-step", type=float, default=None,
                    help="first-step length for --refine-iters (default: "
                         "the task's tuned refine_step)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    # NU sampling quality is matmul-precision sensitive; pin f32 so rows are
    # comparable across backends (see docs/RESULTS.md "Reproduction").
    jax.config.update("jax_default_matmul_precision", "highest")

    from diffsg_tpu.tasks import TASKS, evaluate
    from diffsg_tpu.tasks.base import merge_ckpt_config
    from diffsg_tpu.utils import MetricsLogger, load_checkpoint

    task = TASKS[args.task]
    log = MetricsLogger(args.out)

    for name, ckpt_arg in (("mtfnn", args.mtfnn_ckpt), ("ppo", args.ppo_ckpt)):
        if name in args.baselines and not ckpt_arg:
            sys.exit(f"error: --baselines {name} requires --{name}-ckpt")

    ck = load_checkpoint(args.ckpt) if args.ckpt else None
    for ds in args.datasets:
        data = task.load(ds)
        if ck is not None:
            merge_ckpt_config(data.config, ck.get("metadata"))
            if args.mix_omegas and args.best_of > 1:
                reps = max(args.best_of // len(args.mix_omegas), 1)
                mixture = [w for w in args.mix_omegas for _ in range(reps)]
                m = evaluate(task, ck["params"], ck["sched"], data,
                             omega=mixture, seed=args.seed,
                             best_of=len(mixture), sampler=args.sampler,
                             n_steps=args.n_steps,
                             refine_iters=args.refine_iters,
                             refine_step=args.refine_step)
                log.log({"solver": args.sampler, "task": args.task,
                         "dataset": ds, "omega": f"mix{args.mix_omegas}",
                         "n_steps": args.n_steps, "refine": args.refine_iters,
                         "best_of": len(mixture), **m})
            else:
                for omega in args.omegas:
                    m = evaluate(task, ck["params"], ck["sched"], data,
                                 omega=omega, seed=args.seed,
                                 best_of=args.best_of, sampler=args.sampler,
                                 n_steps=args.n_steps,
                                 refine_iters=args.refine_iters,
                                 refine_step=args.refine_step)
                    log.log({"solver": args.sampler, "task": args.task,
                             "dataset": ds, "omega": omega,
                             "n_steps": args.n_steps,
                             "refine": args.refine_iters,
                             "best_of": args.best_of, **m})
        if "gd" in args.baselines:
            log.log({"solver": "gd", "task": args.task, "dataset": ds,
                     **baseline_metrics(args.task, data,
                                        run_gd(args.task, data, task), task)})
        if "mtfnn" in args.baselines and args.mtfnn_ckpt:
            log.log({"solver": "mtfnn", "task": args.task, "dataset": ds,
                     **baseline_metrics(args.task, data,
                                        run_mtfnn(args.task, data, task,
                                                  args.mtfnn_ckpt), task)})
        if "ppo" in args.baselines and args.ppo_ckpt:
            log.log({"solver": "ppo", "task": args.task, "dataset": ds,
                     **baseline_metrics(args.task, data,
                                        run_ppo(args.task, data, task,
                                                args.ppo_ckpt), task)})


if __name__ == "__main__":
    main()
