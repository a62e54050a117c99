"""Seed-value study for hybrid refinement (ops.refine) on NU.

Question: is the diffusion seed worth anything once you have a projected-
gradient refiner, or would random multi-start reach the same basins?
Compares, on the full NU test split (ratios vs the oracle grid labels):

  * random single-start refine (1 start/row)
  * random multi-start refine (--starts N, best rate per row)
  * diffusion seed (headline nu_budget ckpt, single draw) + refine
  * each at --iters and at 4x --iters (is the gap basin or convergence?)

All starts are feasible (projected) and every arm uses the identical
refiner (ops.refine.projected_refine with the task's projection and
preconditioning), so the only variable is WHERE the local search starts.

Usage: python tools/refine_study.py [--iters 50] [--starts 32] [--cpu]
"""

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REF = "/root/reference/datasets"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--starts", type=int, default=32)
    ap.add_argument("--ckpt", default="ckpts/ddpm_nu_budget")
    ap.add_argument("--dataset", default=f"{REF}/3u_18mW_10000samples.csv")
    ap.add_argument("--omega", type=float, default=0.06)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_default_matmul_precision", "highest")

    import jax.numpy as jnp

    from diffsg_tpu.ops.refine import projected_refine
    from diffsg_tpu.tasks import TASKS
    from diffsg_tpu.tasks.base import merge_ckpt_config, sample_solutions
    from diffsg_tpu.utils import load_checkpoint

    task = TASKS["nu_budget"]
    data = task.load(args.dataset)
    ck = load_checkpoint(args.ckpt)
    merge_ckpt_config(data.config, ck.get("metadata"))
    cfg = data.config

    Xu = jnp.asarray(task.unnormalize_x(data.X_test, cfg), jnp.float32)
    Y_true = task.unnormalize_y(data.Y_test, cfg)
    true_sum = float(np.asarray(task.objective(
        jnp.asarray(Y_true, jnp.float32), Xu, cfg)).sum())
    B = Xu.shape[0]
    K = cfg["K"]

    obj = lambda Y: task.objective(Y, Xu, cfg)
    proj = lambda Y: task.project(Y, Xu, cfg)
    precond = task.refine_precond(cfg) if task.refine_precond else None

    def refine(Y0, iters):
        return projected_refine(obj, proj, Y0, iters, task.refine_step,
                                higher_is_better=task.higher_is_better,
                                precond=precond)

    refine_j = jax.jit(refine, static_argnums=1)

    def ratio(Y):
        return float(np.asarray(obj(jnp.asarray(Y))).sum()) / true_sum

    def rand_start(key):
        kxy, kp = jax.random.split(key)
        xy = jax.random.uniform(kxy, (B, 2), jnp.float32) * jnp.asarray(
            [cfg["width"], cfg["height"]], jnp.float32)
        P = jax.random.uniform(kp, (B, K), jnp.float32)
        return proj(jnp.concatenate([xy, P], axis=1))

    out = {"iters": args.iters, "starts": args.starts,
           "dataset": args.dataset, "n": B, "labels": 1.0}

    key = jax.random.PRNGKey(args.seed)
    for iters in (args.iters, 4 * args.iters):
        # random single start
        Y1 = refine_j(rand_start(key), iters)
        out[f"random1_it{iters}"] = ratio(Y1)

        # random multi-start: best objective per row across starts
        best = Y1
        best_r = obj(Y1)
        for i in range(1, args.starts):
            Yi = refine_j(rand_start(jax.random.fold_in(key, i)), iters)
            ri = obj(Yi)
            take = ri > best_r
            best = jnp.where(take[:, None], Yi, best)
            best_r = jnp.where(take, ri, best_r)
        out[f"random{args.starts}_it{iters}"] = ratio(best)

        # diffusion seed (single draw) + refine
        Yd, _ = sample_solutions(task, ck["params"], ck["sched"],
                                 data.X_test, cfg, omega=args.omega,
                                 seed=args.seed)
        Yd = jnp.asarray(Yd, jnp.float32)
        out[f"diffusion_it{iters}"] = ratio(refine_j(Yd, iters))
        if iters == args.iters:
            out["diffusion_it0"] = ratio(Yd)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
