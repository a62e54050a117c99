"""Train the W-conditioned MSR DDPM (``msr_budget`` task).

MSR instance of the trained conditioning capability (see
tools/train_nu_budget.py for the NU one; reference designed-but-disabled
hook: ``classifier_free_MSR.py:32-46`` / the ``cdim`` config key): the
condition carries ``W / w_ref`` so ONE model serves any power budget.

Training data is generated in-memory (the waterfilling oracle labels
~20k samples/s): per-sample W drawn from a grid EXCLUDING the eval
budgets 10 and 20, exact feasible optimum labels.  Per-row centering
uses W_row/M (the MSR-3c recipe's y-shift, which was the scalar W/M
there); the msr_wf simplex-projection decode is invariant to per-row
constant shifts, so no inverse shift is needed at decode.
"""

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=100000)
    ap.add_argument("--channels", type=int, default=3)
    ap.add_argument("--w-min", type=float, default=5.0)
    ap.add_argument("--w-max", type=float, default=25.0)
    ap.add_argument("--w-step", type=float, default=1.0)
    ap.add_argument("--exclude-budgets", type=float, nargs="*",
                    default=[10.0, 20.0])
    ap.add_argument("--indist", default="/root/reference/datasets/3c_10w_10000samples.csv")
    ap.add_argument("--ood", default="/root/reference/datasets/3c_20w_2000samples_ood.csv")
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--milestones", type=int, nargs="+", default=None)
    ap.add_argument("--y-scale", type=float, default=3.0)
    ap.add_argument("--proj-dim", type=int, default=None,
                    help="UNet proj width (model-zoo scaling knob; default "
                         "128 via tasks/msr.py build_model)")
    ap.add_argument("--dims", type=int, nargs="+", default=None,
                    help="UNet stage widths (default 64 32 16 8)")
    ap.add_argument("--grad-clip", type=float, default=1.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--omegas", type=float, nargs="+",
                    default=[0.5, 1.0, 2.0])
    ap.add_argument("--out", default="ckpts/ddpm_msr_budget")
    args = ap.parse_args()

    import dataclasses
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_default_matmul_precision", "highest")

    from diffsg_tpu.data.generators import msr_waterfilling_labels
    from diffsg_tpu.data.loaders import MSR_W_REF
    from diffsg_tpu.tasks import TASKS, evaluate
    from diffsg_tpu.train import train_ddpm
    from diffsg_tpu.utils import save_checkpoint

    task = TASKS["msr_budget"]
    M = args.channels
    grid = np.arange(args.w_min, args.w_max + 1e-9, args.w_step)
    grid = np.array([w for w in grid
                     if not any(abs(w - e) < 1e-9
                                for e in args.exclude_budgets)])
    rng = np.random.default_rng(args.seed)
    gs = rng.uniform(0.5, 2.5, size=(args.samples, M))
    Ws = rng.choice(grid, size=args.samples)
    Y = np.zeros_like(gs)
    for w in grid:
        idx = np.nonzero(Ws == w)[0]
        _, Y[idx] = msr_waterfilling_labels(gs[idx], float(w))
    print(f"train rows: {args.samples} over {len(grid)} budgets "
          f"{grid[0]}..{grid[-1]} W (excluded: {args.exclude_budgets})")

    scaler_min, scaler_max = float(gs.min()), float(gs.max())
    X = np.concatenate([(gs - scaler_min) / (scaler_max - scaler_min),
                        Ws[:, None] / MSR_W_REF], axis=1)
    Y_t = (Y - Ws[:, None] / M) * args.y_scale  # per-row centered, scaled

    cfg_d = {"M": M, "W": MSR_W_REF, "w_ref": MSR_W_REF,
             "scaler_min": scaler_min, "scaler_max": scaler_max,
             "y_scale": args.y_scale}
    if args.proj_dim:
        cfg_d["proj_dim"] = args.proj_dim
    if args.dims:
        cfg_d["dims"] = tuple(args.dims)
    model = task.build_model(cfg_d)
    overrides = {k: v for k, v in [("epochs", args.epochs), ("lr", args.lr),
                                   ("seed", args.seed),
                                   ("grad_clip", args.grad_clip),
                                   ("milestones", tuple(args.milestones)
                                    if args.milestones else None)]
                 if v is not None}
    cfg = dataclasses.replace(task.train_config, **overrides)
    params, ema, sched = train_ddpm(model, X, Y_t, cfg, log_every=25)
    save_checkpoint(args.out, params, ema=ema, sched=sched, step=cfg.epochs,
                    metadata={"task": "msr_budget",
                              "budgets": [float(w) for w in grid],
                              "config": dataclasses.asdict(cfg),
                              "dataset_config": cfg_d})

    for name, path in (("in-dist", args.indist), ("ood", args.ood)):
        d = task.load(path)
        d.config["y_scale"] = args.y_scale
        for k in ("proj_dim", "dims"):
            if k in cfg_d:
                d.config[k] = cfg_d[k]
        for om in args.omegas:
            m = evaluate(task, params, sched, d, omega=om)
            print(json.dumps({"split": name, "task": task.name,
                              "omega": om, **m}))


if __name__ == "__main__":
    main()
