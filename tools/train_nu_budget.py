"""Train the budget-conditioned NU DDPM (``nu_budget`` task).

This is the trained realization of the reference's designed-but-disabled
conditioning capability (``condition_C`` / the ``cdim`` config key,
``classifier_free_NU.py:35-75``): the condition carries the power budget
``P_sum / p_ref`` as an extra column, so ONE model serves any budget — in
particular the 30 mW OOD split whose budget shift is invisible to
coordinate-only conditions (the residual OOD gap of budget-blind models,
docs/RESULTS.md).

Training data: a multi-budget oracle CSV (``tools/make_datasets.py
nu-budget``; 13 columns, per-row P_sum — by default budgets 9..36 mW
EXCLUDING 18 and 30, so both eval budgets are unseen in that set) plus the
reference in-dist 18 mW train split.  Labels are loader-normalized per-row
(coords / width, powers / row-P_sum), rigid-motion augmented (rate- and
budget-invariant), then centered + scaled like the aug32 recipe that closed
the in-dist gap (docs/RESULTS.md NU section).
"""

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def load_budget_rows(csv_path: str, width: float, height: float):
    """13-column multi-budget CSV -> raw rows (coords kept raw for the
    augmenter; the budget column rides along untouched)."""
    import pandas as pd

    raw = np.array(pd.read_csv(csv_path, header=None))
    assert raw.shape[1] == 13, f"expected 13 cols, got {raw.shape[1]}"
    return raw


def normalize_rows(raw: np.ndarray, width: float, height: float,
                   p_ref: float):
    """Raw 13-col rows -> (X with budget feature, Y normalized per-row)."""
    P_row = raw[:, 12:13]
    X = raw[:, :6].astype(float).copy()
    X[:, 0::2] /= width
    X[:, 1::2] /= height
    X = np.concatenate([X, P_row / p_ref], axis=1)
    Y = raw[:, 6:11].astype(float).copy()
    Y[:, 0] /= width
    Y[:, 1] /= height
    Y[:, 2:] /= P_row
    return X, Y


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--budget-dataset",
                    default="datasets/3u_budget9-36_10000samples.csv")
    ap.add_argument("--indist", default="/root/reference/datasets/3u_18mW_10000samples.csv")
    ap.add_argument("--ood", default="/root/reference/datasets/3u_30mW_1000samples_ood.csv")
    ap.add_argument("--times", type=int, default=16,
                    help="rigid-motion augmentation copies per base row")
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--milestones", type=int, nargs="+", default=None)
    ap.add_argument("--out", default="ckpts/ddpm_nu_budget")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--omegas", type=float, nargs="+",
                    default=[0.06, 0.125, 0.25, 0.5])
    ap.add_argument("--y-scale", type=float, default=8.0)
    ap.add_argument("--no-center", dest="center", action="store_false")
    ap.add_argument("--no-indist", dest="use_indist", action="store_false",
                    help="train on the multi-budget set only (ablation: "
                         "NO 18 mW rows at all)")
    ap.add_argument("--grad-clip", type=float, default=1.0)
    ap.add_argument("--parameterization", choices=["eps", "x0", "v"],
                    default="eps",
                    help="denoiser prediction target (parameterization-"
                         "matrix cell; eps = reference default)")
    args = ap.parse_args()

    import dataclasses
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_default_matmul_precision", "highest")

    import pandas as pd

    from diffsg_tpu.data.generators import nu_dataset_extension
    from diffsg_tpu.data.loaders import NU_P_REF, TRAIN_RATIO
    from diffsg_tpu.tasks import TASKS, evaluate
    from diffsg_tpu.train import train_ddpm
    from diffsg_tpu.utils import save_checkpoint

    task = TASKS["nu_budget"]
    w, h, p_ref = 400.0, 400.0, NU_P_REF

    raw_b = load_budget_rows(args.budget_dataset, w, h)
    parts = [raw_b]
    if args.use_indist:
        raw_i = np.array(pd.read_csv(args.indist, header=None))
        raw_i = raw_i[: int(raw_i.shape[0] * TRAIN_RATIO)]  # train split only
        raw_i = np.concatenate(
            [raw_i, np.full((raw_i.shape[0], 1), 18.0)], axis=1)
        parts.append(raw_i)
    base = np.concatenate(parts)
    ext = nu_dataset_extension(base, times=args.times, seed=args.seed)
    rows = np.concatenate([base, ext])

    X, Y = normalize_rows(rows, w, h, p_ref)
    budgets = sorted(set(np.round(rows[:, 12], 3)))
    print(f"train rows: {X.shape[0]} ({base.shape[0]} base x{args.times + 1}; "
          f"{len(budgets)} budgets {budgets[0]}..{budgets[-1]} mW)")

    cfg_d = {"K": 3, "P_sum": 18.0, "width": w, "height": h, "p_ref": p_ref}
    model = task.build_model(cfg_d)
    overrides = {k: v for k, v in [("epochs", args.epochs), ("lr", args.lr),
                                   ("seed", args.seed),
                                   ("grad_clip", args.grad_clip),
                                   ("milestones", tuple(args.milestones)
                                    if args.milestones else None)]
                 if v is not None}
    overrides["parameterization"] = args.parameterization
    cfg = dataclasses.replace(task.train_config, **overrides)
    y_shift = Y.mean(axis=0) if args.center else np.zeros(Y.shape[1])
    params, ema, sched = train_ddpm(model, X, (Y - y_shift) * args.y_scale,
                                    cfg, log_every=25)
    dataset_config = dict(cfg_d)
    if args.y_scale != 1.0:
        dataset_config["y_scale"] = args.y_scale
    if args.center:
        dataset_config["y_shift"] = [float(v) for v in y_shift]
    if args.parameterization != "eps":
        dataset_config["parameterization"] = args.parameterization
    save_checkpoint(args.out, params, ema=ema, sched=sched, step=cfg.epochs,
                    metadata={"task": "nu_budget",
                              "budget_dataset": args.budget_dataset,
                              "augmented_times": args.times,
                              "config": dataclasses.asdict(cfg),
                              "dataset_config": dataset_config})

    from diffsg_tpu.tasks.base import CKPT_CONFIG_KEYS

    for name, path in (("in-dist", args.indist), ("ood", args.ood)):
        d = task.load(path)
        d.config.update({k: dataset_config[k] for k in CKPT_CONFIG_KEYS
                         if k in dataset_config})
        for om in args.omegas:
            m = evaluate(task, params, sched, d, omega=om)
            print(json.dumps({"split": name, "task": task.name,
                              "omega": om, **m}))


if __name__ == "__main__":
    main()
