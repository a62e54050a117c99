"""Train the universal NU model: budget + field-geometry conditioned.

The ``nu_geo`` task generalizes ``nu_budget`` (the trained realization of
the reference's designed-but-disabled ``condition_C`` capability,
``classifier_free_NU.py:35-75``) to a second and third conditioning axis:
the condition carries ``[P_sum/18, W/400, H/400]`` and the training data
mixes field sizes AND budgets (``tools/make_datasets.py nu-geo``; both
excluded grids keep 400 m and 18/30 mW unseen), so ONE checkpoint serves
any budget on any rectangular service area — including the reference's own
400x400 test splits, which it has never seen.

Coordinates and labels are normalized per-row by the row's own geometry
and budget (the nu_budget recipe: per-dim centering, y_scale 8, grad-clip,
reference 200-epoch schedule); rigid-motion augmentation is applied per
(W, H) group so motions stay inside each row's own field.

Usage:
  python tools/make_datasets.py nu-geo --out datasets/3u_geo200-600_10000samples.csv
  python tools/train_nu_geo.py --out ckpts/ddpm_nu_geo
"""

import argparse
import dataclasses
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def load_geo_rows(csv_path: str):
    """15-column mixed-geometry CSV -> raw rows (coords kept raw for the
    per-group augmenter; P_sum/W/H columns ride along untouched)."""
    import pandas as pd

    raw = np.array(pd.read_csv(csv_path, header=None))
    assert raw.shape[1] == 15, f"expected 15 cols, got {raw.shape[1]}"
    return raw


def normalize_rows_geo(raw: np.ndarray, p_ref: float = 18.0,
                       w_ref: float = 400.0, h_ref: float = 400.0):
    """Raw 15-col rows -> (X with [P/p_ref, W/w_ref, H/h_ref] features,
    Y normalized per-row by the row's own geometry and budget)."""
    P_row, W_row, H_row = raw[:, 12:13], raw[:, 13:14], raw[:, 14:15]
    X = raw[:, :6].astype(float).copy()
    X[:, 0::2] /= W_row
    X[:, 1::2] /= H_row
    X = np.concatenate([X, P_row / p_ref, W_row / w_ref, H_row / h_ref],
                       axis=1)
    Y = raw[:, 6:11].astype(float).copy()
    Y[:, 0:1] /= W_row
    Y[:, 1:2] /= H_row
    Y[:, 2:] /= P_row
    return X, Y


def assemble_training_rows(geo_paths, budget_path=None, indist_path=None,
                           train_ratio=0.7, budget_repeat=1, ref_repeat=1):
    """Concatenate training rows into the 15-col mixed-geometry layout
    ``[q x 6, L x 2, P x 3, rate, P_sum, W, H]``:

    - ``geo_paths``: 15-col mixed-geometry CSVs, taken as-is;
    - ``budget_path``: optional 13-col multi-budget CSV (the blind
      ``nu_budget`` specialist's 400x400 set) -> W=H=400 appended;
    - ``indist_path``: optional 12-col reference split
      (``3u_18mW_10000samples.csv`` layout); only the first
      ``train_ratio`` rows (the reference's unshuffled train split,
      ``classifier_free_NU.py:206-208``) are used, with P=18, W=H=400.

    ``budget_repeat``/``ref_repeat`` tile those parts to up-weight the
    reference 400x400 cell against the mixed-geometry mass.
    """
    import pandas as pd

    parts = [load_geo_rows(p) for p in geo_paths]
    if budget_path:
        raw_b = np.array(pd.read_csv(budget_path, header=None))
        assert raw_b.shape[1] == 13, f"expected 13 cols, got {raw_b.shape[1]}"
        part = np.concatenate(
            [raw_b, np.full((raw_b.shape[0], 2), 400.0)], axis=1)
        parts.append(np.tile(part, (budget_repeat, 1)))
    if indist_path:
        raw_i = np.array(pd.read_csv(indist_path, header=None))
        assert raw_i.shape[1] == 12, f"expected 12 cols, got {raw_i.shape[1]}"
        raw_i = raw_i[: int(raw_i.shape[0] * train_ratio)]
        part = np.concatenate(
            [raw_i, np.tile([18.0, 400.0, 400.0], (raw_i.shape[0], 1))],
            axis=1)
        parts.append(np.tile(part, (ref_repeat, 1)))
    return np.concatenate(parts)


def augment_geo(raw: np.ndarray, times: int, seed: int) -> np.ndarray:
    """Rigid-motion augmentation per (W, H) group: motions must stay inside
    each row's own field, so the augmenter runs with that group's size."""
    from diffsg_tpu.data.generators import nu_dataset_extension

    if times <= 0:
        return np.zeros((0, raw.shape[1]))
    parts = []
    for w in np.unique(raw[:, 13]):
        for h in np.unique(raw[:, 14]):
            sel = raw[(raw[:, 13] == w) & (raw[:, 14] == h)]
            if sel.shape[0]:
                parts.append(nu_dataset_extension(
                    sel, times=times, seed=seed, width=int(w), height=int(h)))
    return np.concatenate(parts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--geo-dataset", nargs="+",
                    default=["datasets/3u_geo200-600_10000samples.csv"],
                    help="one or more 15-col mixed-geometry CSVs "
                         "(concatenated)")
    ap.add_argument("--budget-dataset", default=None,
                    help="optional 13-col multi-budget CSV (the blind "
                         "nu_budget model's 400x400 training set), folded "
                         "in as 15-col rows at W=H=400 so the universal "
                         "model sees everything the specialist saw")
    ap.add_argument("--with-ref-indist", action="store_true",
                    help="also fold in the reference 18 mW TRAIN split "
                         "(rows the blind nu_budget specialist trains on) "
                         "as 15-col rows at P=18, W=H=400")
    ap.add_argument("--indist",
                    default="/root/reference/datasets/3u_18mW_10000samples.csv")
    ap.add_argument("--ood",
                    default="/root/reference/datasets/3u_30mW_1000samples_ood.csv")
    ap.add_argument("--times", type=int, default=28,
                    help="rigid-motion augmentation copies per base row")
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--milestones", type=int, nargs="+", default=None)
    ap.add_argument("--out", default="ckpts/ddpm_nu_geo")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--omegas", type=float, nargs="+",
                    default=[0.06, 0.125, 0.25, 0.5])
    ap.add_argument("--y-scale", type=float, default=8.0)
    ap.add_argument("--no-center", dest="center", action="store_false")
    ap.add_argument("--grad-clip", type=float, default=1.0)
    ap.add_argument("--proj-dim", type=int, default=None,
                    help="denoiser width override (checkpoint-owned "
                         "config key; default = reference NU arch 32)")
    ap.add_argument("--dims", type=int, nargs="+", default=None,
                    help="denoiser stage widths override, e.g. 64 32 16")
    ap.add_argument("--ref-repeat", type=int, default=1,
                    help="repeat factor for the --with-ref-indist rows "
                         "(up-weight the reference 18 mW cell)")
    ap.add_argument("--budget-repeat", type=int, default=1,
                    help="repeat factor for the --budget-dataset rows")
    ap.add_argument("--init-from", default=None,
                    help="warm-start from an existing nu_geo checkpoint "
                         "(fine-tune cell: low lr, ref-heavy mixture); the "
                         "arch overrides default to the donor's")
    ap.add_argument("--warmup-epoch", type=int, default=None,
                    help="linear-warmup epochs override (0 for fine-tunes)")
    ap.add_argument("--parameterization", choices=["eps", "x0", "v"],
                    default=None,
                    help="denoiser prediction target (the x0 recipe closed "
                         "the multi-task NU rows; eps = reference default). "
                         "With --init-from the donor's parameterization is "
                         "inherited unless this flag is given explicitly — "
                         "fine-tuning an x0 donor under an eps loss would "
                         "silently fight the pretrained weights.")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_default_matmul_precision", "highest")

    from diffsg_tpu.data.loaders import NU_P_REF
    from diffsg_tpu.tasks import TASKS, evaluate
    from diffsg_tpu.train import train_ddpm
    from diffsg_tpu.utils import save_checkpoint

    task = TASKS["nu_geo"]
    p_ref, w_ref, h_ref = NU_P_REF, 400.0, 400.0

    from diffsg_tpu.data.loaders import TRAIN_RATIO

    base = assemble_training_rows(
        args.geo_dataset, budget_path=args.budget_dataset,
        indist_path=args.indist if args.with_ref_indist else None,
        train_ratio=TRAIN_RATIO, budget_repeat=args.budget_repeat,
        ref_repeat=args.ref_repeat)
    ext = augment_geo(base, times=args.times, seed=args.seed)
    rows = np.concatenate([base, ext])
    X, Y = normalize_rows_geo(rows, p_ref, w_ref, h_ref)
    print(f"train rows: {X.shape[0]} ({base.shape[0]} base x{args.times + 1}; "
          f"{len(np.unique(rows[:, 13]))} widths x "
          f"{len(np.unique(rows[:, 14]))} heights x "
          f"{len(np.unique(rows[:, 12]))} budgets)")

    cfg_d = {"K": 3, "P_sum": 18.0, "width": w_ref, "height": h_ref,
             "p_ref": p_ref, "w_ref": w_ref, "h_ref": h_ref}
    init_params = None
    if args.init_from:
        from diffsg_tpu.utils import load_checkpoint

        donor = load_checkpoint(args.init_from)
        init_params = donor["params"]
        d_cfg = donor.get("metadata", {}).get("dataset_config", {})
        for k in ("proj_dim", "dims"):
            if k in d_cfg:
                cfg_d[k] = tuple(d_cfg[k]) if k == "dims" else d_cfg[k]
        donor_param = d_cfg.get("parameterization", "eps")
        if args.parameterization is None:
            args.parameterization = donor_param
        elif args.parameterization != donor_param:
            print(f"WARNING: fine-tuning a {donor_param!r} donor under a "
                  f"{args.parameterization!r} loss (explicit override)")
    if args.parameterization is None:
        args.parameterization = "eps"
    if args.proj_dim is not None:
        cfg_d["proj_dim"] = args.proj_dim
    if args.dims is not None:
        cfg_d["dims"] = tuple(args.dims)
    model = task.build_model(cfg_d)
    overrides = {k: v for k, v in [("epochs", args.epochs), ("lr", args.lr),
                                   ("seed", args.seed),
                                   ("grad_clip", args.grad_clip),
                                   ("warmup_epoch", args.warmup_epoch),
                                   ("milestones", tuple(args.milestones)
                                    if args.milestones else None)]
                 if v is not None}
    overrides["parameterization"] = args.parameterization
    cfg = dataclasses.replace(task.train_config, **overrides)
    if args.init_from and "y_shift" in d_cfg:
        # fine-tune: keep the donor's output normalization so the warm
        # weights stay consistent with the target space
        y_shift = np.asarray(d_cfg["y_shift"])
        args.y_scale = float(d_cfg.get("y_scale", args.y_scale))
    else:
        y_shift = Y.mean(axis=0) if args.center else np.zeros(Y.shape[1])
    params, ema, sched = train_ddpm(model, X, (Y - y_shift) * args.y_scale,
                                    cfg, init_params=init_params,
                                    log_every=25)
    dataset_config = dict(cfg_d)
    if args.y_scale != 1.0:
        dataset_config["y_scale"] = args.y_scale
    if args.center:
        dataset_config["y_shift"] = [float(v) for v in y_shift]
    if args.parameterization != "eps":
        dataset_config["parameterization"] = args.parameterization
    save_checkpoint(args.out, params, ema=ema, sched=sched, step=cfg.epochs,
                    metadata={"task": "nu_geo",
                              "init_from": args.init_from,
                              "geo_dataset": args.geo_dataset,
                              "budget_dataset": args.budget_dataset,
                              "with_ref_indist": args.with_ref_indist,
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
