"""Train the NU DDPM on rigid-motion-augmented data (uses the framework's
nu_dataset_extension capability; reference: datasets/noma_uav_gen.py:131-170).

The training split of the in-dist CSV is extended `times` x by translation /
flip+rotation (rate-invariant), the test splits stay untouched.
"""

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="/root/reference/datasets/3u_18mW_10000samples.csv")
    ap.add_argument("--ood", default="/root/reference/datasets/3u_30mW_1000samples_ood.csv")
    ap.add_argument("--times", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--out", default="ckpts/ddpm_nu_3u_aug")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--omegas", type=float, nargs="+", default=[500.0, 2000.0])
    ap.add_argument("--y-scale", type=float, default=1.0,
                    help="train on y_scale * labels and evaluate with the "
                         "nu_direct feasibility decode (tuned omega ~1)")
    ap.add_argument("--center", action="store_true",
                    help="subtract the per-dim train-set label mean before "
                         "--y-scale (targets y_scale*(labels-mean)); the "
                         "nu_direct decode inverts via config['y_shift']")
    ap.add_argument("--grad-clip", type=float, default=None)
    args = ap.parse_args()

    import dataclasses
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_default_matmul_precision", "highest")

    import pandas as pd

    from diffsg_tpu.data import load_nu
    from diffsg_tpu.data.generators import nu_dataset_extension
    from diffsg_tpu.tasks import NU, NU_DIRECT, evaluate
    from diffsg_tpu.train import train_ddpm
    from diffsg_tpu.utils import save_checkpoint

    td = load_nu(args.dataset)
    cfg_d = td.config
    P, w, h = cfg_d["P_sum"], cfg_d["width"], cfg_d["height"]

    # augment the RAW rows corresponding to the training split
    raw = np.array(pd.read_csv(args.dataset, header=None))
    n_train = td.X_train.shape[0]
    ext = nu_dataset_extension(raw[:n_train], times=args.times, seed=args.seed)
    raw_train = np.concatenate([raw[:n_train], ext])

    X = raw_train[:, :6].astype(float).copy()
    Y = raw_train[:, 6:11].astype(float).copy()
    X[:, 0::2] /= w
    X[:, 1::2] /= h
    Y[:, 0] /= w
    Y[:, 1] /= h
    Y[:, 2:] /= P
    print(f"augmented train set: {X.shape[0]} rows")

    model = NU.build_model(cfg_d)
    cfg = dataclasses.replace(NU.train_config, epochs=args.epochs,
                              seed=args.seed, grad_clip=args.grad_clip)
    y_shift = Y.mean(axis=0) if args.center else np.zeros(Y.shape[1])
    params, ema, sched = train_ddpm(model, X, (Y - y_shift) * args.y_scale,
                                    cfg, log_every=50)
    dataset_config = dict(cfg_d)
    if args.y_scale != 1.0:
        dataset_config["y_scale"] = args.y_scale
    if args.center:
        dataset_config["y_shift"] = [float(v) for v in y_shift]
    save_checkpoint(args.out, params, ema=ema, sched=sched, step=cfg.epochs,
                    metadata={"augmented_times": args.times,
                              "dataset_config": dataset_config})

    # centered labels need the shift-inverting nu_direct decode even at
    # y_scale 1 (the legacy batch-global decode is not shift-invariant)
    task = NU_DIRECT if (args.y_scale != 1.0 or args.center) else NU
    for name, path in (("in-dist", args.dataset), ("ood", args.ood)):
        d = task.load(path)
        if args.y_scale != 1.0:
            d.config["y_scale"] = args.y_scale
        if args.center:
            d.config["y_shift"] = dataset_config["y_shift"]
        for om in args.omegas:
            m = evaluate(task, params, sched, d, omega=om)
            print(json.dumps({"split": name, "task": task.name,
                              "omega": om, **m}))


if __name__ == "__main__":
    main()
