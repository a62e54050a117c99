"""Evaluate a ``nu_geo`` (universal NU) checkpoint over the five headline
configurations: the two reference 400x400 splits (18 mW test tail, 30 mW
OOD) plus the three unseen-geometry oracle sets (600x600/33, 200x200/12,
480x360/21).  Prints one JSON line per (config, omega) — the table
docs/RESULTS.md "Universal NU" cites.

Usage:
  python tools/eval_nu_geo.py --ckpt ckpts/ddpm_nu_geo_dense \
      --omegas 0.06 0.125 0.25 0.5
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REF = "/root/reference/datasets"

#: (label, csv, load kwargs) — geometry/budget for the generated sets;
#: the reference CSVs carry their own budget in the loader defaults.
CONFIGS = [
    ("18mW 400x400 (reference test split)",
     f"{REF}/3u_18mW_10000samples.csv", {}),
    ("30mW 400x400 (reference OOD split)",
     f"{REF}/3u_30mW_1000samples_ood.csv", {}),
    ("21mW 480x360", "datasets/3u_geo480x360_21mW_1000samples.csv",
     {"width": 480.0, "height": 360.0, "P_sum": 21.0}),
    ("33mW 600x600", "datasets/3u_geo600x600_33mW_500samples.csv",
     {"width": 600.0, "height": 600.0, "P_sum": 33.0}),
    ("12mW 200x200", "datasets/3u_geo200x200_12mW_500samples.csv",
     {"width": 200.0, "height": 200.0, "P_sum": 12.0}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="ckpts/ddpm_nu_geo")
    ap.add_argument("--omegas", type=float, nargs="+",
                    default=[0.06, 0.125, 0.25, 0.5])
    ap.add_argument("--limit", type=int, default=None,
                    help="cap eval rows per config (full split by default)")
    ap.add_argument("--ema", action="store_true",
                    help="evaluate the checkpoint's EMA weights instead of "
                         "the raw params")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_default_matmul_precision", "highest")

    from diffsg_tpu.tasks import TASKS, evaluate
    from diffsg_tpu.tasks.base import merge_ckpt_config
    from diffsg_tpu.utils import load_checkpoint
    from tools.make_datasets import ensure_datasets

    ensure_datasets([c[1].split("/")[-1] for c in CONFIGS
                     if c[1].startswith("datasets/")])
    task = TASKS["nu_geo"]
    ck = load_checkpoint(args.ckpt)
    params = ck["ema"].params if args.ema else ck["params"]

    for label, path, kw in CONFIGS:
        d = task.load(path, **kw)
        merge_ckpt_config(d.config, ck.get("metadata"))
        if args.limit:
            d.X_test, d.Y_test = d.X_test[:args.limit], d.Y_test[:args.limit]
            if d.R_test is not None:
                d.R_test = d.R_test[:args.limit]
        best = None
        for om in args.omegas:
            m = evaluate(task, params, ck["sched"], d, omega=om)
            print(json.dumps({"config": label, "omega": om, **m}), flush=True)
            if best is None or m["less_ratio"] > best[1]:
                best = (om, m["less_ratio"])
        print(json.dumps({"config": label, "best_omega": best[0],
                          "best_less_ratio": best[1]}), flush=True)


if __name__ == "__main__":
    main()
