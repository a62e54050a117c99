"""Dump per-sample denoise trajectories to CSV.

Equivalent of the reference's ``datasets/{co,sum_rate}_trajectory_gen.py``
and ``load_test_nu_debug``: sample the test split with trajectory capture
on, decode every step, write ``results/<task>_denoise_path.csv`` (one row
per sample, T*D wide, header-less).

Usage:
  python tools/dump_trajectory.py --task nu --ckpt ckpts/ddpm_nu \
      --dataset /root/reference/datasets/3u_18mW_10000samples.csv \
      --out results/nu_denoise_path.csv [--limit 512] [--omega 500]
"""

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", choices=["msr", "co", "nu"], required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--omega", type=float, default=500.0)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from diffsg_tpu.tasks import TASKS
    from diffsg_tpu.tasks.base import sample_solutions
    from diffsg_tpu.utils import load_checkpoint
    from diffsg_tpu.utils.trace import decode_trace

    task = TASKS[args.task]
    data = task.load(args.dataset)
    ck = load_checkpoint(args.ckpt)

    X = data.X_test[: args.limit] if args.limit else data.X_test
    _, traces = sample_solutions(task, ck["params"], ck["sched"], X,
                                 data.config, omega=args.omega,
                                 seed=args.seed, record_trace=True)
    rows = np.concatenate([decode_trace(args.task, t, data.config)
                           for t in traces])
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    np.savetxt(out, rows, delimiter=",")
    print(f"Trajectory generating finished, {rows.shape[0]} samples stored "
          f"({rows.shape[1]} cols) -> {out}")


if __name__ == "__main__":
    main()
