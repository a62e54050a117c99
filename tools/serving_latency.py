"""Serving latency/throughput table: p50/p99 blocking latency per batch
size and sampler, plus pipelined (queued) throughput that separates device
compute from transport on this tunneled single-chip setup.

The round-2 finding was that serving-typical batches (<=32k rows) run far
below the 512k-row knee (829k vs 6.0M sol/s DDIM-3).  The blocking path
pays one host->device->host round trip per solve (~35 ms of tunnel RTT
here); the pipelined section dispatches ``--depth`` solves before blocking
on any result (JAX async dispatch), which is what a production request
queue does — it recovers the device-bound rate once depth covers the RTT.

Usage:
  python tools/serving_latency.py --ckpt ckpts/ddpm_nu_3u_aug32_s8c \
      --task nu_direct --sizes 1 64 512 4096 32768 --repeats 30
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
    ap.add_argument("--ckpt", default="ckpts/ddpm_nu_3u_aug32_s8c")
    ap.add_argument("--task", default="nu_direct")
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[1, 64, 512, 4096, 32768])
    ap.add_argument("--samplers", nargs="+", default=["ddpm:20", "ddim:3"],
                    help="sampler:steps pairs")
    ap.add_argument("--repeats", type=int, default=30)
    ap.add_argument("--depth", type=int, default=8,
                    help="queue depth for the pipelined-throughput rows")
    ap.add_argument("--omega", type=float, default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from diffsg_tpu.serve import Solver
    from diffsg_tpu.tasks import TASKS

    solver = Solver.from_checkpoint(args.ckpt, task=args.task,
                                    matmul_precision=None)
    C = TASKS[args.task].cond_dim(solver.config)
    rng = np.random.default_rng(0)

    for spec in args.samplers:
        sampler, _, steps = spec.partition(":")
        n_steps = int(steps) if steps else None
        for B in args.sizes:
            X = rng.uniform(0.05, 0.95, (B, C)).astype(np.float32)
            kw = dict(omega=args.omega, sampler=sampler, n_steps=n_steps)
            solver.solve(X, **kw)  # warm the compile
            # blocking latency
            lats = []
            for r in range(args.repeats):
                t0 = time.perf_counter()
                solver.solve(X, seed=r, **kw)
                lats.append(time.perf_counter() - t0)
            lats = np.sort(lats)
            p50 = float(np.percentile(lats, 50) * 1e3)
            p99 = float(np.percentile(lats, 99) * 1e3)
            # pipelined: dispatch `depth` solves, then block on all
            t0 = time.perf_counter()
            pend = [solver.solve(X, seed=1000 + i, _block=False, **kw)
                    for i in range(args.depth)]
            for p in pend:
                np.asarray(p)
            piped = time.perf_counter() - t0
            print(json.dumps({
                "sampler": f"{sampler}-{n_steps or int(solver.sched.T)}",
                "batch": B,
                "p50_ms": round(p50, 2), "p99_ms": round(p99, 2),
                "blocking_sol_s": round(B / (p50 / 1e3)),
                "pipelined_sol_s": round(args.depth * B / piped),
                "depth": args.depth}), flush=True)


if __name__ == "__main__":
    main()
