"""Single-sample sampling-latency probe.

Equivalent of the reference's debug timing blocks
(``classifier_free_MSR.py:335-344``, ``_CO.py:404-413``): average wall-clock
time to sample ONE solution (batch 1), plus batched throughput for context.

Usage:
  python tools/latency_probe.py --task nu --ckpt ckpts/ddpm_nu_3u \
      --dataset /root/reference/datasets/3u_18mW_10000samples.csv [--cpu]
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
    ap.add_argument("--task", choices=["msr", "co", "nu"], required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--omega", type=float, default=500.0)
    ap.add_argument("--repeats", type=int, default=20)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    import jax.numpy as jnp

    from diffsg_tpu.tasks import TASKS
    from diffsg_tpu.diffusion import cfg_sample
    from diffsg_tpu.utils import load_checkpoint

    task = TASKS[args.task]
    data = task.load(args.dataset)
    ck = load_checkpoint(args.ckpt)
    model = task.build_model(data.config)
    D = task.data_dim(data.config)

    def apply_fn(p, y, t, c, m):
        return model.apply({"params": p}, y, t, c, m)

    @jax.jit
    def run(cond, key):
        return cfg_sample(apply_fn, ck["params"], ck["sched"], cond,
                          args.omega, D, key=key)[0]

    # single-sample latency
    x1 = jnp.asarray(data.X_test[:1], jnp.float32)
    run(x1, jax.random.PRNGKey(0)).block_until_ready()  # compile
    t0 = time.perf_counter()
    for i in range(args.repeats):
        run(x1, jax.random.PRNGKey(i)).block_until_ready()
    single_ms = (time.perf_counter() - t0) * 1000 / args.repeats

    # batched throughput
    xb = jnp.asarray(data.X_test[: args.batch], jnp.float32)
    run(xb, jax.random.PRNGKey(0)).block_until_ready()
    t0 = time.perf_counter()
    for i in range(5):
        run(xb, jax.random.PRNGKey(i)).block_until_ready()
    batch_sps = args.batch / ((time.perf_counter() - t0) / 5)

    print(json.dumps({
        "task": args.task, "omega": args.omega, "T": int(ck["sched"].T),
        "single_sample_ms": round(single_ms, 3),
        "batched_solutions_per_sec": round(batch_sps, 1),
        "batch": args.batch,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
