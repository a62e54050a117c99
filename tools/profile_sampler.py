"""Capture a jax.profiler trace of the CFG sampler (chip-level profiling).

The reference's profiling story is wall-clock prints; on TPU the real tool
is a profiler trace viewable in TensorBoard/Perfetto.

Usage:
  python tools/profile_sampler.py --task msr --T 100 --batch 8192 \
      --out /tmp/diffsg_trace
  tensorboard --logdir /tmp/diffsg_trace   # or upload to Perfetto
"""

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", choices=["msr", "co", "nu"], default="msr")
    ap.add_argument("--T", type=int, default=100)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--omega", type=float, default=500.0)
    ap.add_argument("--out", default="/tmp/diffsg_trace")
    ap.add_argument("--backend", choices=["xla", "pallas"], default="xla")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

    from diffsg_tpu.models import unet_msr, unet_co, unet_nu
    from diffsg_tpu.models.unet1d_pallas import unet_apply_fn
    from diffsg_tpu.diffusion import cfg_sample, cosine_schedule
    from diffsg_tpu.train import torch_style_init

    model, D, C = {
        "msr": (unet_msr(3), 3, 3),
        "co": (unet_co(3), 3, 9),
        "nu": (unet_nu(3), 5, 6),
    }[args.task]
    key = jax.random.PRNGKey(0)
    v = model.init(key, jnp.zeros((1, D)), jnp.zeros((1,)), jnp.zeros((1, C)),
                   jnp.ones((1, 1)))
    params = torch_style_init(v["params"], key)
    sched = cosine_schedule(args.T)
    apply_fn = unet_apply_fn(model, backend=args.backend)

    @jax.jit
    def run(cond, k):
        return cfg_sample(apply_fn, params, sched, cond, args.omega, D, key=k)[0]

    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.uniform(0, 1, (args.batch, C)), jnp.float32)
    run(cond, jax.random.PRNGKey(1)).block_until_ready()  # compile

    with jax.profiler.trace(args.out):
        run(cond, jax.random.PRNGKey(2)).block_until_ready()
    print(f"trace written to {args.out}")


if __name__ == "__main__":
    main()
