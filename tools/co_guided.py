"""CO objective-guidance sweep: single-draw quality with cost-gradient
guidance in the sampler (diffusion.ddpm.cfg_sample guidance_fn).

The CO single-draw gap is a *decision* gap (allocation is closed-form via
the analytic decode); this steers the reverse diffusion's x0 estimate down
the differentiable soft-cost relaxation (baselines.co_soft_cost) so the
sampled decision lands in a lower-cost basin.  Reference protocol:
``classifier_free_CO.py:293-356`` (single draw, batch 512, analytic decode
is the framework extension measured in docs/RESULTS.md).

Usage:
  python tools/co_guided.py --ckpt ckpts/ddpm_co_aux \
      --dataset datasets/3nodes_50000samples_new.csv \
      --omegas 5000 --scales 0 0.1 0.3 1 3 --taus 0.05 --limit 2048
"""

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="ckpts/ddpm_co_aux")
    ap.add_argument("--dataset", default="datasets/3nodes_50000samples_new.csv")
    ap.add_argument("--omegas", type=float, nargs="+", default=[5000.0])
    ap.add_argument("--scales", type=float, nargs="+",
                    default=[0.0, 0.1, 0.3, 1.0, 3.0])
    ap.add_argument("--taus", type=float, nargs="+", default=[0.05])
    ap.add_argument("--limit", type=int, default=0,
                    help="evaluate only the first N test rows (0 = all)")
    ap.add_argument("--relative", action="store_true",
                    help="row-normalized gradient scaled by the epsilon RMS "
                         "(guidance_relative; scales ~0.03-1)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    jax.config.update("jax_default_matmul_precision", "highest")

    from diffsg_tpu.baselines import co_analytic_decode, co_soft_cost
    from diffsg_tpu.diffusion import cfg_sample
    from diffsg_tpu.tasks import TASKS
    from diffsg_tpu.tasks.base import merge_ckpt_config, objective_metrics
    from diffsg_tpu.tasks.co import decision_class
    from diffsg_tpu.utils import load_checkpoint

    task = TASKS["co_analytic"]
    data = task.load(args.dataset)
    ck = load_checkpoint(args.ckpt)
    merge_ckpt_config(data.config, ck.get("metadata"))
    if args.limit:
        data.X_test = data.X_test[: args.limit]
        data.Y_test = data.Y_test[: args.limit]
    params, sched = ck["params"], ck["sched"]
    model = task.build_model(data.config)
    D = task.data_dim(data.config)
    X_unnorm = task.unnormalize_x(data.X_test, data.config)

    def apply_fn(p, y, t, c, m):
        return model.apply({"params": p}, y, t, c, m)

    def make_run(tau):
        @jax.jit
        def run(cond, cu, key, omega, gscale):
            y0, _ = cfg_sample(
                apply_fn, params, sched, cond, omega, D, key=key,
                guidance_fn=lambda x0: co_soft_cost(x0, cu, tau=tau),
                guidance_scale=gscale, guidance_relative=args.relative)
            return co_analytic_decode(y0, cu)

        return run

    for tau in args.taus:
        run = make_run(tau)
        for omega in args.omegas:
            for gs in args.scales:
                key = jax.random.PRNGKey(args.seed)
                outs = []
                for i in range(0, data.X_test.shape[0], 512):
                    key, k = jax.random.split(key)
                    outs.append(np.asarray(run(
                        jnp.asarray(data.X_test[i:i + 512], jnp.float32),
                        jnp.asarray(X_unnorm[i:i + 512], jnp.float32),
                        k, jnp.float32(omega), jnp.float32(gs))))
                Y_pred = np.concatenate(outs)
                m = objective_metrics(task, data, Y_pred)
                acc = float((decision_class(Y_pred)
                             == decision_class(data.Y_test)).mean())
                print(json.dumps({"tau": tau, "omega": omega, "gscale": gs,
                                  "acc": round(acc, 4),
                                  **{k: round(v, 5) for k, v in m.items()}}),
                      flush=True)


if __name__ == "__main__":
    main()
