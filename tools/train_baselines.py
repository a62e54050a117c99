"""Train the MTFNN / PPO baselines (reference ``baselines/MTFNN.py`` /
``PPO.py`` training entries) and report their gap metrics.

Usage:
  python tools/train_baselines.py mtfnn --task msr \
      --dataset /root/reference/datasets/3c_10w_10000samples.csv --out ckpts/mtfnn_msr_3c
  python tools/train_baselines.py ppo --task nu \
      --dataset /root/reference/datasets/3u_18mW_10000samples.csv --out ckpts/ppo_nu
"""

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("algo", choices=["mtfnn", "ppo"])
    ap.add_argument("--task", choices=["msr", "co", "nu"], required=True)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--out", default=None)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")

    import jax.numpy as jnp

    from diffsg_tpu.tasks import TASKS
    from diffsg_tpu.ops import msr_sum_rate, co_cost, nu_rate, nu_decode
    from diffsg_tpu.utils import save_checkpoint
    from diffsg_tpu.tasks.base import objective_metrics

    task = TASKS[args.task]
    data = task.load(args.dataset)
    cfg_d = data.config

    if args.algo == "mtfnn":
        from diffsg_tpu.baselines import (
            MTFNNConfig, train_mtfnn, mtfnn_msr_model, mtfnn_co_model,
            mtfnn_nu_model)

        # reference hyperparams: CO/MSR 50 epochs [20]; NU 100 epochs [20,60]
        if args.task == "msr":
            model = mtfnn_msr_model(cfg_d["M"])
            cfg = MTFNNConfig(epochs=args.epochs or 50, seed=args.seed)
            Y_train = data.Y_train / cfg_d["W"]  # softmax head target
        elif args.task == "co":
            model = mtfnn_co_model()
            cfg = MTFNNConfig(epochs=args.epochs or 50, seed=args.seed)
            Y_train = data.Y_train
        else:
            model = mtfnn_nu_model(cfg_d["K"])
            cfg = MTFNNConfig(epochs=args.epochs or 100, milestones=(20, 60),
                              seed=args.seed)
            Y_train = data.Y_train  # normalized coords+powers, split head
        params = train_mtfnn(model, data.X_train, Y_train, cfg)

        Y_pred = np.array(model.apply(
            {"params": params}, jnp.asarray(data.X_test, jnp.float32)))
        if args.task == "msr":
            Y_pred = Y_pred * cfg_d["W"]
        elif args.task == "nu":
            Y_pred[:, 0] *= cfg_d["width"]
            Y_pred[:, 1] *= cfg_d["height"]
            Y_pred[:, 2:] *= cfg_d["P_sum"]

    else:  # ppo
        from diffsg_tpu.baselines import PPOAgent, PPOConfig, train_ppo, ppo_predict

        if args.task == "msr":
            W = cfg_d["W"]
            mn, mx = cfg_d["scaler_min"], cfg_d["scaler_max"]
            agent = PPOAgent(cfg_d["M"], cfg_d["M"])
            Y_tr = data.Y_train / W

            def env_fn(x, act, y):  # PPO.py:216-228
                g = x * (mx - mn) + mn
                r = jnp.sum(jnp.log2(1 + act * W * g), axis=1)
                gt = jnp.sum(jnp.log2(1 + y * W * g), axis=1)
                return 1.0 / (jnp.abs(r - gt) + 0.01)

            transform = lambda a: jax.nn.softmax(a, axis=1)
            predict_transform = lambda a: jax.nn.softmax(a, axis=1) * W
            cfg = PPOConfig(epochs=args.epochs or 100, milestones=(20,),
                            seed=args.seed)
        elif args.task == "co":
            mn, mx = cfg_d["scaler_min"], cfg_d["scaler_max"]
            agent = PPOAgent(3 * cfg_d["node_num"], cfg_d["node_num"])
            Y_tr = data.Y_train

            def env_fn(x, act, y):  # PPO.py:89-100
                xs = x * (mx - mn) + mn
                return 1.0 / (jnp.abs(co_cost(xs, act) - co_cost(xs, y)) + 0.1)

            transform = lambda a: jax.nn.softmax(a, axis=1)
            predict_transform = transform
            cfg = PPOConfig(epochs=args.epochs or 200, milestones=(20, 100),
                            seed=args.seed)
        else:
            K, P = cfg_d["K"], cfg_d["P_sum"]
            w, h = cfg_d["width"], cfg_d["height"]
            agent = PPOAgent(2 * K, 2 + K)
            Y_tr = np.array(data.Y_train)
            Y_tr[:, 0] *= w
            Y_tr[:, 1] *= h
            Y_tr[:, 2:] *= P

            def env_fn(x, act, y):  # PPO.py:347-361 (zeroed-state quirk kept)
                real = jnp.zeros_like(x)
                return 1.0 / (jnp.abs(nu_rate(act, real) - nu_rate(y, real)) + 0.1)

            transform = lambda a: nu_decode(jax.nn.softmax(a, axis=1), w, h, P)
            predict_transform = lambda a: nu_decode(a, w, h, P)
            cfg = PPOConfig(epochs=args.epochs or 50, milestones=(20,),
                            seed=args.seed)

        params, _ = train_ppo(agent, data.X_train, Y_tr, env_fn, transform, cfg)
        Y_pred = np.asarray(ppo_predict(agent, params, data.X_test,
                                        predict_transform))

    metrics = objective_metrics(task, data, Y_pred)
    print(json.dumps({"algo": args.algo, "task": args.task, **metrics}))
    if args.out:
        save_checkpoint(args.out, params,
                        metadata={"algo": args.algo, "task": args.task,
                                  "dataset": args.dataset})


if __name__ == "__main__":
    main()
