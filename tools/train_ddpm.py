"""Train a CFG-DDPM for one task and evaluate it (reference train entries:
``train_ddpm_{msr,co,nu}`` + ``load_test_*``).

Usage:
  python tools/train_ddpm.py --task msr --dataset /root/reference/datasets/3c_10w_10000samples.csv \
      --out ckpts/ddpm_msr_3c --epochs 200
  python tools/train_ddpm.py --task co --dataset datasets/3nodes_50000samples_new.csv --out ckpts/ddpm_co
  python tools/train_ddpm.py --task nu --dataset /root/reference/datasets/3u_18mW_10000samples.csv --out ckpts/ddpm_nu
"""

import argparse
import dataclasses
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", choices=["msr", "msr_temp", "msr_wf", "co",
                                       "co_analytic", "co_direct", "co_ranked", "nu",
                                       "nu_direct", "nu_budget"], required=True)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--epochs", type=int, default=None)
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--omega", type=float, default=None)
    ap.add_argument("--y-scale", type=float, default=1.0,
                    help="train the diffusion on y_scale * labels (unit-ish "
                         "target std; decoders divide it back out via "
                         "config['y_scale'] — see tasks/msr.py msr_wf)")
    ap.add_argument("--y-shift", type=float, default=0.0,
                    help="subtract this from labels BEFORE --y-scale: train "
                         "on y_scale * (labels - y_shift).  Use for tasks "
                         "whose labels have a large constant mean (MSR "
                         "powers: mean W/M >> std).  The msr_wf simplex-"
                         "projection decode is invariant to per-row constant "
                         "shifts (the projection removes any c*1 component), "
                         "so decoding needs no inverse shift.")
    ap.add_argument("--parameterization", choices=["eps", "x0", "v"],
                    default="eps",
                    help="denoiser target: eps (reference) or x0 (predict "
                         "y0 directly; carried in ckpt metadata so "
                         "evaluate/serve convert back automatically)")
    ap.add_argument("--use-ema", action="store_true")
    ap.add_argument("--grad-clip", type=float, default=None,
                    help="global-norm gradient clip (framework extension; "
                         "stabilizes scaled-label training)")
    ap.add_argument("--milestones", type=int, nargs="+", default=None,
                    help="override the LR x0.1 drop epochs (reference "
                         "defaults live in tasks/*.py)")
    ap.add_argument("--T", type=int, default=None, dest="t_steps",
                    help="diffusion steps override (reference: 20)")
    ap.add_argument("--proj-dim", type=int, default=None,
                    help="MSR denoiser width override (model-zoo scaling; "
                         "carried in checkpoint metadata)")
    ap.add_argument("--dims", type=int, nargs="+", default=None,
                    help="MSR denoiser stage widths override")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--matmul-precision", default="highest",
                    help="jax_default_matmul_precision for train+eval. "
                         "Scaled-label training (--y-scale) diverges under "
                         "the TPU default bf16 matmuls (observed: loss blows "
                         "up ~epoch 70 on 80c wf labels); 'highest' is "
                         "reproducible across backends. Pass 'default' to "
                         "use the backend default.")
    ap.add_argument("--eval-only", default=None, help="load ckpt dir and eval")
    ap.add_argument("--skip-eval", action="store_true",
                    help="train and save only (CI smoke runs)")
    ap.add_argument("--resume", default=None, help="checkpoint dir to resume from")
    ap.add_argument("--checkpoint-every", type=int, default=0,
                    help="save a resumable checkpoint every N epochs")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax

    if args.matmul_precision != "default":
        jax.config.update("jax_default_matmul_precision",
                          args.matmul_precision)

    from diffsg_tpu.tasks import TASKS, evaluate
    from diffsg_tpu.train import train_ddpm
    from diffsg_tpu.utils import save_checkpoint, load_checkpoint, MetricsLogger

    task = TASKS[args.task]
    data = task.load(args.dataset)
    if args.y_scale != 1.0:
        data.config["y_scale"] = args.y_scale
    if args.y_shift != 0.0:
        # Only these tasks' decodes invert (or are invariant to) a constant
        # label shift; anywhere else the shift silently corrupts evaluate().
        SHIFT_AWARE = ("msr_wf", "nu_direct", "nu_budget", "co_direct")
        if args.task not in SHIFT_AWARE:
            ap.error(f"--y-shift is only supported for tasks {SHIFT_AWARE}: "
                     f"task {args.task!r}'s decode does not invert the shift")
        data.config["y_shift"] = args.y_shift
    if args.parameterization != "eps":
        data.config["parameterization"] = args.parameterization
    if args.proj_dim:
        data.config["proj_dim"] = args.proj_dim
    if args.dims:
        data.config["dims"] = tuple(args.dims)
    model = task.build_model(data.config)
    log = MetricsLogger(pathlib.Path(args.out) / "train_log.jsonl"
                        if not args.eval_only else None)

    cfg = task.train_config
    overrides = {k: v for k, v in
                 [("epochs", args.epochs), ("lr", args.lr), ("seed", args.seed),
                  ("use_ema", args.use_ema or None),
                  ("grad_clip", args.grad_clip),
                  ("parameterization", args.parameterization
                   if args.parameterization != "eps" else None),
                  ("T", args.t_steps),
                  ("milestones", tuple(args.milestones)
                   if args.milestones else None)] if v is not None}
    cfg = dataclasses.replace(cfg, **overrides)

    if args.eval_only:
        from diffsg_tpu.tasks.base import merge_ckpt_config

        ck = load_checkpoint(args.eval_only)
        params, sched = ck["params"], ck["sched"]
        merge_ckpt_config(data.config, ck.get("metadata"))
        model = task.build_model(data.config)
    else:
        print(f"training {args.task} on {args.dataset} "
              f"({data.X_train.shape[0]} samples, device {jax.devices()[0]})")
        t0 = time.time()
        resume_state = load_checkpoint(args.resume) if args.resume else None
        Y_train = (data.Y_train - args.y_shift) * args.y_scale \
            if (args.y_scale != 1.0 or args.y_shift != 0.0) else data.Y_train
        params, ema, sched = train_ddpm(
            model, data.X_train, Y_train, cfg,
            log_fn=lambda s: log.log({"event": "train", "msg": s}),
            log_every=10,
            resume_state=resume_state,
            checkpoint_every=args.checkpoint_every,
            checkpoint_dir=str(pathlib.Path(args.out) / "resume") if args.checkpoint_every else None,
        )
        train_s = time.time() - t0
        dataset_config = {k: (v.item() if hasattr(v, "item") else v)
                          for k, v in data.config.items()}
        save_checkpoint(args.out, params, ema=ema, sched=sched,
                        step=cfg.epochs,
                        metadata={"task": args.task, "dataset": args.dataset,
                                  "config": dataclasses.asdict(cfg),
                                  "dataset_config": dataset_config,
                                  "train_seconds": train_s})
        log.log({"event": "saved", "out": args.out, "train_seconds": train_s})

    if args.skip_eval:
        return
    metrics = evaluate(task, params, sched, data, omega=args.omega)
    print(json.dumps({"task": args.task, "dataset": args.dataset, **metrics}))
    if not args.eval_only and cfg.use_ema:
        ema_metrics = evaluate(task, ema.params, sched, data, omega=args.omega)
        print(json.dumps({"task": args.task, "params": "ema", **ema_metrics}))


if __name__ == "__main__":
    main()
