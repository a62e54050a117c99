"""Train the multi-task DDPM: ONE denoiser for MSR + CO + NU.

The three headline training sets are embedded into the shared canvas
(``diffsg_tpu.tasks.multi``): task identity rides in the condition one-hot,
each subtask keeps its headline label recipe —

* MSR-3c: reference CSV, centered + scaled labels (y_shift W/M, y_scale 3),
  served through the msr_wf projection decode (shift-invariant);
* CO: regenerated 50k oracle CSV, raw allocation shares (eps recipe),
  served through the ranked-decision decode;
* NU: the nu_budget recipe — multi-budget oracle CSV (budgets 9..36 mW,
  18 and 30 excluded) + the reference 18 mW train split with budget column
  appended, rigid-motion augmented, per-dim centered + y_scale 8; the
  condition payload carries ``P_sum / p_ref`` so the ONE multi net serves
  any budget (the conditioning that closed the specialist's 30 mW OOD
  gap), served through the nu_budget per-row feasibility decode.

``--nu-mode geo`` swaps the NU slot to the FULL nu_geo condition
``[coords | P/p_ref | W/w_ref | H/h_ref]`` (9-dim payload — fills the
shared condition exactly) trained on the dense_w4 mixed-geometry mixture,
so the one checkpoint serves any task x budget x rectangle; served as
``multi_nu_geo``.

``--with-msr80`` / ``--with-msr8`` widen the canvas to 80 and add one-hot
slots for the W-conditioned waterfilling recipes at M=80 and M=8 (payload
``[gains | W/w_ref]``; all four MSR eval budgets excluded from the
training grids), putting the reference's whole channel-count zoo on the
one net; served as ``multi_msr80`` / ``multi_msr8``.

Subtask rows are repeated/augmented to roughly equal thirds so the one-hot
classes stay balanced.  The per-subtask label transforms are stored in the
checkpoint metadata under ``subtask_configs`` and merged back at eval with
``merge_multi_config``.
"""

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--msr-dataset",
                    default="/root/reference/datasets/3c_10w_10000samples.csv")
    ap.add_argument("--co-dataset",
                    default="datasets/3nodes_50000samples_new.csv")
    ap.add_argument("--nu-dataset",
                    default="/root/reference/datasets/3u_18mW_10000samples.csv")
    ap.add_argument("--nu-budget-dataset",
                    default="datasets/3u_budget9-36_10000samples.csv",
                    help="13-col multi-budget oracle CSV "
                         "(tools/make_datasets.py nu-budget)")
    ap.add_argument("--nu-mode", choices=["budget", "geo"], default="budget",
                    help="NU condition flavor: 'budget' = coords + P/p_ref "
                         "(7-dim payload, served as multi_nu); 'geo' = the "
                         "full nu_geo condition [coords | P/p_ref | W/w_ref "
                         "| H/h_ref] (9-dim payload — fills the shared "
                         "condition exactly, served as multi_nu_geo: one "
                         "ckpt for any task x budget x rectangle)")
    ap.add_argument("--nu-geo-datasets", nargs="+",
                    default=["datasets/3u_geo200-600_10000samples.csv",
                             "datasets/3u_geo_focus320-480_15000samples.csv",
                             "datasets/3u_18mW400_fresh4000_geo.csv"],
                    help="15-col mixed-geometry CSVs for --nu-mode geo "
                         "(the dense_w4 mixture + the fresh 18mW@400x400 "
                         "oracle rows)")
    ap.add_argument("--nu-ref-repeat", type=int, default=4,
                    help="geo mode: repeat factor for the reference 18 mW "
                         "train rows (the dense_w4 home-cell upweighting)")
    ap.add_argument("--nu-budget-repeat", type=int, default=3,
                    help="geo mode: repeat factor for the 400x400 "
                         "multi-budget rows")
    ap.add_argument("--msr-repeat", type=int, default=14,
                    help="repeat the 7k MSR train rows to balance classes")
    ap.add_argument("--co-repeat", type=int, default=3,
                    help="repeat the 35k CO train rows to balance classes")
    ap.add_argument("--nu-times", type=int, default=5,
                    help="rigid-motion augmentation copies for NU")
    ap.add_argument("--epochs", type=int, default=200)
    ap.add_argument("--lr", type=float, default=4e-3)
    ap.add_argument("--milestones", type=int, nargs="+", default=[80, 150])
    ap.add_argument("--grad-clip", type=float, default=1.0)
    ap.add_argument("--parameterization", choices=["eps", "x0"],
                    default="eps",
                    help="denoiser target: eps (reference) or x0 — the CO "
                         "specialist's winning recipe; guidance then lives "
                         "at omega~1 for every subtask")
    ap.add_argument("--proj-dim", type=int, default=128)
    ap.add_argument("--dims", type=int, nargs="+", default=[64, 32, 16, 8])
    ap.add_argument("--canvas-dim", type=int, default=None,
                    help="shared solution-canvas width (default: 5, the max "
                         "small-task dim; 80 for the multi-80 family)")
    ap.add_argument("--with-msr80", action="store_true",
                    help="add an 'msr80' one-hot slot trained on the "
                         "W-conditioned 80c waterfilling recipe "
                         "(ddpm_msr_80c_budget); implies --canvas-dim 80 "
                         "and payload 81")
    ap.add_argument("--msr80-samples", type=int, default=250000)
    ap.add_argument("--msr80-channels", type=int, default=80)
    ap.add_argument("--msr80-w-min", type=float, default=5.0)
    ap.add_argument("--msr80-w-max", type=float, default=45.0)
    ap.add_argument("--msr80-w-step", type=float, default=2.5)
    ap.add_argument("--msr80-exclude-budgets", type=float, nargs="*",
                    default=[20.0, 40.0])
    ap.add_argument("--msr80-y-scale", type=float, default=8.0)
    ap.add_argument("--with-msr8", action="store_true",
                    help="add an 'msr8' one-hot slot: the same W-conditioned "
                         "waterfilling recipe at M=8 (the middle of the "
                         "reference's channel-count zoo) on the shared wide "
                         "canvas; both 8c eval budgets (10/20 W) are "
                         "excluded from its training grid")
    ap.add_argument("--msr8-samples", type=int, default=100000)
    ap.add_argument("--msr8-exclude-budgets", type=float, nargs="*",
                    default=[10.0, 20.0])
    ap.add_argument("--out", default="ckpts/ddpm_multi")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip-eval", action="store_true")
    args = ap.parse_args()

    import dataclasses
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_default_matmul_precision", "highest")

    import pandas as pd

    from diffsg_tpu.data.generators import nu_dataset_extension
    from diffsg_tpu.data.loaders import load_co, load_msr, load_nu
    from diffsg_tpu.tasks import TASKS, evaluate
    from diffsg_tpu.tasks.multi import (embed_cond_np, embed_y_np,
                                        merge_multi_config, unet_multi)
    from diffsg_tpu.train import train_ddpm
    from diffsg_tpu.utils import save_checkpoint
    from tools.make_datasets import ensure_datasets

    from diffsg_tpu.tasks.multi import D_UNI, PAYLOAD, SLOTS

    ensure_datasets()
    slots = (tuple(SLOTS) + (("msr80",) if args.with_msr80 else ())
             + (("msr8",) if args.with_msr8 else ()))
    if args.with_msr80 and args.canvas_dim is None:
        args.canvas_dim = args.msr80_channels
    if args.with_msr8 and (args.canvas_dim or D_UNI) < 8:
        args.canvas_dim = 8
    canvas = args.canvas_dim or D_UNI
    payload = (args.msr80_channels + 1) if args.with_msr80 else PAYLOAD

    def embed_x(X, slot):
        return embed_cond_np(X, slot, slots=slots, payload_dim=payload)

    def embed_y(Y):
        return embed_y_np(Y, canvas_dim=canvas)

    subtask_configs = {}
    parts_X, parts_Y = [], []

    # --- MSR: centered + scaled labels, the ddpm_msr_3c_wf recipe ----------
    msr = load_msr(args.msr_dataset)
    W, M = msr.config["W"], msr.config["M"]
    msr_shift, msr_scale = W / M, 3.0
    Xm = np.tile(msr.X_train, (args.msr_repeat, 1))
    Ym = np.tile((msr.Y_train - msr_shift) * msr_scale, (args.msr_repeat, 1))
    parts_X.append(embed_x(Xm.astype(np.float32), "msr"))
    parts_Y.append(embed_y(Ym.astype(np.float32)))
    # full physics config + label transforms: lets Solver.from_checkpoint
    # serve this subtask from the multi ckpt without a dataset in hand
    subtask_configs["msr"] = {**msr.config, "y_scale": msr_scale,
                              "y_shift": msr_shift}
    print(f"msr rows: {len(Xm)} (x{args.msr_repeat})")

    # --- CO: raw shares (the eps ddpm_co recipe) ---------------------------
    co = load_co(args.co_dataset)
    Xc = np.tile(co.X_train, (args.co_repeat, 1))
    Yc = np.tile(co.Y_train, (args.co_repeat, 1))
    parts_X.append(embed_x(Xc.astype(np.float32), "co"))
    parts_Y.append(embed_y(Yc.astype(np.float32)))
    subtask_configs["co"] = dict(co.config)
    print(f"co rows: {len(Xc)} (x{args.co_repeat})")

    # --- wide-MSR slots: W-conditioned waterfilling recipe (multi-80) ------
    wide_msr = []
    if args.with_msr80:
        wide_msr.append(("msr80", args.msr80_channels, args.msr80_samples,
                         args.msr80_exclude_budgets))
    if args.with_msr8:
        wide_msr.append(("msr8", 8, args.msr8_samples,
                         args.msr8_exclude_budgets))
    for si, (slot_w, Mw, n_w, excl_w) in enumerate(wide_msr):
        from diffsg_tpu.data.generators import msr_waterfilling_labels
        from diffsg_tpu.data.loaders import MSR_W_REF

        grid = np.arange(args.msr80_w_min, args.msr80_w_max + 1e-9,
                         args.msr80_w_step)
        grid = np.array([w for w in grid
                         if not any(abs(w - e) < 1e-9 for e in excl_w)])
        rng_w = np.random.default_rng(args.seed + 100 + si)
        gs = rng_w.uniform(0.5, 2.5, size=(n_w, Mw))
        Ws = rng_w.choice(grid, size=n_w)
        Yw = np.zeros_like(gs)
        for w in grid:  # exact waterfilling labels, one batch per budget
            idx = np.nonzero(Ws == w)[0]
            _, Yw[idx] = msr_waterfilling_labels(gs[idx], float(w))
        mn_w, mx_w = float(gs.min()), float(gs.max())
        Xw = np.concatenate([(gs - mn_w) / (mx_w - mn_w),
                             Ws[:, None] / MSR_W_REF], axis=1)
        Yw_t = (Yw - Ws[:, None] / Mw) * args.msr80_y_scale
        parts_X.append(embed_x(Xw.astype(np.float32), slot_w))
        parts_Y.append(embed_y(Yw_t.astype(np.float32)))
        subtask_configs[slot_w] = {
            "M": Mw, "W": MSR_W_REF, "w_ref": MSR_W_REF,
            "scaler_min": mn_w, "scaler_max": mx_w,
            "y_scale": args.msr80_y_scale}
        print(f"{slot_w} rows: {len(Xw)} over {len(grid)} budgets "
              f"{grid[0]}..{grid[-1]} W (excluded: {excl_w})")

    # --- NU: budget- or geometry-conditioned -------------------------------
    from diffsg_tpu.data.loaders import NU_P_REF, TRAIN_RATIO

    if args.nu_mode == "geo":
        # The full nu_geo (dense_w4) recipe: mixed-geometry oracle rows +
        # the 400x400 multi-budget CSV + the reference 18 mW train split,
        # per-(W,H)-group rigid-motion augmented, per-row normalized
        # (tools/train_nu_geo.py helpers — same folding, unit-tested).
        from tools.train_nu_geo import (assemble_training_rows, augment_geo,
                                        normalize_rows_geo)

        base = assemble_training_rows(
            args.nu_geo_datasets, budget_path=args.nu_budget_dataset,
            indist_path=args.nu_dataset, train_ratio=TRAIN_RATIO,
            budget_repeat=args.nu_budget_repeat,
            ref_repeat=args.nu_ref_repeat)
        ext = augment_geo(base, times=args.nu_times, seed=args.seed)
        rows = np.concatenate([base, ext])
        Xn, Yn = normalize_rows_geo(rows)
        nu_shift = Yn.mean(axis=0)
        nu_scale = 8.0
        parts_X.append(embed_x(Xn.astype(np.float32), "nu"))
        parts_Y.append(
            embed_y(((Yn - nu_shift) * nu_scale).astype(np.float32)))
        subtask_configs["nu_geo"] = {
            "K": 3, "P_sum": 18.0, "width": 400.0, "height": 400.0,
            "p_ref": NU_P_REF, "w_ref": 400.0, "h_ref": 400.0,
            "y_scale": nu_scale, "y_shift": [float(v) for v in nu_shift]}
        print(f"nu rows: {len(Xn)} ({len(base)} base x{args.nu_times + 1}, "
              f"geometry+budget-conditioned)")
    else:
        from tools.train_nu_budget import load_budget_rows, normalize_rows

        nu = load_nu(args.nu_dataset)
        w, h, p_ref = nu.config["width"], nu.config["height"], NU_P_REF
        raw_b = load_budget_rows(args.nu_budget_dataset, w, h)
        raw_i = np.array(pd.read_csv(args.nu_dataset, header=None))
        raw_i = raw_i[: int(raw_i.shape[0] * TRAIN_RATIO)]  # train split only
        raw_i = np.concatenate(
            [raw_i, np.full((raw_i.shape[0], 1), nu.config["P_sum"])], axis=1)
        base = np.concatenate([raw_b, raw_i])
        ext = nu_dataset_extension(base, times=args.nu_times, seed=args.seed)
        rows = np.concatenate([base, ext])
        Xn, Yn = normalize_rows(rows, w, h, p_ref)
        nu_shift = Yn.mean(axis=0)
        nu_scale = 8.0
        parts_X.append(embed_x(Xn.astype(np.float32), "nu"))
        parts_Y.append(
            embed_y(((Yn - nu_shift) * nu_scale).astype(np.float32)))
        subtask_configs["nu"] = {**nu.config, "p_ref": p_ref,
                                 "y_scale": nu_scale,
                                 "y_shift": [float(v) for v in nu_shift]}
        print(f"nu rows: {len(Xn)} ({len(base)} base x{args.nu_times + 1}, "
              f"budget-conditioned)")

    X = np.concatenate(parts_X)
    Y = np.concatenate(parts_Y)
    print(f"total train rows: {len(X)} "
          f"(cond {X.shape[1]}, canvas {Y.shape[1]})")

    model = unet_multi(args.proj_dim, tuple(args.dims), canvas_dim=canvas,
                       payload_dim=payload, n_slots=len(slots))
    base_cfg = TASKS["multi_nu"].train_config  # NU's 200-epoch T=20 recipe
    cfg = dataclasses.replace(base_cfg, epochs=args.epochs, lr=args.lr,
                              milestones=tuple(args.milestones),
                              seed=args.seed, grad_clip=args.grad_clip,
                              parameterization=args.parameterization)
    if args.parameterization != "eps":
        for sub_cfg in subtask_configs.values():
            sub_cfg["parameterization"] = args.parameterization
    params, ema, sched = train_ddpm(model, X, Y, cfg, log_every=25)

    # n_blocks/is_attn are part of the arch record so eval/export code can
    # reconstruct the exact net from the checkpoint alone (single source of
    # truth — see unet_multi, which fixes both today).
    arch = {"proj_dim": args.proj_dim, "dims": list(args.dims),
            "n_blocks": 2, "is_attn": [False] * len(args.dims),
            "middle_attn": False, "canvas_dim": canvas,
            "payload_dim": payload, "slots": list(slots)}
    save_checkpoint(args.out, params, ema=ema, sched=sched, step=cfg.epochs,
                    metadata={"task": "multi",
                              "nu_mode": args.nu_mode,
                              "datasets": {"msr": args.msr_dataset,
                                           "co": args.co_dataset,
                                           "nu": args.nu_dataset,
                                           "nu_budget": args.nu_budget_dataset,
                                           **({"nu_geo": args.nu_geo_datasets}
                                             if args.nu_mode == "geo" else {})},
                              "msr_repeat": args.msr_repeat,
                              "co_repeat": args.co_repeat,
                              "nu_times": args.nu_times,
                              "config": dataclasses.asdict(cfg),
                              "arch": arch,
                              "subtask_configs": subtask_configs})

    if args.skip_eval:
        return
    metadata = {"arch": arch, "subtask_configs": subtask_configs}
    if args.parameterization == "x0":
        # x0-space CFG extrapolates solution estimates, not noise estimates:
        # useful guidance lives at omega ~ 1 for every subtask (measured on
        # the CO specialist, docs/RESULTS.md "CO x0-parameterization"); the
        # round-3 x0 multi NU peaked at omega 0 (pure conditional sampling).
        om_msr = om_co = (0.5, 1.0, 2.0)
        om_nu = (0.0, 0.06, 0.25, 1.0)
    else:
        om_msr, om_co, om_nu = ((0.5, 1.0, 2.0), (1000.0, 5000.0, 20000.0),
                                (0.0, 0.06, 0.125, 0.5))
    evals = []
    if args.with_msr80:
        # both 80c eval budgets are EXCLUDED from the msr80 training grid
        evals += [
            ("multi_msr80", "msr80",
             "datasets/80c_20w_wf_10000samples.csv", {}, om_msr),
            ("multi_msr80", "msr80",
             "datasets/80c_40w_wf_2000samples_ood.csv", {}, om_msr),
        ]
    if args.with_msr8:
        # both 8c eval budgets are EXCLUDED from the msr8 training grid
        evals += [
            ("multi_msr8", "msr8",
             "datasets/8c_10w_wf_10000samples.csv", {}, om_msr),
            ("multi_msr8", "msr8",
             "datasets/8c_20w_wf_2000samples_ood.csv", {}, om_msr),
        ]
    evals += [
        ("multi_msr", "msr", args.msr_dataset, {}, om_msr),
        ("multi_msr", "msr",
         "/root/reference/datasets/3c_20w_2000samples_ood.csv", {}, om_msr),
        ("multi_co", "co", args.co_dataset, {}, om_co),
        ("multi_co", "co",
         "/root/reference/datasets/3nodes_2000samples_ood.csv", {}, om_co),
    ]
    if args.nu_mode == "geo":
        # the five nu_geo eval configs — every one an unseen
        # (budget, W, H) combination for this checkpoint
        evals += [
            ("multi_nu_geo", "nu_geo", args.nu_dataset, {}, om_nu),
            ("multi_nu_geo", "nu_geo",
             "/root/reference/datasets/3u_30mW_1000samples_ood.csv", {},
             om_nu),
            ("multi_nu_geo", "nu_geo",
             "datasets/3u_geo480x360_21mW_1000samples.csv",
             {"width": 480.0, "height": 360.0, "P_sum": 21.0}, om_nu),
            ("multi_nu_geo", "nu_geo",
             "datasets/3u_geo600x600_33mW_500samples.csv",
             {"width": 600.0, "height": 600.0, "P_sum": 33.0}, om_nu),
            ("multi_nu_geo", "nu_geo",
             "datasets/3u_geo200x200_12mW_500samples.csv",
             {"width": 200.0, "height": 200.0, "P_sum": 12.0}, om_nu),
        ]
    else:
        evals += [
            ("multi_nu", "nu", args.nu_dataset, {}, om_nu),
            ("multi_nu", "nu",
             "/root/reference/datasets/3u_30mW_1000samples_ood.csv", {},
             om_nu),
        ]
    for task_key, slot, path, load_kw, omegas in evals:
        task = TASKS[task_key]
        d = task.load(path, **load_kw)
        merge_multi_config(d.config, metadata, slot)
        for om in omegas:
            m = evaluate(task, params, sched, d, omega=om)
            print(json.dumps({"split": pathlib.Path(path).name,
                              "task": task_key, "omega": om, **m}))


if __name__ == "__main__":
    main()
