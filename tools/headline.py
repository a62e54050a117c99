"""Reproduce every headline quality number from docs/RESULTS.md in one run.

For each task, loads the committed checkpoint and runs the tuned evaluation
configuration (sampler settings exactly as documented), printing one JSON
line per row.  Expected values (full test splits, TPU or CPU):

  msr_3c wf   centered+scaled training (y_shift W/M, y_scale 3), msr_wf
              decode, omega 1 single draw          -> less 0.9999919
              (20w OOD -> 1.000005; labels are the true optimum in-dist)
  msr_3c      best-of-8 @ omega 500 (legacy path) -> less 0.9993
  msr_3c W-conditioned  one model for any W (trained on W in 5..25
              EXCLUDING 10 and 20), omega 0.5 single draw -> 0.9999954
              at 10w / 1.0000052 at 20w — matches the per-budget
              specialists at budgets it never saw
  msr_8c wf   centered+scaled training (y_shift 1.25, y_scale 3), msr_wf
              decode, omega 1 single draw -> less 0.99993 vs the exact
              optimum (20w OOD -> 0.99998); completes the reference's
              published 8c GEKKO row (its unshipped dataset's labels were
              0.38% suboptimal; ours regenerate optimal to 9 digits)
  msr_80c wf250k  round-4 scaling cell (250k fresh-seed wf samples, 4x
              width, gentle lr 5e-4/clip 0.25 schedule), omega 1 single
              draw -> less 0.99960 in-dist / 0.99184 40w OOD
  msr_80c W-cond  one model for any W (trained on budgets 5..45 step 2.5
              EXCLUDING 20 and 40, same width+recipe): single draw
              -> 0.99937 at unseen 20w (omega 0.5) / 0.99983 at unseen
              40w (omega 1) — closes the 80c OOD gap
  msr_80c wf  wf50k ckpt (50k oracle samples, y_scale 8), msr_wf decode,
              omega 8: in-dist single draw -> less 0.9962 vs the exact
              waterfilling optimum; 40w OOD -> 0.9931
              (10k-trained ckpt: 0.9958 / 0.9926)
  msr_80c     legacy-label ckpt, msr_temp, omega 1000 -> less 0.9200 vs the
              infeasible LRH labels (97% of the feasible optimum)
  co x0 ranked  x0-parameterized ckpt + ranked decode, omega 1 SINGLE draw
              -> exceeded 1.00192 (OOD 1.00040); best-of-8 low-omega mix
              [0,0.5,1,1.5]x2 -> 1.0000017 in-dist (acc 0.9996) / 0.99939
              OOD (BELOW 1: beats the grid labels) — the CO headline
  co ranked   eps ckpt, co_ranked decode, omega 20000 single draw ->
              exceeded 1.00256 (OOD -> 1.00170); best-of-8 4-omega mix ->
              1.00051 in-dist / 1.00022 OOD (acc 0.981/0.962)
  co          co_analytic, best-of-32, 8-omega mix -> exceeded 1.0026
  co OOD      same                                 -> exceeded 1.0005
  co OOD single  plain decode, omega 5000 single   -> exceeded ~1.03
  nu self-improved  budget-conditioned ckpt RETRAINED on refined labels
              (tools/refine_labels.py), omega 0.5 PURE single draw ->
              gen 1: in-dist 1.6580 / 30mW OOD 1.6667 vs the original
              grid labels — no objective access at serve time;
              gen 2 (expert iteration, --model-seed): 1.6589 / 1.6685
  nu budget   budget-conditioned ckpt (condition carries P_sum/18; trained
              on multi-budget oracle data EXCLUDING budgets 18 and 30),
              omega 0.06 single draw -> in-dist 0.99985; 30mW OOD 0.99972
  nu geo      universal model (condition carries [P/18, W/400, H/400];
              400 m and 18/30 mW excluded from training) on entirely
              unseen configs: 18mW@400x400 -> 0.9882, 30mW@400x400 ->
              0.9983, 33mW@600x600 -> 0.9861 (geometry-blind model:
              0.9249), 12mW@200x200 -> 1.0007 (above the grid labels)
  nu geo dense  round-4 densified cells: dense_w4 18mW@400x400 -> 0.99784
              (30mW 1.00187); dense_w4_fresh (fine-tuned on 4k fresh
              oracle rows) -> 0.99846 / 1.00042
  nu geo x0f  round-5 SHIPPED universal: x0 parameterization + 15k fresh
              home-cell rows, omega 0 single draw -> 0.99989 / 0.99987 /
              1.00015 / 0.99809 / 1.00006 on the five configs — beats the
              blind specialists on ALL five (two above the grid labels)
  nu direct   aug32 + centered + y_scale-8 ckpt, nu_direct decode,
              omega 0.125 single draw -> in-dist 0.9993; OOD 0.9963
              (aug2 s8 ckpt @ omega 1 -> 0.9918 / 0.9883)
  nu          best ckpt, best-of-32, 8-omega mix   -> less 1.234
  nu OOD bo32 best ckpt, best-of-32, 8-omega mix   -> less 1.233
  nu OOD aug  legacy augmented ckpt, single @ omega 2000 -> less 0.9058
  multi       ONE x0-parameterized net for all three problems (task one-hot
              conditioning, shared 5-dim canvas; ckpts/ddpm_multi):
              msr 0.9999996 / OOD 1.0000005; co 1.00044 / OOD 0.99995
              (below 1: beats the grid labels); nu 0.99967 / OOD 0.99635
  hybrid      single draw + 50 projected-gradient refine steps
              (ops.refine; objective access like the GD/GEKKO baselines):
              msr_80c 1.0000005 / 1.0000008 (residual closed);
              nu budget 1.6432 / 1.6565 (beats the grid labels by ~64%)

Usage:  python tools/headline.py [--tasks msr co nu msr80 hybrid] [--cpu]
        python tools/headline.py --fast   # 5-row smoke tier, first 512 eval
                                          # rows each — seconds when the
                                          # compile cache is warm
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REF = "/root/reference/datasets"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tasks", nargs="+",
                    default=["msr", "msr80", "co", "nu", "multi", "hybrid"],
                    choices=["msr", "msr80", "co", "nu", "multi", "hybrid"])
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--fast", action="store_true",
                    help="smoke tier: one representative row per task family "
                         "on the first --limit (default 512) eval rows — "
                         "seconds with a warm compile cache; values are "
                         "single-batch, NOT the documented full-split numbers")
    ap.add_argument("--limit", type=int, default=None,
                    help="evaluate only the first N test rows (decoders have "
                         "batch-global semantics, so values shift slightly "
                         "vs the full split)")
    args = ap.parse_args()
    if args.fast and args.limit is None:
        args.limit = 512

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    # NU quality is matmul-precision sensitive (~2% at omega=2000 between
    # TPU-default bf16 matmuls and f32); pin f32 so numbers are
    # reproducible across backends. MSR/CO are insensitive.
    jax.config.update("jax_default_matmul_precision", "highest")

    from diffsg_tpu.tasks import TASKS, evaluate
    from diffsg_tpu.utils import load_checkpoint
    from tools.make_datasets import ensure_datasets

    ensure_datasets()  # datasets/ is gitignored; regenerate whatever is gone

    def limit_data(data):
        if args.limit:
            data.X_test = data.X_test[: args.limit]
            data.Y_test = data.Y_test[: args.limit]
            if data.R_test is not None:
                data.R_test = data.R_test[: args.limit]

    def row(name, task_key, ckpt, dataset, load_kw=None, fast=False, **kw):
        if args.fast and not fast:
            return
        task = TASKS[task_key]
        ck = load_checkpoint(ckpt)
        data = task.load(dataset, **(load_kw or {}))
        limit_data(data)
        from diffsg_tpu.tasks.base import merge_ckpt_config

        merge_ckpt_config(data.config, ck.get("metadata"))
        m = evaluate(task, ck["params"], ck["sched"], data, **kw)
        print(json.dumps({"row": name, **m}))

    wide_mix = [10., 30., 100., 300., 1000., 3000., 5000., 10000.] * 4
    nu_mix = [50., 150., 500., 1000., 2000., 5000., 10000., 20000.] * 4

    if "msr" in args.tasks:
        row("msr_3c wf single-draw", "msr_wf", "ckpts/ddpm_msr_3c_wf",
            f"{REF}/3c_10w_10000samples.csv", omega=1.0, fast=True)
        row("msr_3c wf OOD 20w single-draw", "msr_wf", "ckpts/ddpm_msr_3c_wf",
            f"{REF}/3c_20w_2000samples_ood.csv", omega=1.0)
        row("msr_3c best-of-8 (legacy softmax path)", "msr", "ckpts/ddpm_msr_3c",
            f"{REF}/3c_10w_10000samples.csv", omega=500.0, best_of=8)
        row("msr_3c W-conditioned single-draw (10w unseen)", "msr_budget",
            "ckpts/ddpm_msr_budget",
            f"{REF}/3c_10w_10000samples.csv", omega=0.5)
        row("msr_3c W-conditioned OOD 20w single-draw (unseen)", "msr_budget",
            "ckpts/ddpm_msr_budget",
            f"{REF}/3c_20w_2000samples_ood.csv", omega=0.5)
        row("msr_8c wf single-draw", "msr_wf", "ckpts/ddpm_msr_8c_wf",
            "datasets/8c_10w_wf_10000samples.csv", omega=1.0)
        row("msr_8c wf OOD 20w single-draw", "msr_wf",
            "ckpts/ddpm_msr_8c_wf",
            "datasets/8c_20w_wf_2000samples_ood.csv", omega=1.0)
    if "msr80" in args.tasks:
        # round-4 scaling cell: 250k fresh-seed wf samples x 4x width x
        # gentle schedule (lr 5e-4, clip 0.25) — single draw >=0.999
        # in-dist at omega=1 (RESULTS.md "Round 4: the data x width x
        # schedule cell closes 80c in-dist").
        row("msr_80c wf250k single-draw", "msr_wf",
            "ckpts/ddpm_msr_80c_wf250k",
            "datasets/80c_20w_wf_10000samples.csv", omega=1.0, fast=True)
        row("msr_80c wf250k OOD 40w single-draw", "msr_wf",
            "ckpts/ddpm_msr_80c_wf250k",
            "datasets/80c_40w_wf_2000samples_ood.csv", omega=1.0)
        # W-conditioned 80c (trained on budgets 5..45 step 2.5 EXCLUDING
        # 20 and 40): one model for any W, >=0.999 single draw on BOTH
        # unseen eval budgets — closes the 80c OOD gap the W=20
        # specialist can't (0.9918).
        row("msr_80c W-conditioned single-draw (20w unseen)", "msr_budget",
            "ckpts/ddpm_msr_80c_budget",
            "datasets/80c_20w_wf_10000samples.csv", omega=0.5)
        row("msr_80c W-conditioned OOD 40w single-draw (unseen)",
            "msr_budget", "ckpts/ddpm_msr_80c_budget",
            "datasets/80c_40w_wf_2000samples_ood.csv", omega=1.0)
        row("msr_80c wf50k single-draw", "msr_wf", "ckpts/ddpm_msr_80c_wf50k",
            "datasets/80c_20w_wf_10000samples.csv", omega=8.0)
        row("msr_80c wf50k OOD 40w single-draw", "msr_wf",
            "ckpts/ddpm_msr_80c_wf50k",
            "datasets/80c_40w_wf_2000samples_ood.csv", omega=8.0)
        row("msr_80c wf single-draw (10k-trained)", "msr_wf",
            "ckpts/ddpm_msr_80c_wf",
            "datasets/80c_20w_wf_10000samples.csv", omega=8.0)
        row("msr_80c temp-decode (legacy labels)", "msr_temp",
            "ckpts/ddpm_msr_80c",
            "datasets/80c_20w_10000samples.csv", omega=1000.0)
    co_rank_mix = [2000., 5000., 10000., 20000.] * 2
    co_x0_mix = [0., 0.5, 1., 1.5] * 2
    if "co" in args.tasks:
        row("co x0 ranked single-draw", "co_ranked", "ckpts/ddpm_co_x0",
            "datasets/3nodes_50000samples_new.csv", omega=1.0, fast=True)
        row("co OOD x0 ranked single-draw", "co_ranked", "ckpts/ddpm_co_x0",
            f"{REF}/3nodes_2000samples_ood.csv", omega=1.0)
        row("co x0 ranked bo8 mix", "co_ranked", "ckpts/ddpm_co_x0",
            "datasets/3nodes_50000samples_new.csv",
            omega=co_x0_mix, best_of=len(co_x0_mix))
        row("co OOD x0 ranked bo8 mix", "co_ranked", "ckpts/ddpm_co_x0",
            f"{REF}/3nodes_2000samples_ood.csv",
            omega=co_x0_mix, best_of=len(co_x0_mix))
        row("co ranked single-draw", "co_ranked", "ckpts/ddpm_co",
            "datasets/3nodes_50000samples_new.csv", omega=20000.0)
        row("co OOD ranked single-draw", "co_ranked", "ckpts/ddpm_co",
            f"{REF}/3nodes_2000samples_ood.csv", omega=20000.0)
        row("co ranked bo8 mix", "co_ranked", "ckpts/ddpm_co",
            "datasets/3nodes_50000samples_new.csv",
            omega=co_rank_mix, best_of=len(co_rank_mix))
        row("co OOD ranked bo8 mix", "co_ranked", "ckpts/ddpm_co",
            f"{REF}/3nodes_2000samples_ood.csv",
            omega=co_rank_mix, best_of=len(co_rank_mix))
        row("co analytic bo32", "co_analytic", "ckpts/ddpm_co",
            "datasets/3nodes_50000samples_new.csv",
            omega=wide_mix, best_of=len(wide_mix))
        row("co OOD analytic bo32", "co_analytic", "ckpts/ddpm_co",
            f"{REF}/3nodes_2000samples_ood.csv",
            omega=wide_mix, best_of=len(wide_mix))
        row("co OOD single-draw", "co", "ckpts/ddpm_co",
            f"{REF}/3nodes_2000samples_ood.csv", omega=5000.0)
    if "nu" in args.tasks:
        # self-improved model (tools/refine_labels.py data engine): trained
        # on refined labels; PURE single draw beats the grid labels ~1.65x
        # with no objective access at serve time (docs/RESULTS.md).
        # Generation 2 (--model-seed expert iteration: labels snapped to the
        # gen-1 model's own refined basins) is the NU headline.
        row("nu self-improved gen2 single-draw", "nu_budget",
            "ckpts/ddpm_nu_budget_refined2",
            f"{REF}/3u_18mW_10000samples.csv", omega=0.5)
        row("nu self-improved gen2 OOD 30mW single-draw", "nu_budget",
            "ckpts/ddpm_nu_budget_refined2",
            f"{REF}/3u_30mW_1000samples_ood.csv", omega=0.5)
        row("nu self-improved single-draw", "nu_budget",
            "ckpts/ddpm_nu_budget_refined",
            f"{REF}/3u_18mW_10000samples.csv", omega=0.5)
        row("nu self-improved OOD 30mW single-draw", "nu_budget",
            "ckpts/ddpm_nu_budget_refined",
            f"{REF}/3u_30mW_1000samples_ood.csv", omega=0.5)
        row("nu budget-conditioned single-draw", "nu_budget",
            "ckpts/ddpm_nu_budget",
            f"{REF}/3u_18mW_10000samples.csv", omega=0.06, fast=True)
        row("nu budget-conditioned OOD 30mW single-draw", "nu_budget",
            "ckpts/ddpm_nu_budget",
            f"{REF}/3u_30mW_1000samples_ood.csv", omega=0.06)
        row("nu direct single-draw (aug32 centered)", "nu_direct",
            "ckpts/ddpm_nu_3u_aug32_s8c",
            f"{REF}/3u_18mW_10000samples.csv", omega=0.125)
        row("nu direct OOD single-draw (aug32 centered)", "nu_direct",
            "ckpts/ddpm_nu_3u_aug32_s8c",
            f"{REF}/3u_30mW_1000samples_ood.csv", omega=0.125)
        row("nu direct single-draw (aug2 s8, round-2a)", "nu_direct",
            "ckpts/ddpm_nu_3u_aug_s8",
            f"{REF}/3u_18mW_10000samples.csv", omega=1.0)
        row("nu bo32 mix", "nu", "ckpts/ddpm_nu_3u_best",
            f"{REF}/3u_18mW_10000samples.csv",
            omega=nu_mix, best_of=len(nu_mix))
        row("nu OOD bo32 mix", "nu", "ckpts/ddpm_nu_3u_best",
            f"{REF}/3u_30mW_1000samples_ood.csv",
            omega=nu_mix, best_of=len(nu_mix))
        row("nu OOD augmented", "nu", "ckpts/ddpm_nu_3u_aug",
            f"{REF}/3u_30mW_1000samples_ood.csv", omega=2000.0)
        # universal model (nu_geo): budget AND geometry conditioned; every
        # row below is an entirely unseen (budget, W, H) configuration
        # (400 m and 18/30 mW are excluded from its training grids).
        # The self-improved variant retrains the SAME recipe on
        # refine_labels output (ratios are vs each set's oracle GRID
        # labels; fit-to-refined-ceiling is 0.994-0.999, RESULTS.md).
        row("nu geo universal self-improved (unseen 18mW 400x400)",
            "nu_geo", "ckpts/ddpm_nu_geo_refined",
            f"{REF}/3u_18mW_10000samples.csv", omega=0.5)
        row("nu geo universal self-improved (unseen 30mW 400x400)",
            "nu_geo", "ckpts/ddpm_nu_geo_refined",
            f"{REF}/3u_30mW_1000samples_ood.csv", omega=0.5)
        row("nu geo universal self-improved (600x600 33mW)", "nu_geo",
            "ckpts/ddpm_nu_geo_refined",
            "datasets/3u_geo600x600_33mW_500samples.csv", omega=0.5,
            load_kw={"width": 600.0, "height": 600.0, "P_sum": 33.0})
        row("nu geo universal self-improved (200x200 12mW)", "nu_geo",
            "ckpts/ddpm_nu_geo_refined",
            "datasets/3u_geo200x200_12mW_500samples.csv", omega=0.5,
            load_kw={"width": 200.0, "height": 200.0, "P_sum": 12.0})
        row("nu geo universal self-improved (480x360 21mW)", "nu_geo",
            "ckpts/ddpm_nu_geo_refined",
            "datasets/3u_geo480x360_21mW_1000samples.csv", omega=0.5,
            load_kw={"width": 480.0, "height": 360.0, "P_sum": 21.0})
        row("nu geo universal (unseen 18mW 400x400)", "nu_geo",
            "ckpts/ddpm_nu_geo",
            f"{REF}/3u_18mW_10000samples.csv", omega=0.5)
        row("nu geo universal (unseen 30mW 400x400)", "nu_geo",
            "ckpts/ddpm_nu_geo",
            f"{REF}/3u_30mW_1000samples_ood.csv", omega=0.06)
        row("nu geo universal (600x600 33mW)", "nu_geo", "ckpts/ddpm_nu_geo",
            "datasets/3u_geo600x600_33mW_500samples.csv", omega=0.25,
            load_kw={"width": 600.0, "height": 600.0, "P_sum": 33.0})
        row("nu geo universal (200x200 12mW)", "nu_geo", "ckpts/ddpm_nu_geo",
            "datasets/3u_geo200x200_12mW_500samples.csv", omega=0.06,
            load_kw={"width": 200.0, "height": 200.0, "P_sum": 12.0})
        # round-5 closure: the x0-parameterized universal model trained on
        # the dense_w4 mixture + 15k fresh home-cell oracle rows beats the
        # blind specialists on ALL FIVE configs (RESULTS.md round-5 x0
        # section); best omega 0 = pure conditional sampling (skip-uncond
        # fast path).  Every row is an unseen (budget, W, H) config.
        row("nu geo universal x0f (unseen 18mW 400x400)", "nu_geo",
            "ckpts/ddpm_nu_geo_x0f",
            f"{REF}/3u_18mW_10000samples.csv", omega=0.0, fast=True)
        row("nu geo universal x0f (unseen 30mW 400x400)", "nu_geo",
            "ckpts/ddpm_nu_geo_x0f",
            f"{REF}/3u_30mW_1000samples_ood.csv", omega=0.0)
        row("nu geo universal x0f (480x360 21mW)", "nu_geo",
            "ckpts/ddpm_nu_geo_x0f",
            "datasets/3u_geo480x360_21mW_1000samples.csv", omega=0.0,
            load_kw={"width": 480.0, "height": 360.0, "P_sum": 21.0})
        row("nu geo universal x0f (600x600 33mW)", "nu_geo",
            "ckpts/ddpm_nu_geo_x0f",
            "datasets/3u_geo600x600_33mW_500samples.csv", omega=0.0,
            load_kw={"width": 600.0, "height": 600.0, "P_sum": 33.0})
        row("nu geo universal x0f (200x200 12mW)", "nu_geo",
            "ckpts/ddpm_nu_geo_x0f",
            "datasets/3u_geo200x200_12mW_500samples.csv", omega=0.0,
            load_kw={"width": 200.0, "height": 200.0, "P_sum": 12.0})
        # round-4 densified cells (RESULTS.md "densifying nu_geo near the
        # reference geometry"): dense_w4 = proj-64 net with the specialist
        # 400x400 data folded in (beats the blind specialists on 4/5
        # configs); dense_w4_fresh = its fine-tune on 4k FRESH 18mW@400x400
        # oracle rows — the first lever that moved the home-cell residual.
        # Eval-only rows: training CSVs have multi-minute regens (docs/TODO),
        # but eval needs only the auto-regenerated reference splits.
        row("nu geo dense_w4 (unseen 18mW 400x400)", "nu_geo",
            "ckpts/ddpm_nu_geo_dense_w4",
            f"{REF}/3u_18mW_10000samples.csv", omega=0.06)
        row("nu geo dense_w4_fresh (unseen 18mW 400x400)", "nu_geo",
            "ckpts/ddpm_nu_geo_dense_w4_fresh",
            f"{REF}/3u_18mW_10000samples.csv", omega=0.06)
        row("nu geo dense_w4_fresh (unseen 30mW 400x400)", "nu_geo",
            "ckpts/ddpm_nu_geo_dense_w4_fresh",
            f"{REF}/3u_30mW_1000samples_ood.csv", omega=0.06)
    if "multi" in args.tasks:
        # ONE net for all three problems (tools/train_multi.py, x0
        # parameterization — the recipe that closed the shared-capacity CO
        # gap; RESULTS.md "Multi-task model").  Wrapper tasks resolve the
        # per-subtask physics + label transforms from checkpoint metadata.
        from diffsg_tpu.tasks.multi import merge_multi_config

        def mrow(name, task_key, dataset, omega, load_kw=None, fast=False,
                 ckpt="ckpts/ddpm_multi"):
            if args.fast and not fast:
                return
            task = TASKS[task_key]
            ck = load_checkpoint(ckpt)
            data = task.load(dataset, **(load_kw or {}))
            limit_data(data)
            merge_multi_config(data.config, ck["metadata"],
                               task_key.split("_", 1)[1])
            m = evaluate(task, ck["params"], ck["sched"], data, omega=omega)
            print(json.dumps({"row": name, **m}))

        mrow("multi msr_3c single-draw", "multi_msr",
             f"{REF}/3c_10w_10000samples.csv", 0.5, fast=True)
        mrow("multi msr_3c OOD 20w single-draw", "multi_msr",
             f"{REF}/3c_20w_2000samples_ood.csv", 1.0)
        mrow("multi co ranked single-draw", "multi_co",
             "datasets/3nodes_50000samples_new.csv", 0.5)
        mrow("multi co OOD ranked single-draw", "multi_co",
             f"{REF}/3nodes_2000samples_ood.csv", 0.5)
        mrow("multi nu single-draw", "multi_nu",
             f"{REF}/3u_18mW_10000samples.csv", 0.0)
        mrow("multi nu OOD 30mW single-draw", "multi_nu",
             f"{REF}/3u_30mW_1000samples_ood.csv", 0.0)
        # geometry-unified multi (round 5): the NU slot carries the FULL
        # nu_geo condition, so ONE ckpt serves any task x budget x
        # rectangle; all five geo configs are unseen (budget, W, H) combos
        # (RESULTS.md "the geometry-unified multi checkpoint").
        GEO = "ckpts/ddpm_multi_geo"
        mrow("multi_geo nu 18mW 400x400 (unseen)", "multi_nu_geo",
             f"{REF}/3u_18mW_10000samples.csv", 0.0, ckpt=GEO)
        mrow("multi_geo nu OOD 30mW 400x400 (unseen)", "multi_nu_geo",
             f"{REF}/3u_30mW_1000samples_ood.csv", 0.0, ckpt=GEO)
        mrow("multi_geo nu 480x360 21mW", "multi_nu_geo",
             "datasets/3u_geo480x360_21mW_1000samples.csv", 0.0, ckpt=GEO,
             load_kw={"width": 480.0, "height": 360.0, "P_sum": 21.0})
        mrow("multi_geo nu 600x600 33mW", "multi_nu_geo",
             "datasets/3u_geo600x600_33mW_500samples.csv", 0.0, ckpt=GEO,
             load_kw={"width": 600.0, "height": 600.0, "P_sum": 33.0})
        mrow("multi_geo nu 200x200 12mW", "multi_nu_geo",
             "datasets/3u_geo200x200_12mW_500samples.csv", 0.0, ckpt=GEO,
             load_kw={"width": 200.0, "height": 200.0, "P_sum": 12.0})
        mrow("multi_geo msr_3c single-draw", "multi_msr",
             f"{REF}/3c_10w_10000samples.csv", 0.5, ckpt=GEO)
        mrow("multi_geo co ranked single-draw", "multi_co",
             "datasets/3nodes_50000samples_new.csv", 0.5, ckpt=GEO)
        # multi-80 (round 5): the widened canvas carries the whole MSR
        # channel zoo (3c/8c/80c, all four wide budgets unseen) + CO + NU
        # on one proj-256 net (RESULTS.md "the multi-80 checkpoint").
        M80 = "ckpts/ddpm_multi_80"
        mrow("multi_80 msr_80c 20w (unseen)", "multi_msr80",
             "datasets/80c_20w_wf_10000samples.csv", 0.5, ckpt=M80)
        mrow("multi_80 msr_80c OOD 40w (unseen)", "multi_msr80",
             "datasets/80c_40w_wf_2000samples_ood.csv", 0.5, ckpt=M80)
        mrow("multi_80 msr_8c 10w (unseen)", "multi_msr8",
             "datasets/8c_10w_wf_10000samples.csv", 0.5, ckpt=M80)
        mrow("multi_80 msr_8c OOD 20w (unseen)", "multi_msr8",
             "datasets/8c_20w_wf_2000samples_ood.csv", 0.5, ckpt=M80)
        mrow("multi_80 msr_3c single-draw", "multi_msr",
             f"{REF}/3c_10w_10000samples.csv", 0.5, ckpt=M80)
        mrow("multi_80 co ranked single-draw", "multi_co",
             "datasets/3nodes_50000samples_new.csv", 0.5, ckpt=M80)
        mrow("multi_80 nu single-draw", "multi_nu",
             f"{REF}/3u_18mW_10000samples.csv", 0.0, ckpt=M80)
        mrow("multi_80 nu OOD 30mW single-draw", "multi_nu",
             f"{REF}/3u_30mW_1000samples_ood.csv", 0.0, ckpt=M80)
        # grand-unified zoo ckpt (round 5): geometry-conditioned NU + the
        # whole W-conditioned channel zoo + CO on ONE 80-canvas net — the
        # measured cost of total unification (RESULTS.md "the
        # grand-unified zoo checkpoint").
        ZOO = "ckpts/ddpm_multi_zoo"
        mrow("multi_zoo nu 18mW 400x400 (unseen)", "multi_nu_geo",
             f"{REF}/3u_18mW_10000samples.csv", 0.0, ckpt=ZOO)
        mrow("multi_zoo nu OOD 30mW 400x400 (unseen)", "multi_nu_geo",
             f"{REF}/3u_30mW_1000samples_ood.csv", 0.0, ckpt=ZOO)
        mrow("multi_zoo msr_80c 20w (unseen)", "multi_msr80",
             "datasets/80c_20w_wf_10000samples.csv", 0.5, ckpt=ZOO)
        mrow("multi_zoo msr_8c 10w (unseen)", "multi_msr8",
             "datasets/8c_10w_wf_10000samples.csv", 0.5, ckpt=ZOO)
        mrow("multi_zoo msr_3c single-draw", "multi_msr",
             f"{REF}/3c_10w_10000samples.csv", 0.5, ckpt=ZOO)
        mrow("multi_zoo co ranked single-draw", "multi_co",
             "datasets/3nodes_50000samples_new.csv", 0.5, ckpt=ZOO)
    if "hybrid" in args.tasks:
        # hybrid diffusion + local search (ops.refine): single draw + 50
        # projected-gradient steps on the exact objective (RESULTS.md
        # "Hybrid diffusion + local search").  Uses objective access like
        # the GD/GEKKO baselines — reported apart from pure parity rows.
        row("hybrid msr_80c wf50k +refine50", "msr_wf",
            "ckpts/ddpm_msr_80c_wf50k",
            "datasets/80c_20w_wf_10000samples.csv", omega=8.0,
            refine_iters=50)
        row("hybrid msr_80c OOD 40w +refine50", "msr_wf",
            "ckpts/ddpm_msr_80c_wf50k",
            "datasets/80c_40w_wf_2000samples_ood.csv", omega=8.0,
            refine_iters=50)
        row("hybrid nu budget +refine50", "nu_budget",
            "ckpts/ddpm_nu_budget",
            f"{REF}/3u_18mW_10000samples.csv", omega=0.06, refine_iters=50)
        row("hybrid nu budget OOD 30mW +refine50", "nu_budget",
            "ckpts/ddpm_nu_budget",
            f"{REF}/3u_30mW_1000samples_ood.csv", omega=0.06,
            refine_iters=50)


if __name__ == "__main__":
    main()
