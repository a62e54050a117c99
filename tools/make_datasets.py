"""Regenerate the DiffSG datasets (including the reference's missing blobs).

The reference repo's large dataset blobs are absent
(``.MISSING_LARGE_BLOBS``): ``3nodes_50000samples_new.csv`` (CO train) and
``80c_20w_10000samples.csv`` / ``80c_40w_2000samples_ood.csv`` (MSR-80c).
This CLI regenerates them — plus any other config — with the framework's
vectorized/native oracles, in the exact shipped CSV layouts.

Usage:
  python tools/make_datasets.py co   --samples 50000 --out datasets/3nodes_50000samples_new.csv
  python tools/make_datasets.py msr  --samples 10000 --channels 80 --power 20 \
      --out datasets/80c_20w_10000samples.csv
  python tools/make_datasets.py nu   --samples 1000 --power 18 --out datasets/3u_18mW_1000samples.csv
"""

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


#: regeneration recipes for the repo's gitignored datasets/ directory
#: (deterministic; see README "regenerate the reference's missing blobs").
KNOWN_DATASETS = {
    "3nodes_50000samples_new.csv": ["co", "--samples", "50000"],
    "80c_20w_10000samples.csv": ["msr", "--samples", "10000", "--channels",
                                 "80", "--power", "20"],
    "80c_40w_2000samples_ood.csv": ["msr", "--samples", "2000", "--channels",
                                    "80", "--power", "40", "--seed", "1"],
    "80c_20w_wf_10000samples.csv": ["msr", "--samples", "10000", "--channels",
                                    "80", "--power", "20", "--labels", "wf"],
    "80c_40w_wf_2000samples_ood.csv": ["msr", "--samples", "2000",
                                       "--channels", "80", "--power", "40",
                                       "--seed", "1", "--labels", "wf"],
    "80c_20w_wf_50000samples.csv": ["msr", "--samples", "50000", "--channels",
                                    "80", "--power", "20", "--labels", "wf"],
    "8c_10w_10000samples.csv": ["msr", "--samples", "10000", "--channels",
                                "8", "--power", "10"],
    "8c_10w_wf_10000samples.csv": ["msr", "--samples", "10000", "--channels",
                                   "8", "--power", "10", "--labels", "wf"],
    "8c_20w_2000samples_ood.csv": ["msr", "--samples", "2000", "--channels",
                                   "8", "--power", "20", "--seed", "1"],
    "8c_20w_wf_2000samples_ood.csv": ["msr", "--samples", "2000",
                                      "--channels", "8", "--power", "20",
                                      "--seed", "1", "--labels", "wf"],
    # unseen-geometry NU eval sets for the universal nu_geo model (the
    # 480x360 set uses grid-step 2: labels measured within 0.004% of
    # grid-1, ~4x cheaper to regenerate)
    "3u_geo600x600_33mW_500samples.csv": ["nu", "--samples", "500",
                                          "--power", "33", "--width", "600",
                                          "--height", "600", "--seed", "11",
                                          "--grid-step", "3"],
    "3u_geo200x200_12mW_500samples.csv": ["nu", "--samples", "500",
                                          "--power", "12", "--width", "200",
                                          "--height", "200", "--seed", "12"],
    "3u_geo480x360_21mW_1000samples.csv": ["nu", "--samples", "1000",
                                           "--power", "21", "--width", "480",
                                           "--height", "360", "--seed", "7",
                                           "--grid-step", "2"],
}


def ensure_datasets(names=None, root=None):
    """Regenerate any missing known dataset CSVs (datasets/ is gitignored and
    does not survive a fresh checkout; generation is deterministic and takes
    seconds).  ``names`` defaults to every known dataset."""
    root = pathlib.Path(root or pathlib.Path(__file__).resolve().parent.parent
                        / "datasets")
    for name in (names or KNOWN_DATASETS):
        out = root / name
        if not out.exists():
            main(KNOWN_DATASETS[name] + ["--out", str(out)])


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="task", required=True)

    co = sub.add_parser("co")
    co.add_argument("--samples", type=int, default=50000)
    co.add_argument("--nodes", type=int, default=3)
    co.add_argument("--step", type=float, default=0.02)
    co.add_argument("--seed", type=int, default=0)
    co.add_argument("--out", required=True)

    msr = sub.add_parser("msr")
    msr.add_argument("--samples", type=int, default=10000)
    msr.add_argument("--channels", type=int, default=3)
    msr.add_argument("--power", type=float, default=10.0)
    msr.add_argument("--gmin", type=float, default=0.5)
    msr.add_argument("--gmax", type=float, default=2.5)
    msr.add_argument("--seed", type=int, default=0)
    msr.add_argument("--labels", choices=["lrh", "wf"], default="lrh",
                     help="lrh = reference gradient-ascent labels; wf = "
                          "exact feasible waterfilling labels (same gains "
                          "for the same seed)")
    msr.add_argument("--out", required=True)

    nu = sub.add_parser("nu")
    nu.add_argument("--samples", type=int, default=1000)
    nu.add_argument("--power", type=float, default=18.0)
    nu.add_argument("--width", type=float, default=400.0)
    nu.add_argument("--height", type=float, default=400.0)
    nu.add_argument("--grid-step", type=float, default=1.0)
    nu.add_argument("--seed", type=int, default=0)
    nu.add_argument("--native", action="store_true", default=True)
    nu.add_argument("--no-native", dest="native", action="store_false")
    nu.add_argument("--legacy-sinr", action="store_true")
    nu.add_argument("--out", required=True)

    # Multi-budget NU training set for budget-conditioned models: per-sample
    # power budget drawn from a discrete grid, stored as a 13th CSV column
    # [q x 6, L x 2, P x 3, rate, P_sum].  The eval budgets 18 (in-dist CSV
    # covers it exactly) and 30 (the OOD split) are EXCLUDED from the grid by
    # default so the 30mW eval stays an unseen budget.  grid-step 2 labels
    # are within 0.004% of the grid-1 oracle (measured) at ~4x less compute.
    nub = sub.add_parser("nu-budget")
    nub.add_argument("--samples", type=int, default=10000)
    nub.add_argument("--budget-min", type=float, default=9.0)
    nub.add_argument("--budget-max", type=float, default=36.0)
    nub.add_argument("--budget-step", type=float, default=1.0)
    nub.add_argument("--exclude-budgets", type=float, nargs="*",
                     default=[18.0, 30.0])
    nub.add_argument("--grid-step", type=float, default=2.0)
    nub.add_argument("--seed", type=int, default=0)
    nub.add_argument("--out", required=True)

    # Mixed-geometry + mixed-budget NU training set for the universal
    # ``nu_geo`` task: per-sample field size (W, H) from a discrete grid and
    # power budget like nu-budget, stored as trailing CSV columns
    # [q x 6, L x 2, P x 3, rate, P_sum, W, H] (15 cols).  The reference
    # geometry 400x400 and the eval budgets 18/30 are EXCLUDED by default,
    # so the reference test splits are entirely unseen configurations.
    nug = sub.add_parser("nu-geo")
    nug.add_argument("--samples", type=int, default=10000)
    nug.add_argument("--geom-min", type=float, default=200.0)
    nug.add_argument("--geom-max", type=float, default=600.0)
    nug.add_argument("--geom-step", type=float, default=40.0)
    nug.add_argument("--exclude-geoms", type=float, nargs="*", default=[400.0])
    nug.add_argument("--budget-min", type=float, default=9.0)
    nug.add_argument("--budget-max", type=float, default=36.0)
    nug.add_argument("--budget-step", type=float, default=3.0)
    nug.add_argument("--exclude-budgets", type=float, nargs="*",
                     default=[18.0, 30.0])
    nug.add_argument("--grid-step", type=float, default=2.0)
    nug.add_argument("--focus-frac", type=float, default=0.0,
                     help="fraction of samples importance-sampled from the "
                          "focus geometry range (densify cells near the "
                          "reference 400 m field; rest uniform over the "
                          "full grid).  Focus rows are interleaved "
                          "randomly, not blocked.")
    nug.add_argument("--focus-geom-min", type=float, default=320.0)
    nug.add_argument("--focus-geom-max", type=float, default=480.0)
    nug.add_argument("--focus-geom-step", type=float, default=None,
                     help="geometry grid step inside the focus range "
                          "(default: the base --geom-step).  A finer focus "
                          "step (e.g. 20) densifies interpolation toward "
                          "the excluded reference 400 m cell.")
    nug.add_argument("--seed", type=int, default=0)
    nug.add_argument("--out", required=True)

    args = ap.parse_args(argv)
    out = pathlib.Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    t0 = time.time()

    if args.task == "co":
        from diffsg_tpu.data.generators import co_minlp_gen

        data, ms = co_minlp_gen(args.samples, args.nodes, args.step, args.seed,
                                log_timing=True)
        np.savetxt(out, data, delimiter=",")

    elif args.task == "msr":
        from diffsg_tpu.data.generators import (
            msr_waterfilling_labels, sum_rate_gen, write_msr_csv)

        if args.labels == "wf":
            rng = np.random.default_rng(args.seed)
            gs = rng.uniform(args.gmin, args.gmax,
                             size=(args.samples, args.channels))
            rates, schemes = msr_waterfilling_labels(gs, args.power)
        else:
            gs, rates, schemes = sum_rate_gen(
                args.samples, args.channels, (args.gmin, args.gmax),
                args.power, args.seed)
        write_msr_csv(str(out), gs, rates, schemes)

    elif args.task == "nu":
        from diffsg_tpu.data.generators import nu_coordinates_gen, noma_uav_gen

        if args.native:
            from diffsg_tpu.data.native import nu_oracle_native

            rng = np.random.default_rng(args.seed)
            qs = nu_coordinates_gen(rng, args.samples,
                                    width=int(args.width),
                                    height=int(args.height))
            sol = nu_oracle_native(qs, P_sum=args.power,
                                   grid_step=args.grid_step,
                                   width=args.width, height=args.height,
                                   legacy_sinr=args.legacy_sinr)
            data = np.concatenate([qs, sol], axis=1)
        else:
            data = noma_uav_gen(args.samples, args.power, args.seed,
                                width=int(args.width),
                                height=int(args.height),
                                grid_step=args.grid_step,
                                legacy_sinr=args.legacy_sinr)
        np.savetxt(out, data, delimiter=",")

    elif args.task == "nu-budget":
        from diffsg_tpu.data.generators import nu_coordinates_gen
        from diffsg_tpu.data.native import nu_oracle_native

        grid = np.arange(args.budget_min, args.budget_max + 1e-9,
                         args.budget_step)
        grid = np.array([b for b in grid
                         if not any(abs(b - e) < 1e-9
                                    for e in args.exclude_budgets)])
        rng = np.random.default_rng(args.seed)
        qs = nu_coordinates_gen(rng, args.samples)
        budgets = rng.choice(grid, size=args.samples)
        data = np.zeros((args.samples, 13))
        data[:, :6] = qs
        data[:, 12] = budgets
        for b in grid:  # one batched native solve per budget value
            idx = np.nonzero(budgets == b)[0]
            if idx.size:
                data[idx, 6:12] = nu_oracle_native(
                    qs[idx], P_sum=float(b), grid_step=args.grid_step)
                print(f"  budget {b:5.1f} mW: {idx.size} samples solved "
                      f"({time.time() - t0:.0f}s elapsed)", flush=True)
        np.savetxt(out, data, delimiter=",")

    elif args.task == "nu-geo":
        from diffsg_tpu.data.generators import nu_coordinates_gen
        from diffsg_tpu.data.native import nu_oracle_native

        def _grid(lo, hi, step, excl):
            g = np.arange(lo, hi + 1e-9, step)
            return np.array([v for v in g
                             if not any(abs(v - e) < 1e-9 for e in excl)])

        geoms = _grid(args.geom_min, args.geom_max, args.geom_step,
                      args.exclude_geoms)
        budgets_grid = _grid(args.budget_min, args.budget_max,
                             args.budget_step, args.exclude_budgets)
        rng = np.random.default_rng(args.seed)
        Ws = rng.choice(geoms, size=args.samples)
        Hs = rng.choice(geoms, size=args.samples)
        all_geoms = geoms
        if args.focus_frac > 0:
            if args.focus_geom_step is not None:
                focus = _grid(args.focus_geom_min, args.focus_geom_max,
                              args.focus_geom_step, args.exclude_geoms)
            else:
                focus = geoms[(geoms >= args.focus_geom_min - 1e-9)
                              & (geoms <= args.focus_geom_max + 1e-9)]
            sel = rng.random(args.samples) < args.focus_frac
            Ws[sel] = rng.choice(focus, size=int(sel.sum()))
            Hs[sel] = rng.choice(focus, size=int(sel.sum()))
            all_geoms = np.unique(np.concatenate([geoms, focus]))
        Ps = rng.choice(budgets_grid, size=args.samples)
        data = np.zeros((args.samples, 15))
        data[:, 12], data[:, 13], data[:, 14] = Ps, Ws, Hs
        n_done = 0
        for w in all_geoms:  # coords need the geometry; one gen+solve per (W,H)
            for h in all_geoms:
                gsel = np.nonzero((Ws == w) & (Hs == h))[0]
                if not gsel.size:
                    continue
                qs = nu_coordinates_gen(rng, gsel.size, width=int(w),
                                        height=int(h))
                data[gsel, :6] = qs
                for b in budgets_grid:
                    idx = gsel[Ps[gsel] == b]
                    if idx.size:
                        data[idx, 6:12] = nu_oracle_native(
                            data[idx, :6], P_sum=float(b),
                            grid_step=args.grid_step, width=float(w),
                            height=float(h))
                n_done += gsel.size
            print(f"  W={w:5.0f}: {n_done}/{args.samples} solved "
                  f"({time.time() - t0:.0f}s elapsed)", flush=True)
        np.savetxt(out, data, delimiter=",")

    print(f"wrote {out} ({args.samples} samples) in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()
