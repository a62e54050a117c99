"""Convert a 12-col NU CSV (``[q x 6, L x 2, P x 3, rate]``, fixed-budget
generator output, reference layout ``noma_uav_gen.py:64-116``) into the
15-col mixed-geometry layout ``train_nu_geo.py`` consumes, by appending the
generating ``[P_sum, W, H]`` as trailing columns.

Use case: fold FRESH fixed-config oracle rows (e.g. ``make_datasets.py nu
--power 18 --samples N --seed S``) into a universal nu_geo training mixture
via ``--geo-dataset`` — new information at the reference cell, as opposed to
``--ref-repeat`` tiling of the same 7k reference rows (measured flat,
docs/RESULTS.md round-4 densification section).

Usage:
  python tools/nu12_to_geo15.py --inp datasets/3u_18mW_fresh4000.csv \
      --power 18 --width 400 --height 400 \
      --out datasets/3u_18mW400_fresh4000_geo.csv
"""

import argparse

import numpy as np
import pandas as pd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--inp", required=True)
    ap.add_argument("--power", type=float, required=True)
    ap.add_argument("--width", type=float, default=400.0)
    ap.add_argument("--height", type=float, default=400.0)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    raw = np.array(pd.read_csv(args.inp, header=None))
    assert raw.shape[1] == 12, f"expected 12 cols, got {raw.shape[1]}"
    # The claimed config must match the CSV's generating config — a wrong
    # --power/--width/--height silently mislabels every row's conditioning
    # AND its per-row normalization downstream in normalize_rows_geo.
    x_max, y_max = raw[:, 0:6:2].max(), raw[:, 1:6:2].max()
    p_max = raw[:, 8:11].sum(axis=1).max()
    assert x_max <= args.width * 1.001, \
        f"user x-coords reach {x_max:.1f} > claimed width {args.width}"
    assert y_max <= args.height * 1.001, \
        f"user y-coords reach {y_max:.1f} > claimed height {args.height}"
    assert p_max <= args.power * 1.001, \
        f"row power sums reach {p_max:.3f} > claimed budget {args.power}"
    tail = np.tile([args.power, args.width, args.height], (raw.shape[0], 1))
    out = np.concatenate([raw, tail], axis=1)
    pd.DataFrame(out).to_csv(args.out, header=False, index=False)
    print(f"wrote {args.out} ({out.shape[0]} rows, 15 cols)")


if __name__ == "__main__":
    main()
