#!/bin/bash
# Round-5 dataset regeneration: every gitignored CSV the round-5 trainings
# need (datasets/ does not survive rounds).  Serial on purpose — one CPU
# core; see CLAUDE.md.  ~2h total, dominated by the three oracle grids.
#
# The focus CSV recipe reconstructs the round-4 "5x5 widths x heights in
# 320-480 m x 6 budgets" cell (docs/RESULTS.md densification section):
# focus-frac 1 with focus step 40 and NO geometry exclusion puts 400 m ON
# the focus grid (320,360,400,440,480 = 5 values); budget-step 5 gives
# budgets 9,14,19,24,29,34 (6 values) so the eval budgets 18/30 stay
# unseen and every eval (P,W,H) combination remains unseen.
set -ex
cd "$(dirname "$0")/.."

python - <<'EOF'   # quick known sets (CO train, 80c evals, geo evals)
from tools.make_datasets import ensure_datasets
ensure_datasets()
EOF

python tools/make_datasets.py nu-budget \
    --out datasets/3u_budget9-36_10000samples.csv

python tools/make_datasets.py nu --samples 4000 --seed 7 \
    --out datasets/3u_18mW_fresh4000.csv
python tools/nu12_to_geo15.py --inp datasets/3u_18mW_fresh4000.csv \
    --power 18 --out datasets/3u_18mW400_fresh4000_geo.csv

python tools/make_datasets.py nu --samples 11000 --seed 8 \
    --out datasets/3u_18mW_fresh11000_s8.csv
python tools/nu12_to_geo15.py --inp datasets/3u_18mW_fresh11000_s8.csv \
    --power 18 --out datasets/3u_18mW400_fresh11000_s8_geo.csv

python tools/make_datasets.py nu-geo \
    --out datasets/3u_geo200-600_10000samples.csv

python tools/make_datasets.py nu-geo --samples 15000 \
    --focus-frac 1.0 --focus-geom-step 40 --exclude-geoms \
    --budget-step 5 \
    --out datasets/3u_geo_focus320-480_15000samples.csv

echo REGEN_ALL_DONE
