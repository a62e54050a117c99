"""Hybrid-oracle data engine: refine NU training labels in place.

The round-3 hybrid result (docs/RESULTS.md) shows 50 projected-gradient
steps lift NU solutions ~1.64x above the oracle grid labels — but that
serving mode needs objective access at request time.  This tool moves the
refinement to DATA time instead: every training label (grid-search output,
``noma_uav_gen.py``-style) is replaced by the best of {label seed, N random
feasible starts} after ``--iters`` steps of ``ops.refine.projected_refine``
on the exact NOMA-SIC rate.  A model retrained on the refined CSVs then
emits near-refined-optimal solutions in a PURE single draw — no objective,
no gradients, no extra latency at serve time.

Reads the NU training sources (13-col multi-budget CSV from
``tools/make_datasets.py nu-budget``; 12-col reference-format in-dist CSV;
15-col mixed-geometry CSV from ``nu-geo`` — per-row W/H columns drive a
per-row feasibility projection and preconditioner) and writes refined
copies in the identical format (rate column updated, all other columns
byte-identical), so ``tools/train_nu_budget.py`` / ``train_nu_geo.py``
consume them unchanged.

Expert iteration (generation 2+, ``--model-seed CKPT``): the remaining gap
between the retrained model's pure draw and the refined-label ceiling is a
FITTING gap — multistart refinement picks whichever near-tied basin wins by
a hair, so the label field jumps between basins on near-identical
conditions and the continuous network cannot represent it.  With
``--model-seed`` the previous generation's own single draw is refined and
becomes the PREFERRED label whenever its rate is within ``--tie-eps`` of
the multistart best: rows keep the basin the network already represents
smoothly unless jumping is worth more than the tolerance.  This trades an
eps of label ceiling for a representable (self-consistent) solution field —
the classic expert-iteration move, with the projected-gradient refiner as
the expert.

Usage:
  python tools/refine_labels.py --iters 300 --starts 16 \
      --budget-in datasets/3u_budget9-36_10000samples.csv \
      --budget-out datasets/3u_budget9-36_10000samples_refined.csv \
      --indist-in /root/reference/datasets/3u_18mW_10000samples.csv \
      --indist-out datasets/3u_18mW_10000samples_refined.csv \
      [--model-seed ckpts/ddpm_nu_budget_refined --tie-eps 0.004]
"""

import argparse
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def refine_rows(coords, Y0, P_row, iters, starts, seed, width, height,
                model_Y0=None, tie_eps=0.0):
    """Refine labels ``Y0`` (B,2+K) for users ``coords`` (B,2K) under
    per-row budgets ``P_row`` (B,).  ``width``/``height`` are scalars or
    per-row (B,) arrays (mixed-geometry 15-col CSVs).  ``model_Y0``
    (B,2+K), if given, is a feasible draw from the previous-generation
    model; its refined result is preferred over the multistart best
    whenever within ``tie_eps`` (relative) of it.  Returns
    (Y_best, rate_best, frac_model) where ``frac_model`` is the fraction
    of rows labeled from the model's basin (0.0 when ``model_Y0`` is
    None)."""
    import jax
    import jax.numpy as jnp

    from diffsg_tpu.ops.decoders import msr_simplex_project
    from diffsg_tpu.ops.objectives import nu_rate
    from diffsg_tpu.ops.refine import projected_refine

    coords = jnp.asarray(coords, jnp.float32)
    P_col = jnp.asarray(P_row, jnp.float32)[:, None]
    B, K = Y0.shape[0], Y0.shape[1] - 2
    W = jnp.broadcast_to(jnp.asarray(width, jnp.float32), (B,))
    H = jnp.broadcast_to(jnp.asarray(height, jnp.float32), (B,))
    WH = jnp.stack([W, H], axis=1)

    obj = lambda Y: nu_rate(Y, coords)

    def proj(Y):
        xy = jnp.clip(Y[:, :2], 0.0, WH)
        P = msr_simplex_project(Y[:, 2:], P_col)
        return jnp.concatenate([xy, P], axis=1)

    precond = jnp.concatenate([WH * 0.02,
                               jnp.repeat(P_col * 0.02, K, axis=1)], axis=1)

    refine = jax.jit(lambda Y: projected_refine(
        obj, proj, Y, iters, 1.0, higher_is_better=True, precond=precond))

    def rand_start(key):
        kxy, kp = jax.random.split(key)
        xy = jax.random.uniform(kxy, (B, 2), jnp.float32) * WH
        P = jax.random.uniform(kp, (B, K), jnp.float32)
        return proj(jnp.concatenate([xy, P], axis=1))

    best = refine(jnp.asarray(Y0, jnp.float32))
    best_r = obj(best)
    key = jax.random.PRNGKey(seed)
    for i in range(starts):
        Yi = refine(rand_start(jax.random.fold_in(key, i)))
        ri = obj(Yi)
        take = ri > best_r
        best = jnp.where(take[:, None], Yi, best)
        best_r = jnp.where(take, ri, best_r)
    frac_model = 0.0
    if model_Y0 is not None:
        Ym = refine(proj(jnp.asarray(model_Y0, jnp.float32)))
        rm = obj(Ym)
        # keep the network's own (representable) basin unless the
        # multistart best beats it by more than the tolerance
        take_m = rm >= (1.0 - tie_eps) * jnp.maximum(rm, best_r)
        best = jnp.where(take_m[:, None], Ym, best)
        best_r = jnp.where(take_m, rm, best_r)
        frac_model = float(jnp.mean(take_m.astype(jnp.float32)))
    return (np.asarray(best, np.float64), np.asarray(best_r, np.float64),
            frac_model)


def model_draws(coords, P_row, model_ckpt, omega, width, height, seed=0):
    """Single decoded draw of the previous-generation conditioned model for
    every raw row.  The model's task is read from the checkpoint metadata:
    ``nu_budget`` samples per budget group (its per-row-feasibility decode
    needs a scalar ``P_sum`` per call; conditions built exactly as
    ``tools/train_nu_budget.py`` normalizes them), ``nu_geo`` samples every
    row in ONE call (its decode is strictly per-row; ``width``/``height``
    may be per-row arrays).  Returns feasible physical solutions (B, 2+K)."""
    from diffsg_tpu.tasks import TASKS
    from diffsg_tpu.tasks.base import merge_ckpt_config, sample_solutions
    from diffsg_tpu.utils import load_checkpoint

    ck = load_checkpoint(model_ckpt)
    task_name = (ck.get("metadata") or {}).get("task", "nu_budget")
    task = TASKS[task_name]
    p_ref, w_ref, h_ref = 18.0, 400.0, 400.0
    B = coords.shape[0]
    P = np.asarray(P_row, float)
    W = np.broadcast_to(np.asarray(width, float), (B,))
    H = np.broadcast_to(np.asarray(height, float), (B,))
    X = coords.astype(float).copy()
    X[:, 0::2] /= W[:, None]
    X[:, 1::2] /= H[:, None]

    if task_name == "nu_geo":
        X = np.concatenate([X, P[:, None] / p_ref, W[:, None] / w_ref,
                            H[:, None] / h_ref], axis=1)
        config = {"K": 3, "p_ref": p_ref, "w_ref": w_ref, "h_ref": h_ref}
        merge_ckpt_config(config, ck.get("metadata"))
        dec, _ = sample_solutions(task, ck["params"], ck["sched"], X,
                                  config, omega=omega, batch_size=4096,
                                  seed=seed)
        return np.asarray(dec, np.float64)

    assert task_name == "nu_budget", f"unsupported model-seed task {task_name}"
    assert np.ptp(W) == 0 and np.ptp(H) == 0, (
        "a nu_budget model seed needs a fixed geometry; use a nu_geo "
        "checkpoint for mixed-geometry (15-col) inputs")
    X = np.concatenate([X, P[:, None] / p_ref], axis=1)
    out = np.empty((B, 5), np.float64)
    for p in np.unique(P):
        idx = np.nonzero(P == p)[0]
        config = {"width": float(W[0]), "height": float(H[0]), "K": 3,
                  "P_sum": float(p), "p_ref": p_ref}
        merge_ckpt_config(config, ck.get("metadata"))
        dec, _ = sample_solutions(task, ck["params"], ck["sched"], X[idx],
                                  config, omega=omega, batch_size=4096,
                                  seed=seed)
        out[idx] = np.asarray(dec, np.float64)
    return out


def process(path_in, path_out, iters, starts, seed, width, height, P_fixed,
            model_ckpt=None, model_omega=0.5, tie_eps=0.004):
    import pandas as pd

    raw = np.array(pd.read_csv(path_in, header=None))
    ncol = raw.shape[1]
    assert ncol in (12, 13, 15), f"unexpected column count {ncol} in {path_in}"
    coords, Y0 = raw[:, :6], raw[:, 6:11]
    if ncol == 12:
        assert P_fixed is not None, (
            f"{path_in} has no budget column (12-col reference format); "
            "pass its fixed budget via --p-indist")
        P_row = np.full(raw.shape[0], float(P_fixed))
    else:
        P_row = raw[:, 12]
    if ncol == 15:  # mixed-geometry (nu-geo) format: per-row W/H columns
        width, height = raw[:, 13], raw[:, 14]
    old_rate = raw[:, 11]

    m_Y0 = (None if model_ckpt is None else
            model_draws(coords, P_row, model_ckpt, model_omega, width,
                        height, seed=seed))
    Y, R, frac_model = refine_rows(coords, Y0, P_row, iters, starts, seed,
                                   width, height, model_Y0=m_Y0,
                                   tie_eps=tie_eps)
    out = raw.copy()
    out[:, 6:11] = Y
    out[:, 11] = R
    np.savetxt(path_out, out, delimiter=",", fmt="%.18e")
    # Broken source labels (all-zero row / NaN rate from a degenerate user
    # triangle, pre-centroid-fallback oracles) are "repaired": the refiner
    # rebuilt them from random starts.  Keep them out of the ratio stats.
    ok = np.isfinite(old_rate) & (old_rate > 0)
    ratio = R[ok] / old_rate[ok]
    return {"file": str(path_out), "rows": int(raw.shape[0]),
            "mean_ratio": float(np.mean(ratio)),
            "min_ratio": float(np.min(ratio)),
            "frac_improved": float(np.mean(R[ok] > old_rate[ok] + 1e-12)),
            "repaired_rows": int((~ok).sum()),
            "frac_model_basin": frac_model}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--starts", type=int, default=16,
                    help="random multi-starts per row (label seed always on)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--budget-in",
                    default="datasets/3u_budget9-36_10000samples.csv")
    ap.add_argument("--budget-out",
                    default="datasets/3u_budget9-36_10000samples_refined.csv")
    ap.add_argument("--indist-in",
                    default="/root/reference/datasets/3u_18mW_10000samples.csv")
    ap.add_argument("--indist-out",
                    default="datasets/3u_18mW_10000samples_refined.csv")
    ap.add_argument("--skip-indist", action="store_true",
                    help="refine only --budget-in (e.g. the 15-col "
                         "mixed-geometry CSV, which has no companion "
                         "fixed-config file)")
    ap.add_argument("--p-indist", type=float, default=18.0)
    ap.add_argument("--model-seed", default=None,
                    help="previous-generation nu_budget ckpt dir; its "
                         "refined single draw becomes the preferred label "
                         "within --tie-eps of the multistart best "
                         "(expert iteration)")
    ap.add_argument("--model-omega", type=float, default=0.5)
    ap.add_argument("--tie-eps", type=float, default=0.004)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_default_matmul_precision", "highest")

    pairs = [(args.budget_in, args.budget_out, None)]
    if not args.skip_indist:
        pairs.append((args.indist_in, args.indist_out, args.p_indist))
    for src, dst, pfix in pairs:
        stats = process(src, dst, args.iters, args.starts, args.seed,
                        400.0, 400.0, pfix, model_ckpt=args.model_seed,
                        model_omega=args.model_omega, tie_eps=args.tie_eps)
        print(json.dumps(stats))


if __name__ == "__main__":
    main()
