"""Benchmark: solutions/sec/chip at 100 denoise steps (north-star metric).

Flagship config per BASELINE.json: the MSR-3c classifier-free UNet1D
(1.54M params) driven by the CFG reverse sampler — each denoise step is one
folded 2B-row forward (cond+uncond).  Uses the T=100-trained checkpoint
(ckpts/ddpm_msr_3c_T100, less ratio 0.9957 at these exact 100 denoise
steps) when present, falling back to deterministic random weights
(throughput does not depend on weight values; the reference's MSR ckpt is
a missing blob).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "solutions/s", "vs_baseline": N/10000}
vs_baseline is measured against the north-star target of 10k solutions/s on
one v5e chip at T=100 (BASELINE.md; the torch reference measures ~230
solutions/s on CPU at T=20 for this model, i.e. ~46/s at T=100).
Extra fields: "mfu" (analytic matmul FLOPs/solution over the v5e bf16 peak),
"per_task" (NU/CO throughput at their reference T=20 protocol when their
checkpoints are present), "production" (the serving headline: DDIM-3 +
nu_direct + refine-0, bf16, batch at the measured knee — pins the ~6M sol/s
few-step regime against round-over-round regressions).

Flags (driver uses none of them):
  --mesh dp=N[,tp=M]  shard the batch over an N-way dp mesh
                      (parallel/mesh.py); requires N*M visible devices —
                      use XLA_FLAGS=--xla_force_host_platform_device_count
                      with --cpu to validate without hardware.
  --cpu               pin the CPU platform (virtual-mesh validation).
  --batch/--T/--backends/--no-per-task   size overrides for smoke runs.
"""

import argparse
import json
import time

import numpy as np

TARGET_SOLUTIONS_PER_SEC = 10_000.0
T = 100
OMEGA = 500.0
# Public TPU v5e (v5 lite) peak: 197 TFLOP/s bf16 per chip.
V5E_BF16_PEAK_FLOPS = 197e12


def analytic_flops_per_solution(params, n_steps: int) -> float:
    """Matmul FLOPs (2/MAC) per decoded solution at large batch.

    Each denoise step is one folded 2-row forward per solution (CFG pair).
    Kernels named ``time_emb`` (the TimeEmbedding MLP and the per-block time
    projections) run at batch 1 per step — the batch-constant time trick in
    diffusion/ddpm.py — so they amortize to ~0 per solution and are excluded.
    LayerNorm/softmax/elementwise FLOPs are ignored (<<1% here).
    """
    import jax

    per_row = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        names = [getattr(p, "key", str(p)) for p in path]
        if names[-1] == "kernel" and leaf.ndim == 2:
            if any("time_emb" in n for n in names[:-1]):
                continue
            per_row += 2 * leaf.shape[0] * leaf.shape[1]
    return float(n_steps * 2 * per_row)


def _load_flagship(jnp, jax, skip_ckpt=False):
    import pathlib

    from diffsg_tpu.models import unet_msr
    from diffsg_tpu.diffusion import cosine_schedule
    from diffsg_tpu.train import torch_style_init

    model = unet_msr(3)
    ckpt = pathlib.Path(__file__).parent / "ckpts" / "ddpm_msr_3c_T100"
    # --T overrides the schedule, so trained T=100 params would run under a
    # schedule they were never trained for; use random weights instead.
    if ckpt.exists() and not skip_ckpt:
        from diffsg_tpu.utils import load_checkpoint

        ck = load_checkpoint(str(ckpt))
        return model, ck["params"], ck["sched"], "trained(T100, less_ratio 0.9957)"
    key = jax.random.PRNGKey(0)
    variables = model.init(key, jnp.zeros((1, 3)), jnp.zeros((1,)),
                           jnp.zeros((1, 3)), jnp.ones((1, 1)))
    params = torch_style_init(variables["params"], key)
    return model, params, cosine_schedule(T), "random"


def _measure_sampler(jax, jnp, apply_fn, params, sched, cond_dim, data_dim,
                     omega, B, mesh=None, compute_dtype=None, reps=5,
                     skip_uncond=False):
    from diffsg_tpu.diffusion import cfg_sample

    kw = {"compute_dtype": compute_dtype} if compute_dtype is not None else {}

    @jax.jit
    def run(cond, k):
        y0, _ = cfg_sample(apply_fn, params, sched, cond, omega, data_dim,
                           key=k, skip_uncond=skip_uncond, **kw)
        return y0

    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.uniform(0, 1, (B, cond_dim)), jnp.float32)
    if mesh is not None:
        from diffsg_tpu.parallel import shard_batch

        cond = shard_batch(cond, mesh)
    run(cond, jax.random.PRNGKey(1)).block_until_ready()  # compile+warmup
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        run(cond, jax.random.PRNGKey(2 + i)).block_until_ready()
        times.append(time.perf_counter() - t0)
    return B / float(np.median(times))


def _per_task_rows(jax, jnp, mesh):
    """NU/CO throughput at the reference protocol (their trained ckpts,
    T=20, omega=500), batch 32768 — one row per task when the ckpt exists.
    ``nu_omega0`` measures the omega=0 fast path (skip the uncond half of
    the folded CFG forward; several serving configs — multi-NU, nu_budget —
    sit at omega<=0.06) on the same NU net for a like-for-like ratio."""
    import pathlib

    from diffsg_tpu.tasks import TASKS
    from diffsg_tpu.utils import load_checkpoint

    # fallback configs for round-1 checkpoints saved before dataset_config
    # was recorded in metadata (values = the shipped training datasets)
    fallback_cfg = {"co": {"node_num": 3}}
    rows = {}
    for row_key, task_name, ckpt_name, B, omega in (
            ("nu", "nu", "ddpm_nu_3u_best", 32768, None),
            ("nu_omega0", "nu", "ddpm_nu_3u_best", 32768, 0.0),
            ("co", "co", "ddpm_co", 32768, None)):
        ckpt = pathlib.Path(__file__).parent / "ckpts" / ckpt_name
        if not ckpt.exists():
            continue
        ck = load_checkpoint(str(ckpt))
        cfg = dict(ck["metadata"].get("dataset_config")
                   or fallback_cfg.get(task_name) or {})
        if not cfg:
            continue
        task = TASKS[task_name]
        model = task.build_model(cfg)
        p_bf16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), ck["params"])

        def apply_fn(p, y, t, c, m, _model=model):
            return _model.apply({"params": p}, y, t, c, m)

        sps = _measure_sampler(
            jax, jnp, apply_fn, p_bf16, ck["sched"], task.cond_dim(cfg),
            task.data_dim(cfg),
            task.default_omega if omega is None else omega, B, mesh=mesh,
            compute_dtype=jnp.bfloat16, reps=3, skip_uncond=(omega == 0.0))
        rows[row_key] = {
            "solutions_per_sec": round(sps, 1),
            "T": int(ck["sched"].T),
            "batch_size": B,
        }
    return rows


def _production_row(jax, jnp, mesh, B=524288):
    """Serving-headline config (docs/RESULTS.md "DDIM respacing"): the NU
    aug32-centered serving checkpoint (nu_direct protocol, omega 0.125) at
    DDIM-3, bf16, refine-0, batch at the measured knee (~512k rows).
    Quality at these exact settings: 0.99943 in-dist / 0.99625 OOD
    (tools/fewstep.py).  This row pins the ~6M sol/s production regime so
    round-over-round regressions are caught by the driver, not just by
    RESULTS.md prose."""
    import pathlib

    from diffsg_tpu.diffusion import ddim_sample
    from diffsg_tpu.tasks import TASKS
    from diffsg_tpu.utils import load_checkpoint

    ckpt = pathlib.Path(__file__).parent / "ckpts" / "ddpm_nu_3u_aug32_s8c"
    if not ckpt.exists():
        return None
    ck = load_checkpoint(str(ckpt))
    cfg = dict(ck["metadata"].get("dataset_config") or {})
    task = TASKS["nu_direct"]
    model = task.build_model(cfg)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), ck["params"])
    omega, n_steps = 0.125, 3

    def apply_fn(p, y, t, c, m):
        return model.apply({"params": p}, y, t, c, m)

    @jax.jit
    def run(cond, k):
        y0, _ = ddim_sample(apply_fn, params, ck["sched"], cond, omega,
                            task.data_dim(cfg), key=k, n_steps=n_steps,
                            parameterization=cfg.get("parameterization",
                                                     "eps"))
        return y0

    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.uniform(0, 1, (B, task.cond_dim(cfg))),
                       jnp.bfloat16)
    if mesh is not None:
        from diffsg_tpu.parallel import shard_batch

        cond = shard_batch(cond, mesh)
    run(cond, jax.random.PRNGKey(1)).block_until_ready()  # compile+warmup
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        run(cond, jax.random.PRNGKey(2 + i)).block_until_ready()
        times.append(time.perf_counter() - t0)
    return {
        "config": "nu_direct ddim3 bf16 omega0.125 refine0",
        "ckpt": "ddpm_nu_3u_aug32_s8c",
        "solutions_per_sec": round(B / float(np.median(times)), 1),
        "steps": n_steps,
        "batch_size": B,
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", default=None,
                    help="e.g. dp=8 or dp=4,tp=2: shard the bench batch")
    ap.add_argument("--cpu", action="store_true",
                    help="pin the CPU platform (virtual-mesh validation)")
    ap.add_argument("--batch", type=int, default=None,
                    help="override the batch-size sweep with one size")
    ap.add_argument("--T", type=int, default=None, dest="t_override",
                    help="override denoise steps (random weights only)")
    # pallas (per-block) and mega (whole-net) are measured, documented
    # losers on this workload (docs/RESULTS.md "Pallas megakernel") — they
    # stay available for regression probes but out of the default run.
    ap.add_argument("--backends", default="xla,xla_bf16")
    ap.add_argument("--no-per-task", action="store_true")
    ap.add_argument("--no-production", action="store_true")
    ap.add_argument("--production-batch", type=int, default=524288,
                    help="batch for the production (DDIM-3 serving) row; "
                         "default = the measured throughput knee")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    import jax.numpy as jnp

    from diffsg_tpu.models.unet1d_pallas import unet_apply_fn

    mesh = None
    mesh_desc = None
    if args.mesh:
        from diffsg_tpu.parallel import make_mesh, shard_params

        spec = dict(kv.split("=") for kv in args.mesh.split(","))
        dp = int(spec.get("dp", 1))
        tp = int(spec.get("tp", 1))
        n = dp * tp
        if len(jax.devices()) < n:
            raise SystemExit(
                f"--mesh {args.mesh} needs {n} devices; have "
                f"{len(jax.devices())}. For validation without hardware: "
                f"--cpu with XLA_FLAGS=--xla_force_host_platform_device_count={n}")
        mesh = make_mesh(n, tp=tp)
        mesh_desc = f"dp={dp},tp={tp}"

    model, params, sched, weights = _load_flagship(
        jnp, jax, skip_ckpt=bool(args.t_override))
    if args.t_override:
        from diffsg_tpu.diffusion import cosine_schedule

        sched = cosine_schedule(args.t_override)
        weights = "random(T override)"
    n_steps = sched.T
    if mesh is not None:
        from diffsg_tpu.parallel import shard_params

        params = shard_params(params, mesh)

    def measure(backend, B, block_rows=1024):
        if backend in ("xla_bf16", "xla_pair_bf16"):
            # quality-verified fast path: params + activations bf16, CFG
            # combine and posterior math f32 (T100 ckpt: less ratio 0.9957
            # bf16 vs 0.9960 f32 on the full MSR-3c test split).
            # xla_pair = shared-prefix CFG-pair forward (VERDICT r4 item 6).
            apply_fn = unet_apply_fn(
                model,
                backend="xla" if backend == "xla_bf16" else "xla_pair")
            p_run = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
            dtype = jnp.bfloat16
        else:
            kw_b = {"block_rows": block_rows} if backend == "pallas" else {}
            if backend == "mega":
                kw_b = {"tile_rows": 1024}
            apply_fn = unet_apply_fn(model, backend=backend, **kw_b)
            p_run = params
            dtype = None
        return _measure_sampler(jax, jnp, apply_fn, p_run, sched, 3, 3,
                                OMEGA, B, mesh=mesh, compute_dtype=dtype)

    import sys
    import traceback

    batches = (args.batch,) if args.batch else (8192, 32768)
    results = {}
    errors = []
    for backend in args.backends.split(","):
        best = 0.0
        for B in batches:
            try:
                sps = measure(backend, B)
            except Exception as e:
                errors.append(f"{backend}/B={B}: {type(e).__name__}: {e}")
                traceback.print_exc(file=sys.stderr)
                continue
            if sps > best:
                best, best_B = sps, B
        if best > 0:
            results[backend] = (best, best_B)

    flops_per_solution = analytic_flops_per_solution(params, n_steps)
    # Sanity guard: a timing that implies >peak utilization is a corrupted
    # measurement (observed once under tunnel contention: a 0.4 ms reading
    # for a 100-step 32k-row chain -> "MFU 95"), never a real result.
    n_dev_guard = int(np.prod(list(mesh.shape.values()))) if mesh else 1
    for b in list(results):
        implied_mfu = (results[b][0] * flops_per_solution
                       / (V5E_BF16_PEAK_FLOPS * n_dev_guard))
        if implied_mfu > 1.0:
            errors.append(f"{b}: discarded impossible timing "
                          f"(implied MFU {implied_mfu:.2f})")
            del results[b]
    if not results:
        raise RuntimeError("all benchmark configs failed:\n" + "\n".join(errors))
    for err in errors:
        print(f"# skipped: {err}", file=sys.stderr)
    backend = max(results, key=lambda b: results[b][0])
    best, best_B = results[backend]
    n_devices = int(np.prod(list(mesh.shape.values()))) if mesh else 1
    out = {
        "metric": f"msr3c_solutions_per_sec_chip_T{n_steps}",
        "value": round(best, 1),
        "unit": "solutions/s",
        "vs_baseline": round(best / TARGET_SOLUTIONS_PER_SEC, 3),
        "batch_size": best_B,
        "backend": backend,
        "all_backends": {b: round(v[0], 1) for b, v in results.items()},
        "omega": OMEGA,
        "weights": weights,
        "device": str(jax.devices()[0]),
        "flops_per_solution": round(flops_per_solution / 1e9, 4),  # GFLOP
        # aggregate throughput over per-chip peak x device count: stays a
        # true per-chip utilization number under --mesh
        "mfu": round(best * flops_per_solution
                     / (V5E_BF16_PEAK_FLOPS * n_devices), 4),
        "mfu_peak_tflops_bf16": V5E_BF16_PEAK_FLOPS / 1e12,
    }
    if mesh_desc:
        out["mesh"] = mesh_desc
        out["n_devices"] = n_devices
    if not args.no_per_task:
        try:
            out["per_task"] = _per_task_rows(jax, jnp, mesh)
        except Exception as e:  # per-task rows must never break the contract
            print(f"# per-task rows skipped: {type(e).__name__}: {e}",
                  file=sys.stderr)
    if not args.no_production:
        try:
            row = _production_row(jax, jnp, mesh, B=args.production_batch)
            if row is not None:
                out["production"] = row
        except Exception as e:  # same contract guarantee as per_task
            print(f"# production row skipped: {type(e).__name__}: {e}",
                  file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
