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
"""

import json
import time

import numpy as np

TARGET_SOLUTIONS_PER_SEC = 10_000.0
T = 100
OMEGA = 500.0


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from diffsg_tpu.models import unet_msr
    from diffsg_tpu.diffusion import cfg_sample, cosine_schedule
    from diffsg_tpu.train import torch_style_init

    from diffsg_tpu.models.unet1d_pallas import unet_apply_fn

    import pathlib

    model = unet_msr(3)
    ckpt = pathlib.Path(__file__).parent / "ckpts" / "ddpm_msr_3c_T100"
    if ckpt.exists():
        from diffsg_tpu.utils import load_checkpoint

        ck = load_checkpoint(str(ckpt))
        params, sched = ck["params"], ck["sched"]
        weights = "trained(T100, less_ratio 0.9957)"
    else:
        key = jax.random.PRNGKey(0)
        variables = model.init(key, jnp.zeros((1, 3)), jnp.zeros((1,)),
                               jnp.zeros((1, 3)), jnp.ones((1, 1)))
        params = torch_style_init(variables["params"], key)
        sched = cosine_schedule(T)
        weights = "random"

    def measure(backend, B, block_rows=1024):
        if backend == "xla_bf16":
            # quality-verified fast path: params + activations bf16, CFG
            # combine and posterior math f32 (T100 ckpt: less ratio 0.9957
            # bf16 vs 0.9960 f32 on the full MSR-3c test split)
            apply_fn = unet_apply_fn(model, backend="xla")
            p_run = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
            kw = {"compute_dtype": jnp.bfloat16}
        else:
            kw_b = {"block_rows": block_rows} if backend == "pallas" else {}
            apply_fn = unet_apply_fn(model, backend=backend, **kw_b)
            p_run = params
            kw = {}

        @jax.jit
        def run(cond, k):
            y0, _ = cfg_sample(apply_fn, p_run, sched, cond, OMEGA, 3, key=k,
                               **kw)
            return y0

        rng = np.random.default_rng(0)
        cond = jnp.asarray(rng.uniform(0, 1, (B, 3)), jnp.float32)
        run(cond, jax.random.PRNGKey(1)).block_until_ready()  # compile+warmup
        times = []
        for i in range(5):
            t0 = time.perf_counter()
            run(cond, jax.random.PRNGKey(2 + i)).block_until_ready()
            times.append(time.perf_counter() - t0)
        return B / float(np.median(times))

    import sys
    import traceback

    results = {}
    errors = []
    for backend in ("xla", "xla_bf16", "pallas"):
        best = 0.0
        for B in (8192, 32768):
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

    if not results:
        raise RuntimeError("all benchmark configs failed:\n" + "\n".join(errors))
    for err in errors:
        print(f"# skipped: {err}", file=sys.stderr)
    backend = max(results, key=lambda b: results[b][0])
    best, best_B = results[backend]
    print(json.dumps({
        "metric": f"msr3c_solutions_per_sec_chip_T{T}",
        "value": round(best, 1),
        "unit": "solutions/s",
        "vs_baseline": round(best / TARGET_SOLUTIONS_PER_SEC, 3),
        "batch_size": best_B,
        "backend": backend,
        "all_backends": {b: round(v[0], 1) for b, v in results.items()},
        "omega": OMEGA,
        "weights": weights,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
