"""bench.py contract tests: one JSON line; --mesh validates on virtual devices.

Runs bench.py in subprocesses (it owns jax backend configuration) with tiny
sizes — these are smoke tests of the CLI contract, not performance runs.
"""

import json
import os
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


def _run_bench(extra, n_virtual=8):
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_virtual}")
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--cpu", "--batch", "64",
         "--T", "4", "--backends", "xla", "--no-per-task", *extra],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = proc.stdout.strip().splitlines()[-1]
    return json.loads(line)


@pytest.mark.slow
def test_bench_single_device_contract():
    out = _run_bench(["--no-production"])
    assert out["unit"] == "solutions/s"
    assert out["value"] > 0
    assert 0 <= out["mfu"] < 1
    assert out["flops_per_solution"] > 0


@pytest.mark.slow
def test_bench_production_field():
    """The JSON contract carries the production serving row (DDIM-3 +
    nu_direct + refine-0) so the driver catches few-step-regime regressions
    round-over-round, not just RESULTS.md prose."""
    out = _run_bench(["--production-batch", "64"])
    prod = out["production"]
    assert prod["steps"] == 3
    assert prod["solutions_per_sec"] > 0
    assert prod["ckpt"] == "ddpm_nu_3u_aug32_s8c"


@pytest.mark.slow
def test_bench_mesh_flag_virtual_devices():
    out = _run_bench(["--mesh", "dp=4,tp=2", "--no-production"])
    assert out["mesh"] == "dp=4,tp=2"
    assert out["n_devices"] == 8
    assert out["value"] > 0


@pytest.mark.slow
def test_fewstep_cli_smoke():
    """fewstep.py drives the serving Solver end-to-end (DDIM respacing,
    checkpoint-owned y_scale/y_shift config) and prints one JSON row."""
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "fewstep.py"), "--cpu",
         "--task", "nu_direct", "--ckpt", "ckpts/ddpm_nu_3u_aug32_s8c",
         "--omega", "0.125", "--steps", "3", "--limit", "32",
         "--no-ddpm-row", "--datasets",
         "/root/reference/datasets/3u_18mW_10000samples.csv"],
        capture_output=True, text=True, cwd=REPO, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    row = json.loads(proc.stdout.strip().splitlines()[-1])
    assert row["sampler"] == "ddim" and row["steps"] == 3
    # 32-row slice of the in-dist split through the aug32 ckpt: ~0.9996
    assert row["less_ratio"] > 0.99


@pytest.mark.slow
def test_train_cli_smoke(tmp_path):
    """train_ddpm.py end-to-end: 2 epochs on the shipped MSR CSV with the
    round-2 flags (y-shift/scale, grad clip, milestones), checkpoint saved
    with the training-owned config in metadata."""
    out = tmp_path / "ckpt"
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "train_ddpm.py"), "--cpu",
         "--task", "msr_wf", "--dataset",
         "/root/reference/datasets/3c_10w_10000samples.csv",
         "--out", str(out), "--epochs", "2", "--y-shift", "3.3333333",
         "--y-scale", "3", "--grad-clip", "1.0", "--milestones", "1",
         "--skip-eval"],
        capture_output=True, text=True, cwd=REPO, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    meta = json.loads((out / "metadata.json").read_text())
    assert meta["dataset_config"]["y_scale"] == 3.0
    assert abs(meta["dataset_config"]["y_shift"] - 3.3333333) < 1e-6
    assert meta["config"]["grad_clip"] == 1.0
