"""Test configuration: force the CPU backend with 8 virtual devices.

Tests must not touch the (single, tunneled) TPU: first-compiles over the
tunnel take ~30-100s and mesh tests need >1 device.  A sitecustomize in this
image pins JAX_PLATFORMS=axon, so the env var alone is not enough — we also
set the config flag after import, before any backend is initialized.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
# Everything in this codebase is f32-sensitive (parity with torch f32).
jax.config.update("jax_default_matmul_precision", "highest")

import pathlib

import pytest

FIXTURE_DIR = pathlib.Path(__file__).parent / "fixtures"
REFERENCE_PATH = pathlib.Path(os.environ.get("DIFFSG_REFERENCE_PATH", "/root/reference"))


def pytest_sessionstart(session):
    """datasets/ is gitignored (regenerable, deterministic, seconds): any
    missing CSVs that tests read are regenerated up front."""
    import sys

    repo = pathlib.Path(__file__).resolve().parent.parent
    sys.path.insert(0, str(repo))
    try:
        from tools.make_datasets import ensure_datasets

        ensure_datasets(["3nodes_50000samples_new.csv"])
    except Exception as e:  # tests that need the file will fail loudly
        import warnings

        # a pytest warning survives into the summary (stderr prints are
        # hidden without -s), so a broken make_datasets is visible as the
        # root cause next to the downstream FileNotFoundErrors
        warnings.warn(f"conftest: dataset regeneration failed: {e!r} — "
                      "tests reading datasets/ will fail with missing files",
                      RuntimeWarning, stacklevel=1)


@pytest.fixture(scope="session")
def fixture_dir():
    return FIXTURE_DIR


@pytest.fixture(scope="session")
def reference_path():
    if not REFERENCE_PATH.exists():
        pytest.skip("reference repo not available")
    return REFERENCE_PATH
