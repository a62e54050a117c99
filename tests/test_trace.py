"""Trajectory capture + per-step decode layout tests."""

import numpy as np
import jax
import jax.numpy as jnp

from diffsg_tpu.diffusion.ddpm import SampleTrace
from diffsg_tpu.utils.trace import decode_trace, eps_trace


def _mk_trace(T=5, B=4, D=3, seed=0):
    rng = np.random.default_rng(seed)
    return SampleTrace(
        ys=jnp.asarray(rng.normal(0, 1, (T, B, D)), jnp.float32),
        eps=jnp.asarray(rng.normal(0, 1, (T, B, D)), jnp.float32),
    )


def test_msr_trace_decode_layout():
    trace = _mk_trace()
    out = decode_trace("msr", trace, {})
    assert out.shape == (4, 15)  # (B, T*D), step-major blocks
    # first 3 steps: plain softmax rows sum to 1
    for s in range(3):
        np.testing.assert_allclose(out[:, s * 3 : (s + 1) * 3].sum(1), 1.0,
                                   rtol=1e-5)
    # later steps use the full decoder (still softmax rows)
    np.testing.assert_allclose(out[:, 12:15].sum(1), 1.0, rtol=1e-5)


def test_co_trace_decode():
    trace = _mk_trace()
    out = decode_trace("co", trace, {})
    assert out.shape == (4, 15)
    np.testing.assert_allclose(out[:, :3].sum(1), 1.0, rtol=1e-5)


def test_nu_trace_decode():
    trace = _mk_trace(D=5)
    out = decode_trace("nu", trace, {"width": 400, "height": 400, "P_sum": 18.0})
    assert out.shape == (4, 25)
    # powers block of each step sums to P_sum
    np.testing.assert_allclose(out[:, 2:5].sum(1), 18.0, rtol=1e-4)


def test_eps_trace_layout():
    trace = _mk_trace()
    e = eps_trace(trace)
    assert e.shape == (4, 15)
    np.testing.assert_allclose(e[1, 3:6], np.asarray(trace.eps[1, 1]), rtol=1e-6)
