"""Attention-enabled UNet1D configs (capability kept for ckpt parity even
though no shipped config uses attention)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from diffsg_tpu.models.unet1d import UNet1D, AttentionBlock
from diffsg_tpu.models.unet1d_pallas import unet_apply_fn


def test_attention_unet_forward():
    model = UNet1D(input_dim=3, proj_dim=16, cond_dim=3, dims=(8, 4),
                   is_attn=(True, True), middle_attn=True, n_blocks=1)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 3)), jnp.zeros((2,)),
                   jnp.zeros((2, 3)), jnp.ones((2, 1)))
    out = model.apply(v, jnp.ones((4, 3)), jnp.ones((4,)) * 0.5,
                      jnp.ones((4, 3)), jnp.ones((4, 1)))
    assert out.shape == (4, 3) and bool(jnp.all(jnp.isfinite(out)))


def test_attention_block_is_residual_passthrough():
    """Seq-len-1 attention: softmax over the single position is identity, so
    the block reduces to output(v) + x (see UNetCF.py:135-157)."""
    blk = AttentionBlock(in_dim=8)
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (4, 8)), jnp.float32)
    v = blk.init(jax.random.PRNGKey(0), x)
    out = blk.apply(v, x)
    p = v["params"]
    qkv = x @ p["projection"]["kernel"] + p["projection"]["bias"]
    vv = qkv[:, 16:24]
    expect = vv @ p["output"]["kernel"] + p["output"]["bias"] + x
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), atol=1e-6)


def test_pallas_backend_rejects_attention():
    model = UNet1D(input_dim=3, proj_dim=16, cond_dim=3, dims=(8, 4),
                   is_attn=(True, False), middle_attn=False, n_blocks=1)
    fn = unet_apply_fn(model, backend="pallas", interpret=True)
    with pytest.raises(NotImplementedError):
        fn({}, jnp.ones((2, 3)), jnp.ones((2,)), jnp.ones((2, 3)),
           jnp.ones((2, 1)))
