"""Pallas TPU kernels for the UNet1D hot path.

The denoiser is a stack of ResidualBlocks: 3x (LayerNorm -> Swish -> Linear)
with time/cond injections and a shortcut (``UNetCF.py:49-95`` in the
reference).  XLA executes each block as several kernels with HBM-resident
activations between them; this module fuses one whole block into a single
``pallas_call``: the batch is tiled over a 1-D grid, weights live in VMEM,
and the three matmuls + norms + activations happen back-to-back on-chip.

Contract (matches models.unet1d.ResidualBlock exactly, f32):

  h  = swish(LN(x; g1, b1)) @ W1 + c1 + t_proj      # t_proj = Dense(swish(t))
  h  = swish(LN(h; g2, b2)) @ W2 + c2 + c_proj      # c_proj = Dense(swish(cond))
  h  = swish(LN(h; g3, b3)) @ W3 + c3
  out = h + (x @ Ws + cs  if in_dim != out_dim else x)

The time/cond projections are computed by the caller (they are tiny matmuls
from the 512-wide time embedding / <=80-wide condition and — in the sampler —
the time projection is batch-constant), passed in as row vectors / matrices.

Use: ``fused_residual_block(...)`` is a drop-in for the flax block's math;
``models.unet1d_pallas.UNet1DPallas`` wires it through the whole network.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LN_EPS = 1e-5


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _ln(x, gamma, beta):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + _LN_EPS) * gamma + beta


def _resblock_kernel(x_ref, tproj_ref, cproj_ref,
                     g1_ref, be1_ref, w1_ref, b1_ref,
                     g2_ref, be2_ref, w2_ref, b2_ref,
                     g3_ref, be3_ref, w3_ref, b3_ref,
                     ws_ref, bs_ref,
                     out_ref, *, has_shortcut: bool):
    x = x_ref[:]
    h = _swish(_ln(x, g1_ref[:], be1_ref[:]))
    h = jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    h = h + tproj_ref[:]
    h = _swish(_ln(h, g2_ref[:], be2_ref[:]))
    h = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32) + b2_ref[:]
    h = h + cproj_ref[:]
    h = _swish(_ln(h, g3_ref[:], be3_ref[:]))
    h = jnp.dot(h, w3_ref[:], preferred_element_type=jnp.float32) + b3_ref[:]
    if has_shortcut:
        h = h + jnp.dot(x, ws_ref[:], preferred_element_type=jnp.float32) + bs_ref[:]
    else:
        h = h + x
    out_ref[:] = h


@functools.partial(jax.jit, static_argnames=("block_rows", "interpret"))
def fused_residual_block(
    x: jnp.ndarray,          # (B, in_dim)
    t_proj: jnp.ndarray,     # (1, out_dim) or (B, out_dim)
    c_proj: jnp.ndarray,     # (B, out_dim)
    g1, be1, w1, b1,         # LN1 (in_dim), W1 (in_dim, out_dim)
    g2, be2, w2, b2,         # LN2 (out_dim), W2 (out_dim, out_dim)
    g3, be3, w3, b3,         # LN3 (out_dim), W3 (out_dim, out_dim)
    ws: Optional[jnp.ndarray] = None,  # (in_dim, out_dim) shortcut
    bs: Optional[jnp.ndarray] = None,
    block_rows: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    B, in_dim = x.shape
    out_dim = w1.shape[1]
    has_shortcut = ws is not None
    if not has_shortcut:
        ws = jnp.zeros((in_dim, out_dim), x.dtype)
        bs = jnp.zeros((out_dim,), x.dtype)

    rows = min(block_rows, B)
    grid = (pl.cdiv(B, rows),)

    t_full = jnp.broadcast_to(t_proj, (1, out_dim)) if t_proj.shape[0] == 1 else t_proj
    t_is_row = t_full.shape[0] == 1

    def row_spec(width):
        return pl.BlockSpec((rows, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def rep_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, (lambda i: (0,) * nd),
                            memory_space=pltpu.VMEM)

    in_specs = [
        row_spec(in_dim),                                     # x
        rep_spec((1, out_dim)) if t_is_row else row_spec(out_dim),  # t_proj
        row_spec(out_dim),                                    # c_proj
        rep_spec((in_dim,)), rep_spec((in_dim,)),             # g1, be1
        rep_spec((in_dim, out_dim)), rep_spec((out_dim,)),    # w1, b1
        rep_spec((out_dim,)), rep_spec((out_dim,)),           # g2, be2
        rep_spec((out_dim, out_dim)), rep_spec((out_dim,)),   # w2, b2
        rep_spec((out_dim,)), rep_spec((out_dim,)),           # g3, be3
        rep_spec((out_dim, out_dim)), rep_spec((out_dim,)),   # w3, b3
        rep_spec((in_dim, out_dim)), rep_spec((out_dim,)),    # ws, bs
    ]

    return pl.pallas_call(
        functools.partial(_resblock_kernel, has_shortcut=has_shortcut),
        out_shape=jax.ShapeDtypeStruct((B, out_dim), x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=row_spec(out_dim),
        interpret=interpret,
    )(x, t_full, c_proj, g1, be1, w1, b1, g2, be2, w2, b2, g3, be3, w3, b3,
      ws, bs)


def resblock_params_tuple(p):
    """Extract the fused-kernel argument tuple from a flax ResidualBlock
    params dict (models.unet1d.ResidualBlock)."""
    args = (
        p["norm1"]["scale"], p["norm1"]["bias"],
        p["lin1"]["kernel"], p["lin1"]["bias"],
        p["norm2"]["scale"], p["norm2"]["bias"],
        p["lin2"]["kernel"], p["lin2"]["bias"],
        p["norm3"]["scale"], p["norm3"]["bias"],
        p["lin3"]["kernel"], p["lin3"]["bias"],
    )
    if "shortcut" in p:
        return args + (p["shortcut"]["kernel"], p["shortcut"]["bias"])
    return args + (None, None)
