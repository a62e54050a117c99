"""Whole-network Pallas megakernel for the UNet1D denoiser.

Round-1 finding (docs/RESULTS.md): per-block fused kernels LOSE to XLA
(41k vs 112k solutions/s) — each block is its own ``pallas_call``, so
activations round-trip through HBM between blocks and every call pays
dispatch overhead.  At these layer widths (8..256 lanes) the sampler is
HBM-bandwidth-bound under XLA too: every matmul reads/writes a
(2B, width) activation tensor from HBM (~1 GB per denoise step at
B=32768).

This module instead runs the ENTIRE forward — all ~34 residual-block
matmuls, layernorms, skip concats, cond/time injections, and the output
head — as ONE ``pallas_call``:

* the grid tiles the (folded 2B) batch rows; each grid step computes the
  full network for its row tile with every intermediate held in VMEM
  (the skip stack lives in registers/VMEM as live values);
* all weights (~1.5M params, 6.2 MB f32 / 3.1 MB bf16) use constant-index
  BlockSpecs: the pipeline fetches them into VMEM once and reuses them
  across grid steps (same block index => no re-copy);
* HBM traffic per denoise step drops from ~1 GB to the row tiles of
  y/cond/out (~20 MB at B=32768) plus the one-time weight fetch;
* the batch-1 time path (TimeEmbedding MLP) stays outside in XLA — its
  ``swish`` output ``st`` is passed in and the tiny per-block time
  projections are recomputed per tile (<6% extra FLOPs).

The parameter tree is passed whole: flattened to ``pallas_call`` operands
and re-assembled into a tree of *refs* inside the kernel via the same
treedef, so the kernel body reads like the flax forward
(models/unet1d.py:240-261).  Numerics: identical math to the flax module
(f32); validated against it in tests/test_pallas.py and by an end-to-end
quality eval on the T=100 MSR-3c checkpoint.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.unet1d_pallas import unet_topology

_LN_EPS = 1e-5


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _prune_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Drop the module-level TimeEmbedding MLP (computed outside)."""
    return {k: v for k, v in params.items() if k != "time_emb"}


def _kernel_body(treedef, kinds, compute_dtype, y_ref, sc_ref, st_ref,
                 *refs):
    # pallas passes input refs first, then output refs: weights..., out
    wrefs, out_ref = refs[:-1], refs[-1]
    down_kinds, up_kinds = kinds
    p = jax.tree_util.tree_unflatten(treedef, wrefs)
    f32 = jnp.float32

    def ln(pr, x):
        xf = x.astype(f32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
        out = (xf - mean) * jax.lax.rsqrt(var + _LN_EPS) \
            * pr["scale"][:].astype(f32) + pr["bias"][:].astype(f32)
        return out.astype(x.dtype)

    def dense(pr, x):
        return (jnp.dot(x, pr["kernel"][:], preferred_element_type=f32)
                + pr["bias"][:].astype(f32)).astype(x.dtype)

    def swish(x):
        # sigmoid in f32: the VPU is f32-native and Mosaic's bf16
        # transcendental lowering trips a verifier bug (f32 scalar
        # broadcast into a bf16 vector)
        xf = x.astype(f32)
        return (xf * jax.nn.sigmoid(xf)).astype(x.dtype)

    st = st_ref[:]          # (1, 4*proj) swish'd time embedding
    sc = sc_ref[:]          # (rows, C)   swish'd masked condition

    def resblock(pr, x):
        t_proj = dense(pr["time_emb"], st)           # (1, out)
        c_proj = dense(pr["cond_emb"], sc)           # (rows, out)
        h = dense(pr["lin1"], swish(ln(pr["norm1"], x)))
        h = h + t_proj
        h = dense(pr["lin2"], swish(ln(pr["norm2"], h))) + c_proj
        h = dense(pr["lin3"], swish(ln(pr["norm3"], h)))
        if "shortcut" in pr:
            h = h + dense(pr["shortcut"], x)
        else:
            h = h + x
        return h

    # up-blocks concat [x, skip] before norm1 — LN runs over the
    # concatenated feature axis, so the concat must be materialized.
    def up_resblock(pr, x, s):
        return resblock(pr, jnp.concatenate([x, s], axis=1))

    x = dense(p["feature_proj"], y_ref[:])
    h = [x]
    for i, kind in enumerate(down_kinds):
        pr = p[f"down_{i}"]
        x = resblock(pr["res"], x) if kind == "block" else dense(pr["lin"], x)
        h.append(x)

    x = resblock(p["middle"]["res1"], x)
    x = resblock(p["middle"]["res2"], x)

    for i, kind in enumerate(up_kinds):
        pr = p[f"up_{i}"]
        if kind == "resample":
            x = dense(pr["lin"], x)
        else:
            x = up_resblock(pr["res"], x, h.pop())

    out = dense(p["final"], swish(ln(p["norm"], x)))
    out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("model", "tile_rows", "interpret", "compute_dtype"))
def unet_forward_mega(
    params: Dict[str, Any],
    model,
    y: jnp.ndarray,
    t: jnp.ndarray,
    cond: jnp.ndarray,
    cond_mask: jnp.ndarray,
    tile_rows: int = 256,
    interpret: bool = False,
    compute_dtype=None,
) -> jnp.ndarray:
    """Full UNet1D forward as one Pallas kernel (see module docstring).

    Drop-in for ``model.apply`` with the same (y, t, cond, cond_mask)
    contract; ``t`` may be batch-1 (the sampler's batch-constant time) or
    full-batch — full-batch falls back to batch-1 only if all entries are
    equal is NOT checked; pass batch-1 in the sampler.  ``compute_dtype``
    (e.g. bfloat16) casts weights and activations; dot products still
    accumulate in f32 and layernorm statistics are computed in f32.
    """
    if any(model.is_attn) or model.middle_attn:
        raise NotImplementedError("mega kernel: no attention configs")
    from ..models.unet1d_pallas import _time_features

    dtype = jnp.dtype(compute_dtype) if compute_dtype is not None else y.dtype
    B = y.shape[0]
    D = model.input_dim

    t_emb = _time_features(params["time_emb"], t[:1], model.proj_dim * 4)
    st = _swish(t_emb).astype(dtype)                      # (1, 4*proj)
    sc = _swish((cond * cond_mask)).astype(dtype)         # (B, C)
    y = y.astype(dtype)

    pruned = _prune_params(params)
    if compute_dtype is not None:
        pruned = jax.tree.map(lambda a: a.astype(dtype), pruned)
    flat, treedef = jax.tree_util.tree_flatten(pruned)

    kinds = unet_topology(model.dims, model.n_blocks)

    rows = min(tile_rows, B)
    grid = (pl.cdiv(B, rows),)

    def row_spec(width):
        return pl.BlockSpec((rows, width), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, (lambda i: (0,) * nd),
                            memory_space=pltpu.VMEM)

    in_specs = [
        row_spec(D),                    # y
        row_spec(cond.shape[1]),        # sc
        const_spec(st.shape),           # st
    ] + [const_spec(a.shape) for a in flat]

    kernel = functools.partial(_kernel_body, treedef, kinds, compute_dtype)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, D), dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=row_spec(D),
        interpret=interpret,
    )(y, sc, st, *flat)
    return out.astype(jnp.float32) if compute_dtype is not None else out
