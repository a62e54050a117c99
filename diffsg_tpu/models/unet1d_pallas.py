"""Pallas-backed UNet1D forward.

Runs the same parameter tree as :class:`models.unet1d.UNet1D` but executes
every ResidualBlock as one fused Pallas kernel
(:func:`ops.pallas_kernels.fused_residual_block`).  The tiny glue ops
(feature projection, resamples, skip concats, final head) and the time /
cond projection vectors stay in plain XLA — they are the cheap parts.

Numerically identical to the flax forward (f32): validated in
tests/test_pallas.py both in interpreter mode and against the NU reference
checkpoint.

Use ``unet_apply_fn(model, backend="pallas")`` to get a drop-in ``apply_fn``
for the sampler/trainer.
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from .unet1d import UNet1D, swish
from ..ops.pallas_kernels import fused_residual_block, resblock_params_tuple


def unet_topology(dims: Sequence[int], n_blocks: int) -> Tuple[List[str], List[str]]:
    """Down/up module-kind lists, index-aligned with UNet1D's module names."""
    n_res = len(dims)
    down, up = [], []
    for i in range(n_res):
        down += ["block"] * n_blocks + ["resample"]
        if i == n_res - 1:
            down += ["block"] * n_blocks
    for i in reversed(range(n_res)):
        up += ["block"] * (n_blocks + 1) + ["resample"]
        if i == 0:
            up += ["block"] * (n_blocks + 1)
    return down, up


def _time_features(params: Dict, t: jnp.ndarray, time_dim: int) -> jnp.ndarray:
    half = time_dim // 8
    freq = jnp.exp(jnp.arange(half, dtype=t.dtype)
                   * -(math.log(10_000) / (half - 1)))
    emb = t[:, None] * freq[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)
    emb = swish(emb @ params["lin1"]["kernel"] + params["lin1"]["bias"])
    return emb @ params["lin2"]["kernel"] + params["lin2"]["bias"]


def _dense(p: Dict, x: jnp.ndarray) -> jnp.ndarray:
    return x @ p["kernel"] + p["bias"]


def _ln(p: Dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def unet_forward_pallas(
    params: Dict[str, Any],
    model: UNet1D,
    y: jnp.ndarray,
    t: jnp.ndarray,
    cond: jnp.ndarray,
    cond_mask: jnp.ndarray,
    block_rows: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Full UNet1D forward with fused-Pallas residual blocks."""
    if any(model.is_attn) or model.middle_attn:
        raise NotImplementedError(
            "pallas backend does not fuse AttentionBlocks; use backend='xla' "
            "for attention-enabled configs (no shipped config uses attention)")
    down_kinds, up_kinds = unet_topology(model.dims, model.n_blocks)

    t_emb = _time_features(params["time_emb"], t, model.proj_dim * 4)
    st = swish(t_emb)            # shared across blocks; (Bt, 4*proj)
    cond = cond * cond_mask
    sc = swish(cond)             # (B, cond_dim)

    def run_block(pblk: Dict, x: jnp.ndarray) -> jnp.ndarray:
        res = pblk["res"]
        t_proj = _dense(res["time_emb"], st)
        c_proj = _dense(res["cond_emb"], sc)
        return fused_residual_block(
            x, t_proj, c_proj, *resblock_params_tuple(res),
            block_rows=block_rows, interpret=interpret,
        )

    x = _dense(params["feature_proj"], y)
    h = [x]
    for i, kind in enumerate(down_kinds):
        p = params[f"down_{i}"]
        x = run_block(p, x) if kind == "block" else _dense(p["lin"], x)
        h.append(x)

    # middle: two fused blocks
    for name in ("res1", "res2"):
        res = params["middle"][name]
        t_proj = _dense(res["time_emb"], st)
        c_proj = _dense(res["cond_emb"], sc)
        x = fused_residual_block(
            x, t_proj, c_proj, *resblock_params_tuple(res),
            block_rows=block_rows, interpret=interpret,
        )

    for i, kind in enumerate(up_kinds):
        p = params[f"up_{i}"]
        if kind == "resample":
            x = _dense(p["lin"], x)
        else:
            s = h.pop()
            x = run_block(p, jnp.concatenate([x, s], axis=1))

    return _dense(params["final"], swish(_ln(params["norm"], x)))


def unet_forward_cfg_pair(
    params: Dict[str, Any],
    model: UNet1D,
    y: jnp.ndarray,
    t: jnp.ndarray,
    cond: jnp.ndarray,
) -> jnp.ndarray:
    """Both CFG halves in one forward with the shared prefix computed once.

    The sampler's CFG fold (:func:`diffusion.ddpm.cfg_sample`) runs the net
    on ``2B`` rows where both halves carry the SAME ``y_t`` and differ only
    through ``cond * cond_mask`` (uncond rows see ``cond = 0``).  Two
    structural consequences this forward exploits:

    * the computation is identical for both halves up to the FIRST cond
      injection (``h + cond_emb(swish(cond))`` inside the first down
      block) — ``feature_proj`` and the first block's norm1/lin1/+time/
      norm2/lin2 run at ``B`` rows and fork only at the injection point;
    * ``swish(0) = 0``, so every uncond-half cond projection is exactly
      the ``cond_emb`` BIAS — a broadcast add, no matmul.  All cond
      matmuls run at ``B`` rows instead of ``2B``.

    Input ``y``/``cond`` are the UNFOLDED ``(B, ...)`` arrays; returns
    ``(2B, D)`` epsilon laid out ``[uncond; cond]`` exactly like the folded
    flax forward (f32-identical up to XLA reassociation — tested).

    Measured attempt at the remaining CFG-fold activation traffic
    (round-4 VERDICT item 6); see bench.py ``--backends xla_pair``.
    """
    if any(model.is_attn) or model.middle_attn:
        raise NotImplementedError("cfg_pair does not implement attention")
    down_kinds, up_kinds = unet_topology(model.dims, model.n_blocks)

    t_emb = _time_features(params["time_emb"], t, model.proj_dim * 4)
    st = swish(t_emb)            # (Bt, 4*proj) — batch-constant time trick
    sc = swish(cond)             # (B, cond_dim), conditional half only

    def run_block_pair(res: Dict, x2: jnp.ndarray, B: int) -> jnp.ndarray:
        """Residual block on the (2B,) pair state: cond matmul at B rows,
        uncond half gets the bias broadcast."""
        h = _dense(res["lin1"], swish(_ln(res["norm1"], x2)))
        h = h + _dense(res["time_emb"], st)
        h = _dense(res["lin2"], swish(_ln(res["norm2"], h)))
        c_cond = sc @ res["cond_emb"]["kernel"]       # (B, w) matmul at B rows
        h = h + res["cond_emb"]["bias"]
        h = jnp.concatenate([h[:B], h[B:] + c_cond], axis=0)
        h = _dense(res["lin3"], swish(_ln(res["norm3"], h)))
        if "shortcut" in res:
            x2 = _dense(res["shortcut"], x2)
        return h + x2

    B = y.shape[0]
    x1 = _dense(params["feature_proj"], y)            # (B, proj) shared

    # First down block: shared prefix at B rows, fork at the cond injection.
    res0 = params["down_0"]["res"]
    h = _dense(res0["lin1"], swish(_ln(res0["norm1"], x1)))
    h = h + _dense(res0["time_emb"], st)
    h = _dense(res0["lin2"], swish(_ln(res0["norm2"], h)))
    h = h + res0["cond_emb"]["bias"]
    h2 = jnp.concatenate([h, h + sc @ res0["cond_emb"]["kernel"]], axis=0)
    h2 = _dense(res0["lin3"], swish(_ln(res0["norm3"], h2)))
    x2_in = jnp.concatenate([x1, x1], axis=0)
    if "shortcut" in res0:
        x2_in = _dense(res0["shortcut"], x2_in)
    x = h2 + x2_in

    h_stack = [jnp.concatenate([x1, x1], axis=0), x]
    for i, kind in enumerate(down_kinds[1:], start=1):
        p = params[f"down_{i}"]
        x = (run_block_pair(p["res"], x, B) if kind == "block"
             else _dense(p["lin"], x))
        h_stack.append(x)

    for name in ("res1", "res2"):
        x = run_block_pair(params["middle"][name], x, B)

    for i, kind in enumerate(up_kinds):
        p = params[f"up_{i}"]
        if kind == "resample":
            x = _dense(p["lin"], x)
        else:
            s = h_stack.pop()
            x = run_block_pair(p["res"], jnp.concatenate([x, s], axis=1), B)

    return _dense(params["final"], swish(_ln(params["norm"], x)))


def unet_apply_fn(model: UNet1D, backend: str = "xla", **pallas_kw):
    """apply_fn(params, y, t, cond, mask) for the sampler/trainer.

    backend: "xla" (flax apply), "xla_pair" (shared-prefix CFG-pair
    forward — only for the sampler's folded 2B call), "pallas" (per-block
    fused kernels), or "mega" (whole-network single kernel,
    ops/pallas_mega.py).
    """
    if backend == "xla":
        return lambda p, y, t, c, m: model.apply({"params": p}, y, t, c, m)
    if backend == "xla_pair":
        # Valid ONLY under the sampler's CFG fold convention (rows [0:B]
        # uncond with the same y_t as rows [B:2B] cond): un-folds the
        # inputs and runs the shared-prefix pair forward.  XLA eliminates
        # the caller's concat against these slices, so the fold costs
        # nothing and the shared prefix + cond matmuls run at B rows.
        def pair(p, y2, t, c2, m):
            B = y2.shape[0] // 2
            return unet_forward_cfg_pair(p, model, y2[:B], t, c2[B:])

        return pair
    if backend == "pallas":
        return lambda p, y, t, c, m: unet_forward_pallas(
            p, model, y, t, c, m, **pallas_kw)
    if backend == "mega":
        from ..ops.pallas_mega import unet_forward_mega

        return lambda p, y, t, c, m: unet_forward_mega(
            p, model, y, t, c, m, **pallas_kw)
    raise ValueError(f"unknown backend {backend!r}")
