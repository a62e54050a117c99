"""UNet1D — the classifier-free conditional denoiser, as a flax module.

TPU-native re-implementation of the reference network (``ddpm_opt/UNetCF.py``).
The network is a "U-Net" over **feature vectors**: every op is a Linear /
per-row LayerNorm / Swish; "resolutions" are feature widths, not spatial
sizes (reference ``UNetCF.py:260-316``).  All compute therefore maps to MXU
matmuls with the batch as the row dimension — wide batches are the scaling
axis, and the whole forward fuses into one XLA program.

Topology (must match the reference exactly so torch checkpoints import 1:1,
verified against ``ckpts/ddpm_nu_3u.pt``):

* ``feature_proj``: Linear(input_dim -> proj_dim)                (``:272``)
* ``time_emb``: sinusoidal(dim = time_dim//4, half = time_dim//8, freq base
  ``exp(-log(1e4)/(half-1) * k)``) -> Linear -> Swish -> Linear  (``:17-46``)
  with ``time_dim = proj_dim * 4``                               (``:275``)
* down path: per resolution i, ``n_blocks`` DownBlocks at constant width,
  then Downsample(-> dims[i]); after the *last* Downsample another
  ``n_blocks`` DownBlocks                                        (``:277-290``)
* middle: Res -> (attn) -> Res                                   (``:206-227``)
* up path: per reversed i, ``n_blocks+1`` UpBlocks (skip-concat inputs),
  then Upsample(-> dims[i-1] or proj_dim); after the last Upsample another
  ``n_blocks+1`` UpBlocks                                        (``:295-311``)
* final LayerNorm -> Swish -> Linear(-> input_dim), no tanh      (``:313-316``)

Skip-connection bookkeeping matches ``UNetCF.py:333-352``: the stack gets an
entry after *every* down module (including Downsamples), and every UpBlock
pops one and concatenates; Upsamples pass through.

The CFG conditioning-dropout mechanism is simply ``cond * cond_mask``
(``UNetCF.py:330``) — masked samples see a zero condition vector.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


def swish(x: jnp.ndarray) -> jnp.ndarray:
    """x * sigmoid(x) — the reference's custom activation (``UNetCF.py:6-14``)."""
    return x * jax.nn.sigmoid(x)


# torch nn.LayerNorm default epsilon; flax defaults to 1e-6, so pin it.
_LN_EPS = 1e-5


class TimeEmbedding(nn.Module):
    """Sinusoidal time embedding + 2-layer MLP (``UNetCF.py:17-46``)."""

    in_dim: int  # = proj_dim * 4

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        # t: (B,) normalized time (t/T in the CFG path).
        half_dim = self.in_dim // 8
        freq = jnp.exp(
            jnp.arange(half_dim, dtype=t.dtype) * -(math.log(10_000) / (half_dim - 1))
        )
        emb = t[:, None] * freq[None, :]
        emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=1)  # (B, in_dim//4)
        emb = swish(nn.Dense(self.in_dim, name="lin1")(emb))
        return nn.Dense(self.in_dim, name="lin2")(emb)


class ResidualBlock(nn.Module):
    """3x (LayerNorm -> Swish -> Linear) with time/cond injections.

    Time embedding is added after lin1, condition embedding after lin2
    (``UNetCF.py:83-95``); Linear shortcut iff dims differ (``:72-75``).
    """

    in_dim: int
    out_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray, cond: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.out_dim, name="lin1")(
            swish(nn.LayerNorm(epsilon=_LN_EPS, name="norm1")(x))
        )
        h = h + nn.Dense(self.out_dim, name="time_emb")(swish(t))
        h = nn.Dense(self.out_dim, name="lin2")(
            swish(nn.LayerNorm(epsilon=_LN_EPS, name="norm2")(h))
        )
        h = h + nn.Dense(self.out_dim, name="cond_emb")(swish(cond))
        h = nn.Dense(self.out_dim, name="lin3")(
            swish(nn.LayerNorm(epsilon=_LN_EPS, name="norm3")(h))
        )
        if self.in_dim != self.out_dim:
            x = nn.Dense(self.out_dim, name="shortcut")(x)
        return h + x


class AttentionBlock(nn.Module):
    """Single-token self-attention (``UNetCF.py:98-157``).

    The "sequence" has length 1, so softmax over it is the identity and the
    block degenerates to ``output(v) + x`` — kept for topology/ckpt parity
    with ``has_attn=True`` configs (all shipped configs use False).
    """

    in_dim: int
    n_heads: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # The reference constructs a LayerNorm it never applies in forward
        # (``UNetCF.py:112`` defines ``self.norm``; the forward at
        # ``:122-156`` never calls it) — materialize the same params, result
        # discarded (XLA dead-code-eliminates it), so ``has_attn`` torch
        # checkpoints import AND export 1:1 including the norm keys.
        _ = nn.LayerNorm(epsilon=_LN_EPS, name="norm")(x)
        d_k = self.in_dim
        qkv = nn.Dense(self.n_heads * d_k * 3, name="projection")(x)
        qkv = qkv.reshape(x.shape[0], self.n_heads, 3 * d_k)
        _, _, v = jnp.split(qkv, 3, axis=-1)
        # seq len is 1 -> attention weights are exactly 1.0 and q/k are
        # dead inputs: output(v) + x reproduces the reference forward
        res = nn.Dense(self.in_dim, name="output")(v.reshape(x.shape[0], -1))
        return res + x


class DownBlock(nn.Module):
    in_dim: int
    out_dim: int
    has_attn: bool = False

    @nn.compact
    def __call__(self, x, t, cond):
        x = ResidualBlock(self.in_dim, self.out_dim, name="res")(x, t, cond)
        if self.has_attn:
            x = AttentionBlock(self.out_dim, name="attn")(x)
        return x


class UpBlock(nn.Module):
    """Input is ``in_dim + out_dim`` wide — skip concat (``UNetCF.py:188``)."""

    in_dim: int
    out_dim: int
    has_attn: bool = False

    @nn.compact
    def __call__(self, x, t, cond):
        x = ResidualBlock(self.in_dim + self.out_dim, self.out_dim, name="res")(x, t, cond)
        if self.has_attn:
            x = AttentionBlock(self.out_dim, name="attn")(x)
        return x


class MiddleBlock(nn.Module):
    dim: int
    has_attn: bool = False

    @nn.compact
    def __call__(self, x, t, cond):
        x = ResidualBlock(self.dim, self.dim, name="res1")(x, t, cond)
        if self.has_attn:
            x = AttentionBlock(self.dim, name="attn")(x)
        return ResidualBlock(self.dim, self.dim, name="res2")(x, t, cond)


class Resample(nn.Module):
    """Plain Linear feature resize — both Up/Downsample in the reference
    (``UNetCF.py:230-257``)."""

    out_dim: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.out_dim, name="lin")(x)


class UNet1D(nn.Module):
    """The full denoiser.  Per-task configs (the reference model zoo):

    =========  =========  ========  ========  ==============  ========
    task       input_dim  proj_dim  cond_dim  dims            n_blocks
    =========  =========  ========  ========  ==============  ========
    MSR-3c     3          128       3         (64,32,16,8)    2
    MSR-80c    80         128       80        (64,32,16,8)    2
    CO         3          64        9         (64,32,16,8)    3
    NU         5          32        6         (32,16,8)       2
    =========  =========  ========  ========  ==============  ========

    (reference instantiations at ``classifier_free_MSR.py:202``,
    ``classifier_free_CO.py:218``, ``classifier_free_NU.py:230``).
    """

    input_dim: int = 3
    proj_dim: int = 16
    cond_dim: int = 4
    dims: Sequence[int] = (8, 4, 2)
    is_attn: Sequence[bool] = (False, False, False)
    middle_attn: bool = False
    n_blocks: int = 2

    def setup(self):
        n_res = len(self.dims)
        self.feature_proj = nn.Dense(self.proj_dim)
        self.time_emb = TimeEmbedding(self.proj_dim * 4)

        # (kind per module) distinguishes blocks from resamples; list indices
        # align with the torch ModuleList for ckpt import.
        down, down_kinds = [], []
        in_dim = self.proj_dim
        for i in range(n_res):
            for _ in range(self.n_blocks):
                down.append(DownBlock(in_dim, in_dim, self.is_attn[i]))
                down_kinds.append("block")
            down.append(Resample(self.dims[i]))
            down_kinds.append("resample")
            in_dim = self.dims[i]
            if i == n_res - 1:
                for _ in range(self.n_blocks):
                    down.append(DownBlock(in_dim, in_dim, self.is_attn[i]))
                    down_kinds.append("block")
        self.down = down
        self._down_kinds = tuple(down_kinds)

        self.middle = MiddleBlock(in_dim, self.middle_attn)

        up, up_kinds = [], []
        for i in reversed(range(n_res)):
            for _ in range(self.n_blocks + 1):
                up.append(UpBlock(in_dim, in_dim, self.is_attn[i]))
                up_kinds.append("block")
            out_dim = self.dims[i - 1] if i > 0 else self.proj_dim
            up.append(Resample(out_dim))
            up_kinds.append("resample")
            in_dim = out_dim
            if i == 0:
                for _ in range(self.n_blocks + 1):
                    up.append(UpBlock(in_dim, in_dim, self.is_attn[i]))
                    up_kinds.append("block")
        self.up = up
        self._up_kinds = tuple(up_kinds)

        self.norm = nn.LayerNorm(epsilon=_LN_EPS)
        self.final = nn.Dense(self.input_dim)

    def __call__(self, x, t, cond, cond_mask):
        """x: (B, input_dim); t: (B,) normalized time; cond: (B, cond_dim);
        cond_mask: (B, 1) with 1.0 = keep condition, 0.0 = drop."""
        t = self.time_emb(t)
        x = self.feature_proj(x)
        cond = cond * cond_mask

        h = [x]
        for kind, m in zip(self._down_kinds, self.down):
            x = m(x, t, cond) if kind == "block" else m(x)
            h.append(x)

        x = self.middle(x, t, cond)

        for kind, m in zip(self._up_kinds, self.up):
            if kind == "resample":
                x = m(x)
            else:
                s = h.pop()
                x = m(jnp.concatenate([x, s], axis=1), t, cond)

        return self.final(swish(self.norm(x)))


# Reference model-zoo constructors -------------------------------------------

def unet_msr(M: int = 3, proj_dim: int = 128,
             dims=(64, 32, 16, 8), cond_extra: int = 0) -> UNet1D:
    """MSR config (``classifier_free_MSR.py:202-203``); M=3 or 80.

    ``proj_dim``/``dims`` default to the reference architecture; overriding
    them (framework extension, carried in checkpoint metadata via
    ``config['proj_dim']/['dims']``) scales the denoiser for wider tasks.
    ``cond_extra`` widens the condition (e.g. +1 for the W-budget feature
    of the ``msr_budget`` task — the same designed-but-disabled
    conditioning capability as NU's, see :func:`unet_nu`).
    """
    return UNet1D(input_dim=M, proj_dim=proj_dim, cond_dim=M + cond_extra,
                  dims=tuple(dims), is_attn=(False,) * len(dims),
                  middle_attn=False, n_blocks=2)


def unet_co(node_num: int = 3) -> UNet1D:
    """CO config (``classifier_free_CO.py:218-219``)."""
    return UNet1D(input_dim=node_num, proj_dim=64, cond_dim=3 * node_num,
                  dims=(64, 32, 16, 8), is_attn=(False,) * 4,
                  middle_attn=False, n_blocks=3)


def unet_nu(K: int = 3, cond_extra: int = 0, proj_dim: int = 32,
            dims=(32, 16, 8)) -> UNet1D:
    """NU config (``classifier_free_NU.py:230-231``).

    ``cond_extra`` widens the condition vector for the conditioning
    capability the reference designs but never enables (the ``cdim`` config
    key / commented-out ``condition_C``, ``classifier_free_NU.py:35-75``) —
    e.g. +1 for the power-budget feature of the ``nu_budget`` task.
    ``proj_dim``/``dims`` default to the reference architecture; overriding
    them (recorded in checkpoint metadata, resolved at load via
    ``config['proj_dim']/['dims']``) scales the denoiser — the universal
    nu_geo model uses this to buy capacity for the geometry axis."""
    return UNet1D(input_dim=2 + K, proj_dim=proj_dim,
                  cond_dim=2 * K + cond_extra, dims=tuple(dims),
                  is_attn=(False,) * len(dims),
                  middle_attn=False, n_blocks=2)
