"""SPADE/SDM semantic-diffusion UNet (alternative conditioning mechanism).

Re-design of the reference ``backbones/unet.py`` (semantic-diffusion-model
lineage): instead of channel-concat conditioning, every ResBlock's
normalizations are *spatially modulated* by the segmentation map --
``SPADEGroupNorm`` (unet.py:156-182) computes parameter-free GroupNorm
statistics and then applies per-pixel gamma/beta predicted from the
(resized) segmap by a small conv net. Class labels arrive as spatial
one-hot maps y: [N, H, W, num_classes] (unet.py:796-825).

The UNet skeleton mirrors the production backbone (timestep-embedding MLP,
encoder/middle/decoder with skip concat, attention at configured ds) so the
diffusion process and samplers are reused unchanged: the segmap rides the
``cond`` argument.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from eo_diffusion_tpu.models.unet import AttentionBlock
from eo_diffusion_tpu.nn.primitives import (
    Conv,
    Dense,
    GroupNorm32,
    ZeroConv,
    avg_pool_2d,
    nearest_upsample_2d,
    timestep_embedding,
)

__all__ = ["SpadeUNetConfig", "SpadeUNet"]


@dataclasses.dataclass(frozen=True)
class SpadeUNetConfig:
    image_size: int
    in_channels: int
    model_channels: int
    out_channels: int
    label_channels: int  # segmap channels (one-hot classes or soft masks)
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = ()
    channel_mult: Tuple[int, ...] = (1, 2, 4)
    num_heads: int = 1
    time_emb_factor: int = 4
    spade_hidden: int = 128
    dtype: Any = jnp.float32


class SPADEGroupNorm(nn.Module):
    """Segmap-modulated GroupNorm (reference unet.py:156-182).

    Parameter-free GroupNorm stats, then y = xhat * (1 + gamma(seg)) +
    beta(seg) with gamma/beta from a shared conv -> ReLU -> two 3x3 convs.
    """

    hidden: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, seg: jax.Array) -> jax.Array:
        n, h, w, c = x.shape
        groups = min(32, c)
        while c % groups:
            groups -= 1
        xf = x.astype(jnp.float32).reshape(n, h * w, groups, c // groups)
        mean = xf.mean(axis=(1, 3), keepdims=True)
        var = xf.var(axis=(1, 3), keepdims=True)
        xhat = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(n, h, w, c)

        # nearest-resize the segmap to the feature resolution
        seg = jax.image.resize(seg, (n, h, w, seg.shape[-1]), "nearest").astype(self.dtype)
        actv = nn.relu(Conv(self.hidden, 3, dtype=self.dtype, name="mlp_shared")(seg))
        gamma = Conv(c, 3, dtype=self.dtype, name="mlp_gamma")(actv).astype(jnp.float32)
        beta = Conv(c, 3, dtype=self.dtype, name="mlp_beta")(actv).astype(jnp.float32)
        return (xhat * (1.0 + gamma) + beta).astype(x.dtype)


class SDMResBlock(nn.Module):
    """SPADE-normalized residual block (reference ``SDMResBlock``,
    unet.py:301-417): SPADE-GN -> SiLU -> conv, +time-emb, SPADE-GN -> SiLU
    -> zero conv, with a 1x1 skip projection on channel change."""

    out_channels: int
    spade_hidden: int = 128
    up: bool = False
    down: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, emb, seg):
        in_ch = x.shape[-1]
        h = SPADEGroupNorm(self.spade_hidden, dtype=self.dtype, name="in_norm")(x, seg)
        h = nn.silu(h)
        if self.up:
            h, x = nearest_upsample_2d(h), nearest_upsample_2d(x)
        elif self.down:
            h, x = avg_pool_2d(h), avg_pool_2d(x)
        h = Conv(self.out_channels, 3, dtype=self.dtype, name="in_conv")(h)
        emb_out = Dense(self.out_channels, dtype=self.dtype, name="emb_proj")(nn.silu(emb))
        h = h + emb_out[:, None, None, :].astype(h.dtype)
        h = SPADEGroupNorm(self.spade_hidden, dtype=self.dtype, name="out_norm")(h, seg)
        h = nn.silu(h)
        h = ZeroConv(self.out_channels, 3, dtype=self.dtype, name="out_conv")(h)
        skip = x if in_ch == self.out_channels else Conv(
            self.out_channels, 1, dtype=self.dtype, name="skip_conv")(x)
        return skip + h


class SpadeUNet(nn.Module):
    """forward(x, t, cond=segmap, y=None) -> eps prediction."""

    config: SpadeUNetConfig

    @nn.compact
    def __call__(self, x, timesteps, cond=None, y=None, *, train: bool = False):
        cfg = self.config
        assert cond is not None, "SpadeUNet requires a segmap via cond"
        seg = cond

        emb = timestep_embedding(timesteps, cfg.model_channels)
        ted = cfg.model_channels * cfg.time_emb_factor
        emb = Dense(ted, dtype=cfg.dtype, name="time_embed_0")(emb)
        emb = nn.silu(emb)
        emb = Dense(ted, dtype=cfg.dtype, name="time_embed_2")(emb)

        h = Conv(cfg.model_channels, 3, dtype=cfg.dtype, name="stem")(x.astype(cfg.dtype))
        hs = [h]
        ds = 1
        ch = cfg.model_channels
        for level, mult in enumerate(cfg.channel_mult):
            for j in range(cfg.num_res_blocks):
                ch = mult * cfg.model_channels
                h = SDMResBlock(ch, cfg.spade_hidden, dtype=cfg.dtype,
                                name=f"enc_{level}_{j}")(h, emb, seg)
                if ds in cfg.attention_resolutions:
                    h = AttentionBlock(num_heads=cfg.num_heads, dtype=cfg.dtype,
                                       name=f"enc_attn_{level}_{j}")(h)
                hs.append(h)
            if level != len(cfg.channel_mult) - 1:
                h = SDMResBlock(ch, cfg.spade_hidden, down=True, dtype=cfg.dtype,
                                name=f"enc_down_{level}")(h, emb, seg)
                hs.append(h)
                ds *= 2

        h = SDMResBlock(ch, cfg.spade_hidden, dtype=cfg.dtype, name="mid_0")(h, emb, seg)
        if cfg.attention_resolutions:
            h = AttentionBlock(num_heads=cfg.num_heads, dtype=cfg.dtype, name="mid_attn")(h)
        h = SDMResBlock(ch, cfg.spade_hidden, dtype=cfg.dtype, name="mid_1")(h, emb, seg)

        for level, mult in reversed(list(enumerate(cfg.channel_mult))):
            for j in range(cfg.num_res_blocks + 1):
                skip = hs.pop()
                h = jnp.concatenate([h, skip.astype(h.dtype)], axis=-1)
                ch = mult * cfg.model_channels
                h = SDMResBlock(ch, cfg.spade_hidden, dtype=cfg.dtype,
                                name=f"dec_{level}_{j}")(h, emb, seg)
                if ds in cfg.attention_resolutions:
                    h = AttentionBlock(num_heads=cfg.num_heads, dtype=cfg.dtype,
                                       name=f"dec_attn_{level}_{j}")(h)
            if level:
                h = SDMResBlock(ch, cfg.spade_hidden, up=True, dtype=cfg.dtype,
                                name=f"dec_up_{level}")(h, emb, seg)
                ds //= 2

        h = GroupNorm32(name="out_norm")(h)
        h = nn.silu(h)
        return ZeroConv(cfg.out_channels, 3, dtype=cfg.dtype, name="out_conv")(h).astype(x.dtype)
