"""Encoder-half UNet classifier + super-resolution UNet variant.

Re-designs of the remaining reference ``backbones/unet.py`` members:

* :class:`EncoderUNet` -- the classifier half (reference
  ``EncoderUNetModel``, unet.py:845+): the UNet's encoder + middle blocks
  followed by an attention pool (reference ``AttentionPool2d``,
  unet_openai.py:151-180) producing class logits. Used for (noisy-image)
  classifier training and classifier-guided sampling
  (``diffusion/classifier_guidance.py``).
* :class:`SuperResUNet` -- low-res-conditioned UNet (reference
  ``SuperResModel``, unet.py:828-842): the low-res image is nearest-upsampled
  to the target resolution and channel-concatenated.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from eo_diffusion_tpu.models.unet import (
    AttentionBlock,
    ResBlock,
    Downsample,
    UNet,
    UNetConfig,
)
from eo_diffusion_tpu.nn.primitives import (
    Conv,
    Dense,
    GroupNorm32,
    timestep_embedding,
)

__all__ = ["EncoderUNetConfig", "EncoderUNet", "SuperResUNet", "AttentionPool2d"]


class AttentionPool2d(nn.Module):
    """CLIP-style attention pooling (reference unet_openai.py:151-180):
    prepend the mean token, add a learned positional embedding, one
    multi-head attention layer, take the (mean) query token's output."""

    num_heads: int
    out_features: Optional[int] = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        n, h, w, c = x.shape
        t = h * w
        xt = x.reshape(n, t, c)
        mean_tok = jnp.mean(xt, axis=1, keepdims=True)
        xt = jnp.concatenate([mean_tok, xt], axis=1)  # [N, T+1, C]
        pos = self.param(
            "positional_embedding",
            lambda key, shape: jax.random.normal(key, shape) / (c**0.5),
            (t + 1, c),
        )
        xt = xt + pos[None].astype(xt.dtype)
        qkv = Dense(3 * c, dtype=self.dtype, name="qkv_proj")(xt)
        heads = self.num_heads
        ch = c // heads
        qkv = qkv.reshape(n, t + 1, 3, heads, ch)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.float32(ch))).astype(q.dtype)
        w_ = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale)
        w_ = jax.nn.softmax(w_.astype(jnp.float32), axis=-1).astype(v.dtype)
        a = jnp.einsum("bhts,bshc->bthc", w_, v).reshape(n, t + 1, c)
        out = Dense(self.out_features or c, dtype=self.dtype, name="c_proj")(a)
        return out[:, 0]


@dataclasses.dataclass(frozen=True)
class EncoderUNetConfig:
    image_size: int
    in_channels: int
    model_channels: int
    num_classes: int
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = ()
    channel_mult: Tuple[int, ...] = (1, 2, 4)
    num_heads: int = 4
    time_emb_factor: int = 4
    dtype: Any = jnp.float32


class EncoderUNet(nn.Module):
    """Timestep-conditioned image classifier: logits = f(x_t, t)."""

    config: EncoderUNetConfig

    @nn.compact
    def __call__(self, x: jax.Array, timesteps: jax.Array, *, train: bool = False) -> jax.Array:
        cfg = self.config
        emb = timestep_embedding(timesteps, cfg.model_channels)
        ted = cfg.model_channels * cfg.time_emb_factor
        emb = Dense(ted, dtype=cfg.dtype, name="time_embed_0")(emb)
        emb = nn.silu(emb)
        emb = Dense(ted, dtype=cfg.dtype, name="time_embed_2")(emb)

        h = Conv(cfg.model_channels, 3, dtype=cfg.dtype, name="stem")(x.astype(cfg.dtype))
        ds = 1
        for level, mult in enumerate(cfg.channel_mult):
            for j in range(cfg.num_res_blocks):
                h = ResBlock(mult * cfg.model_channels, dtype=cfg.dtype,
                             name=f"enc_{level}_{j}")(h, emb, train=train)
                if ds in cfg.attention_resolutions:
                    h = AttentionBlock(num_heads=cfg.num_heads, dtype=cfg.dtype,
                                       name=f"enc_attn_{level}_{j}")(h)
            if level != len(cfg.channel_mult) - 1:
                h = Downsample(h.shape[-1], dtype=cfg.dtype, name=f"down_{level}")(h)
                ds *= 2

        h = ResBlock(h.shape[-1], dtype=cfg.dtype, name="mid_0")(h, emb, train=train)
        h = ResBlock(h.shape[-1], dtype=cfg.dtype, name="mid_1")(h, emb, train=train)
        h = nn.silu(GroupNorm32(name="out_norm")(h))
        pooled = AttentionPool2d(num_heads=cfg.num_heads, dtype=cfg.dtype, name="pool")(h)
        return Dense(cfg.num_classes, dtype=cfg.dtype, name="head")(pooled).astype(jnp.float32)


class SuperResUNet(nn.Module):
    """Low-res-conditioned UNet (reference ``SuperResModel``): the low-res
    input is resized to the target resolution and channel-concatenated --
    the inner UNet's ``in_channels`` must budget the extra channels."""

    config: UNetConfig

    @nn.compact
    def __call__(self, x, timesteps, low_res=None, y=None, *, train: bool = False):
        assert low_res is not None, "SuperResUNet requires low_res"
        n, h, w, _ = x.shape
        upsampled = jax.image.resize(
            low_res, (n, h, w, low_res.shape[-1]), "nearest"
        ).astype(x.dtype)
        return UNet(self.config, name="unet")(x, timesteps, cond=upsampled, y=y, train=train)
