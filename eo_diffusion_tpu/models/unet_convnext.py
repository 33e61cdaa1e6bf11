"""ConvNeXt-block UNet with linear attention (alternative backbone).

Re-design of the reference ``backbones/unet_convnext.py`` (lucidrains
lineage): depthwise-7x7 ConvNeXt blocks (unet_convnext.py:73-104), efficient
linear attention (106-126), sinusoidal time MLP, and the optional
``residual`` / ``output_mean_scale`` output modes (223-229). NHWC layout;
LayerNorm statistics in float32.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from eo_diffusion_tpu.nn.primitives import Conv, timestep_embedding

__all__ = ["ConvNextUNetConfig", "ConvNextUNet"]


@dataclasses.dataclass(frozen=True)
class ConvNextUNetConfig:
    dim: int = 64
    out_dim: Optional[int] = None
    dim_mults: Tuple[int, ...] = (1, 2, 4, 8)
    channels: int = 3
    with_time_emb: bool = True
    output_mean_scale: bool = False
    residual: bool = False
    dtype: Any = jnp.float32


class ChannelLayerNorm(nn.Module):
    """Per-pixel channel LayerNorm (unet_convnext.py:50-60), f32 stats."""

    @nn.compact
    def __call__(self, x):
        dt = x.dtype
        xf = x.astype(jnp.float32)
        mean = xf.mean(-1, keepdims=True)
        var = xf.var(-1, keepdims=True)
        g = self.param("g", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        b = self.param("b", nn.initializers.zeros, (x.shape[-1],), jnp.float32)
        return (((xf - mean) * jax.lax.rsqrt(var + 1e-5)) * g + b).astype(dt)


class ConvNextBlock(nn.Module):
    """Depthwise 7x7 -> (+time) -> LN -> conv-GELU-conv, residual
    (unet_convnext.py:73-104)."""

    dim_out: int
    mult: int = 2
    norm: bool = True
    time_emb: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, t_emb=None):
        c = x.shape[-1]
        h = nn.Conv(c, (7, 7), padding=((3, 3), (3, 3)), feature_group_count=c,
                    dtype=self.dtype, param_dtype=jnp.float32, name="ds_conv")(x)
        if self.time_emb and t_emb is not None:
            cond = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                            name="time_proj")(nn.gelu(t_emb))
            h = h + cond[:, None, None, :].astype(h.dtype)
        if self.norm:
            h = ChannelLayerNorm(name="norm")(h)
        h = Conv(self.dim_out * self.mult, 3, dtype=self.dtype, name="net_conv1")(h)
        h = nn.gelu(h)
        h = Conv(self.dim_out, 3, dtype=self.dtype, name="net_conv2")(h)
        skip = x if c == self.dim_out else Conv(self.dim_out, 1, dtype=self.dtype, name="res_conv")(x)
        return h + skip


class LinearAttention(nn.Module):
    """Efficient linear attention (unet_convnext.py:106-126): softmax over
    keys, O(T*d^2) context accumulation -- already TPU-friendly (two matmuls)."""

    heads: int = 4
    dim_head: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, hh, ww, c = x.shape
        hid = self.heads * self.dim_head
        qkv = nn.Conv(hid * 3, (1, 1), use_bias=False, dtype=self.dtype,
                      param_dtype=jnp.float32, name="to_qkv")(x)
        qkv = qkv.reshape(n, hh * ww, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [N, T, H, D]
        q = q * (self.dim_head**-0.5)
        k = jax.nn.softmax(k.astype(jnp.float32), axis=1).astype(v.dtype)
        context = jnp.einsum("bthd,bthe->bhde", k, v)  # [N, H, D, E]
        out = jnp.einsum("bhde,bthd->bthe", context, q)
        out = out.reshape(n, hh, ww, hid)
        return nn.Conv(c, (1, 1), dtype=self.dtype, param_dtype=jnp.float32, name="to_out")(out)


class ConvNextUNet(nn.Module):
    """forward(x, t) with downs/mid/ups of (block, block, attn, resample)
    (unet_convnext.py:130-230)."""

    config: ConvNextUNetConfig

    @nn.compact
    def __call__(self, x, t=None, cond=None, y=None, *, train: bool = False):
        cfg = self.config
        # residual/mean references are the RAW input (the reference model
        # never concats internally, so its orig_x is pre-conditioning;
        # capturing after the concat would add a channel-mismatched tensor)
        orig_x = x
        original_mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        if cond is not None:
            x = jnp.concatenate([x, cond.astype(x.dtype)], axis=-1)
        x = x.astype(cfg.dtype)

        t_emb = None
        if cfg.with_time_emb and t is not None:
            te = timestep_embedding(t, cfg.dim)
            te = nn.Dense(cfg.dim * 4, dtype=cfg.dtype, param_dtype=jnp.float32, name="time_fc1")(te)
            te = nn.gelu(te)
            t_emb = nn.Dense(cfg.dim, dtype=cfg.dtype, param_dtype=jnp.float32, name="time_fc2")(te)

        dims = [x.shape[-1]] + [cfg.dim * m for m in cfg.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        n_res = len(in_out)

        hs = []
        for i, (din, dout) in enumerate(in_out):
            x = ConvNextBlock(dout, norm=i != 0, dtype=cfg.dtype, name=f"down{i}_block1")(x, t_emb)
            x = ConvNextBlock(dout, dtype=cfg.dtype, name=f"down{i}_block2")(x, t_emb)
            x = x + LinearAttention(dtype=cfg.dtype, name=f"down{i}_attn")(
                ChannelLayerNorm(name=f"down{i}_attn_norm")(x))
            hs.append(x)
            if i < n_res - 1:
                x = nn.Conv(dout, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)),
                            dtype=cfg.dtype, param_dtype=jnp.float32, name=f"down{i}_downsample")(x)

        mid = dims[-1]
        x = ConvNextBlock(mid, dtype=cfg.dtype, name="mid_block1")(x, t_emb)
        x = x + LinearAttention(dtype=cfg.dtype, name="mid_attn")(
            ChannelLayerNorm(name="mid_attn_norm")(x))
        x = ConvNextBlock(mid, dtype=cfg.dtype, name="mid_block2")(x, t_emb)

        # ups mirror the reference: concat skip (taken pre-downsample), two
        # blocks, attention, then a stride-2 transposed-conv upsample
        # (unet_convnext.py:181-189; the deepest skip is consumed first, the
        # stem-level skip is left unused exactly like the reference)
        for i, (din, dout) in enumerate(reversed(in_out[1:])):
            x = jnp.concatenate([x, hs.pop().astype(x.dtype)], axis=-1)
            x = ConvNextBlock(din, dtype=cfg.dtype, name=f"up{i}_block1")(x, t_emb)
            x = ConvNextBlock(din, dtype=cfg.dtype, name=f"up{i}_block2")(x, t_emb)
            x = x + LinearAttention(dtype=cfg.dtype, name=f"up{i}_attn")(
                ChannelLayerNorm(name=f"up{i}_attn_norm")(x))
            x = nn.ConvTranspose(din, (4, 4), strides=(2, 2), padding="SAME",
                                 dtype=cfg.dtype, param_dtype=jnp.float32,
                                 name=f"up{i}_upsample")(x)

        out_dim = cfg.out_dim or cfg.channels
        x = ConvNextBlock(cfg.dim, dtype=cfg.dtype, name="final_block")(x)
        out = Conv(out_dim, 1, dtype=cfg.dtype, name="final_conv")(x).astype(jnp.float32)

        if cfg.residual:
            return out + orig_x
        if cfg.output_mean_scale:
            out_mean = jnp.mean(out, axis=(1, 2, 3), keepdims=True)
            out = out - original_mean + out_mean
        return out
