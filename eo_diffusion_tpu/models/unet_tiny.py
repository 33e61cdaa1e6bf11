"""Tiny ShuffleNet-v2-style UNet (the CPU-runnable MNIST backbone).

Re-design of the reference ``backbones/unet_mnist.py`` (ShuffleNet
bottlenecks with channel split/shuffle, learned ``nn.Embedding`` timestep
table, no attention; unet_mnist.py:28-170). TPU-first changes:

* NHWC layout; channel split/shuffle become cheap reshapes on the lane axis;
* GroupNorm instead of BatchNorm -- batch statistics would need cross-device
  sync under data parallelism; GroupNorm is SPMD-free and matches the
  production backbone's normalizer;
* bilinear decoder upsampling kept (unet_mnist.py:108).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from eo_diffusion_tpu.nn.primitives import Conv, GroupNorm32

__all__ = ["TinyUNetConfig", "TinyUNet"]


@dataclasses.dataclass(frozen=True)
class TinyUNetConfig:
    timesteps: int = 1000
    time_embedding_dim: int = 128
    in_channels: int = 1
    out_channels: int = 1
    base_dim: int = 32
    dim_mults: Tuple[int, ...] = (2, 4)
    dtype: Any = jnp.float32

    def channels(self):
        dims = [self.base_dim] + [self.base_dim * m for m in self.dim_mults]
        return list(zip(dims[:-1], dims[1:]))


def _channel_shuffle(x: jax.Array, groups: int = 2) -> jax.Array:
    n, h, w, c = x.shape
    return x.reshape(n, h, w, groups, c // groups).transpose(0, 1, 2, 4, 3).reshape(n, h, w, c)


class ConvNormSiLU(nn.Module):
    features: int
    kernel: int = 1
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = Conv(self.features, self.kernel, self.stride, dtype=self.dtype, name="conv")(x)
        x = GroupNorm32(name="norm")(x)
        return nn.silu(x)


class DepthwiseConvNorm(nn.Module):
    kernel: int = 3
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        pad = (self.kernel - 1) // 2
        x = nn.Conv(c, (self.kernel, self.kernel), strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)), feature_group_count=c,
                    dtype=self.dtype, param_dtype=jnp.float32, name="dwconv")(x)
        return GroupNorm32(name="norm")(x)


class ResidualBottleneck(nn.Module):
    """ShuffleNet-v2 basic unit (unet_mnist.py:28-49): split, two branches,
    concat, shuffle."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x1, x2 = jnp.split(x, 2, axis=-1)
        b1 = DepthwiseConvNorm(dtype=self.dtype, name="branch1_dw")(x1)
        b1 = ConvNormSiLU(self.out_channels // 2, dtype=self.dtype, name="branch1_pw")(b1)
        b2 = ConvNormSiLU(x2.shape[-1], dtype=self.dtype, name="branch2_pw1")(x2)
        b2 = DepthwiseConvNorm(dtype=self.dtype, name="branch2_dw")(b2)
        b2 = ConvNormSiLU(self.out_channels // 2, dtype=self.dtype, name="branch2_pw2")(b2)
        return _channel_shuffle(jnp.concatenate([b1, b2], axis=-1))


class ResidualDownsample(nn.Module):
    """ShuffleNet-v2 downsample unit (unet_mnist.py:51-70)."""

    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = DepthwiseConvNorm(stride=2, dtype=self.dtype, name="branch1_dw")(x)
        b1 = ConvNormSiLU(self.out_channels // 2, dtype=self.dtype, name="branch1_pw")(b1)
        b2 = ConvNormSiLU(self.out_channels // 2, dtype=self.dtype, name="branch2_pw1")(x)
        b2 = DepthwiseConvNorm(stride=2, dtype=self.dtype, name="branch2_dw")(b2)
        b2 = ConvNormSiLU(self.out_channels // 2, dtype=self.dtype, name="branch2_pw2")(b2)
        return _channel_shuffle(jnp.concatenate([b1, b2], axis=-1))


class TimeMLP(nn.Module):
    """Add projected time embedding, then SiLU (unet_mnist.py:72-86)."""

    hidden_dim: int
    out_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, t_emb):
        h = nn.Dense(self.hidden_dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc1")(t_emb)
        h = nn.silu(h)
        h = nn.Dense(self.out_dim, dtype=self.dtype, param_dtype=jnp.float32, name="fc2")(h)
        return nn.silu(x + h[:, None, None, :].astype(x.dtype))


class TinyUNet(nn.Module):
    """forward(x [N,H,W,C], t [N]) -> [N,H,W,out] (reference Unet,
    unet_mnist.py:125-170)."""

    config: TinyUNetConfig

    @nn.compact
    def __call__(self, x, t, cond=None, y=None, *, train: bool = False):
        cfg = self.config
        channels = cfg.channels()
        if cond is not None:
            x = jnp.concatenate([x, cond.astype(x.dtype)], axis=-1)
        x = ConvNormSiLU(cfg.base_dim, 3, dtype=cfg.dtype, name="init_conv")(x.astype(cfg.dtype))
        # learned per-timestep embedding table (unet_mnist.py:137)
        t_emb = nn.Embed(cfg.timesteps, cfg.time_embedding_dim,
                         param_dtype=jnp.float32, name="time_embedding")(t)

        shortcuts = []
        for i, (cin, cout) in enumerate(channels):
            for j in range(3):
                x = ResidualBottleneck(cin, dtype=cfg.dtype, name=f"enc{i}_res{j}")(x)
            x = ResidualBottleneck(cout // 2, dtype=cfg.dtype, name=f"enc{i}_res3")(x)
            shortcuts.append(x)
            x = TimeMLP(cout, cout // 2, dtype=cfg.dtype, name=f"enc{i}_time")(x, t_emb)
            x = ResidualDownsample(cout, dtype=cfg.dtype, name=f"enc{i}_down")(x)

        mid_c = channels[-1][1]
        for j in range(2):
            x = ResidualBottleneck(mid_c, dtype=cfg.dtype, name=f"mid_res{j}")(x)
        x = ResidualBottleneck(mid_c // 2, dtype=cfg.dtype, name="mid_res2")(x)

        for i, (cin, cout) in enumerate(reversed(channels)):
            n, h, w, c = x.shape
            x = jax.image.resize(x, (n, h * 2, w * 2, c), "bilinear")
            x = jnp.concatenate([x, shortcuts.pop().astype(x.dtype)], axis=-1)
            cc = x.shape[-1]
            for j in range(3):
                x = ResidualBottleneck(cc, dtype=cfg.dtype, name=f"dec{i}_res{j}")(x)
            x = ResidualBottleneck(cc // 2, dtype=cfg.dtype, name=f"dec{i}_res3")(x)
            x = TimeMLP(cc, cc // 2, dtype=cfg.dtype, name=f"dec{i}_time")(x, t_emb)
            x = ResidualBottleneck(cin // 2, dtype=cfg.dtype, name=f"dec{i}_res4")(x)

        out = Conv(cfg.out_channels, 1, dtype=cfg.dtype, name="final_conv")(x)
        return out.astype(jnp.float32) if cfg.dtype != jnp.float32 else out
