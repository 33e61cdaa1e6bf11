"""First-stage autoencoders for latent diffusion.

The LatentDiffusion capability slot of the reference's vendored CompVis DDPM
(``diffusion/ddpm.py:628-692``: first-stage VAE/VQ encode-decode) --
re-designed as a small pluggable interface: anything with
``encode(x) -> z`` / ``decode(z) -> x`` works as a first stage
(:class:`ConvAutoencoder` here, or an externally trained VAE).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from eo_diffusion_tpu.nn.primitives import Conv, GroupNorm32, nearest_upsample_2d

__all__ = ["AutoencoderConfig", "ConvAutoencoder"]


@dataclasses.dataclass(frozen=True)
class AutoencoderConfig:
    in_channels: int = 3
    latent_channels: int = 4
    base_channels: int = 64
    num_down: int = 2  # spatial reduction = 2**num_down
    dtype: Any = jnp.float32


class ConvAutoencoder(nn.Module):
    """Small convolutional AE: stride-2 conv encoder, nearest-up decoder.

    ``apply(params, x)`` autoencodes; ``apply(params, x, method="encode")``
    / ``method="decode"`` give the two halves (the CompVis
    encode_first_stage / decode_first_stage split, ddpm.py:954, 834).
    """

    config: AutoencoderConfig

    def setup(self):
        cfg = self.config
        ch = cfg.base_channels
        self.enc_stem = Conv(ch, 3, dtype=cfg.dtype, name="enc_stem")
        enc_norms, enc_downs = [], []
        for i in range(cfg.num_down):
            enc_norms.append(GroupNorm32(name=f"enc_norm{i}"))
            enc_downs.append(Conv(ch * 2, 3, stride=2, dtype=cfg.dtype, name=f"enc_down{i}"))
            ch *= 2
        self.enc_norms, self.enc_downs = enc_norms, enc_downs
        self.enc_norm_out = GroupNorm32(name="enc_norm_out")
        self.enc_out = Conv(cfg.latent_channels, 1, dtype=cfg.dtype, name="enc_out")

        self.dec_stem = Conv(ch, 3, dtype=cfg.dtype, name="dec_stem")
        dec_norms, dec_ups = [], []
        for i in range(cfg.num_down):
            dec_norms.append(GroupNorm32(name=f"dec_norm{i}"))
            ch //= 2
            dec_ups.append(Conv(ch, 3, dtype=cfg.dtype, name=f"dec_up{i}"))
        self.dec_norms, self.dec_ups = dec_norms, dec_ups
        self.dec_norm_out = GroupNorm32(name="dec_norm_out")
        self.dec_out = Conv(cfg.in_channels, 3, dtype=cfg.dtype, name="dec_out")

    def encode(self, x: jax.Array) -> jax.Array:
        h = self.enc_stem(x.astype(self.config.dtype))
        for norm, down in zip(self.enc_norms, self.enc_downs):
            h = down(nn.silu(norm(h)))
        return self.enc_out(nn.silu(self.enc_norm_out(h)))

    def decode(self, z: jax.Array) -> jax.Array:
        h = self.dec_stem(z.astype(self.config.dtype))
        for norm, up in zip(self.dec_norms, self.dec_ups):
            h = up(nearest_upsample_2d(nn.silu(norm(h))))
        return self.dec_out(nn.silu(self.dec_norm_out(h))).astype(jnp.float32)

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.decode(self.encode(x))
