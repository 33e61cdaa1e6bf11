"""Latent diffusion: run the diffusion process in a first-stage latent space.

Re-design of the CompVis ``LatentDiffusion`` capability (reference
``diffusion/ddpm.py:628-692, 954, 834``): images are encoded by a (frozen)
first stage, the GaussianDiffusion trains/samples in latent space, samples
decode back to pixels. Conditioning images ride the same encoder.

Functional shape: :class:`LatentDiffusion` holds the inner
:class:`GaussianDiffusion` (sized to the latent grid) plus ``encode_fn`` /
``decode_fn`` closures, so the same jitted samplers/trainers work unchanged
on latents.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax

from eo_diffusion_tpu.diffusion.gaussian import DiffusionOutput, GaussianDiffusion

__all__ = ["LatentDiffusion"]


@dataclasses.dataclass(frozen=True)
class LatentDiffusion:
    """Diffusion over ``encode_fn`` latents with pixel-space decode.

    :param diffusion: inner process sized to the LATENT grid
        (image_size = pixel_size / 2**num_down, in_channels = latent_channels).
    :param encode_fn: x [N,H,W,C] -> z [N,h,w,zc]
    :param decode_fn: z -> x
    :param scale_factor: latent scaling (CompVis scale_factor; 1/std of
        latents keeps the SNR schedule calibrated).
    """

    diffusion: GaussianDiffusion
    encode_fn: Callable
    decode_fn: Callable
    scale_factor: float = 1.0

    def encode(self, x: jax.Array) -> jax.Array:
        return self.encode_fn(x) * self.scale_factor

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decode_fn(z / self.scale_factor)

    def train_loss(self, model_fn, rng, x0, cond: Optional[jax.Array] = None,
                   y=None, encode_cond: bool = False):
        """Epsilon/x0/v loss in latent space; ``encode_cond=True`` passes the
        conditioning image through the first stage too (LatentDiffusion's
        concat-mode cond encoding, ddpm.py:954)."""
        z0 = self.encode(x0)
        c = self.encode(cond) if (cond is not None and encode_cond) else cond
        return self.diffusion.train_loss(model_fn, rng, z0, cond=c, y=y)

    def ddpm_sample(self, model_fn, rng, n_samples, cond=None, y=None,
                    encode_cond: bool = False, **kw) -> DiffusionOutput:
        c = self.encode(cond) if (cond is not None and encode_cond) else cond
        out = self.diffusion.ddpm_sample(model_fn, rng, n_samples, cond=c, y=y, **kw)
        return DiffusionOutput(x=self.decode(out.x), intermediates=out.intermediates)

    def ddim_sample(self, model_fn, rng, n_samples, cond=None, y=None,
                    encode_cond: bool = False, **kw) -> DiffusionOutput:
        c = self.encode(cond) if (cond is not None and encode_cond) else cond
        out = self.diffusion.ddim_sample(model_fn, rng, n_samples, cond=c, y=y, **kw)
        return DiffusionOutput(x=self.decode(out.x))
