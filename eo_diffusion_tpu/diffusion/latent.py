"""Latent diffusion: run the diffusion process in a first-stage latent space.

Re-design of the CompVis ``LatentDiffusion`` capability (reference
``diffusion/ddpm.py:628-692, 954, 834``): images are encoded by a (frozen)
first stage, the GaussianDiffusion trains/samples in latent space, samples
decode back to pixels. Conditioning images ride the same encoder.

Functional shape: :class:`LatentDiffusion` holds the inner
:class:`GaussianDiffusion` (sized to the latent grid) plus ``encode_fn`` /
``decode_fn`` closures, so the same jitted samplers/trainers work unchanged
on latents. It duck-types the ``GaussianDiffusion`` surface the
:class:`~eo_diffusion_tpu.train.trainer.Trainer` touches (``train_loss``,
``ddpm/ddim/dpm_sample``, ``cond_type``, ``in_channels``, ``image_size``),
so ``Trainer(cfg, unet, latent_diffusion, ...)`` trains in latent space and
its periodic previews decode to pixels automatically.
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
    :param cond_via_encoder: default for the per-call ``encode_cond`` --
        ``True`` routes concat conditioning images through the first stage
        (the CompVis cond-stage-is-first-stage mode, ddpm.py:954), which is
        what the latent CLIs use; callers can still override per call.
    """

    diffusion: GaussianDiffusion
    encode_fn: Callable
    decode_fn: Callable
    scale_factor: float = 1.0
    cond_via_encoder: bool = False

    # -- GaussianDiffusion surface delegation (latent-space sizes) -----------

    @property
    def cond_type(self) -> Optional[str]:
        return self.diffusion.cond_type

    @property
    def in_channels(self) -> int:
        return self.diffusion.in_channels

    @property
    def image_size(self) -> int:
        return self.diffusion.image_size

    @property
    def timesteps(self) -> int:
        return self.diffusion.timesteps

    def encode(self, x: jax.Array) -> jax.Array:
        return self.encode_fn(x) * self.scale_factor

    def decode(self, z: jax.Array) -> jax.Array:
        return self.decode_fn(z / self.scale_factor)

    def _cond(self, cond, encode_cond: Optional[bool]):
        ec = self.cond_via_encoder if encode_cond is None else encode_cond
        return self.encode(cond) if (cond is not None and ec) else cond

    def train_loss(self, model_fn, rng, x0, cond: Optional[jax.Array] = None,
                   y=None, encode_cond: Optional[bool] = None,
                   noise: Optional[jax.Array] = None):
        """Epsilon/x0/v loss in latent space; ``encode_cond=True`` passes the
        conditioning image through the first stage too (LatentDiffusion's
        concat-mode cond encoding, ddpm.py:954). ``noise`` (latent-shaped)
        pins the eps pairing for distillation batches (diffusion/distill.py)."""
        z0 = self.encode(x0)
        c = self._cond(cond, encode_cond)
        return self.diffusion.train_loss(model_fn, rng, z0, cond=c, y=y,
                                         noise=noise)

    def _decode_out(self, out: DiffusionOutput) -> DiffusionOutput:
        """Decode the final x AND any logged trajectory frames: a caller
        paying for ``log_every`` gets pixel-space intermediates, not the
        silently-dropped (or raw-latent) frames of the inner sampler."""
        inter = out.intermediates
        if inter is not None and inter.ndim == 5:  # [K, N, h, w, zc]
            k, n = inter.shape[:2]
            flat = self.decode(inter.reshape((k * n,) + inter.shape[2:]))
            inter = flat.reshape((k, n) + flat.shape[1:])
        return DiffusionOutput(x=self.decode(out.x), intermediates=inter)

    def ddpm_sample(self, model_fn, rng, n_samples, cond=None, y=None,
                    encode_cond: Optional[bool] = None, **kw) -> DiffusionOutput:
        c = self._cond(cond, encode_cond)
        out = self.diffusion.ddpm_sample(model_fn, rng, n_samples, cond=c, y=y, **kw)
        return self._decode_out(out)

    def ddim_sample(self, model_fn, rng, n_samples, cond=None, y=None,
                    encode_cond: Optional[bool] = None, uncond=None,
                    **kw) -> DiffusionOutput:
        c = self._cond(cond, encode_cond)
        # the CFG uncond image rides the first stage exactly like cond
        u = self._cond(uncond, encode_cond)
        out = self.diffusion.ddim_sample(model_fn, rng, n_samples, cond=c, y=y,
                                         uncond=u, **kw)
        return self._decode_out(out)

    def dpm_sample(self, model_fn, rng, n_samples, cond=None, y=None,
                   encode_cond: Optional[bool] = None, uncond=None,
                   **kw) -> DiffusionOutput:
        c = self._cond(cond, encode_cond)
        # the CFG uncond image rides the first stage exactly like cond
        # (cond-stage-is-first-stage applies to both guidance branches)
        u = self._cond(uncond, encode_cond)
        out = self.diffusion.dpm_sample(model_fn, rng, n_samples, cond=c, y=y,
                                    uncond=u, **kw)
        return self._decode_out(out)

    def unipc_sample(self, model_fn, rng, n_samples, cond=None, y=None,
                     encode_cond: Optional[bool] = None, uncond=None,
                     **kw) -> DiffusionOutput:
        c = self._cond(cond, encode_cond)
        u = self._cond(uncond, encode_cond)
        out = self.diffusion.unipc_sample(model_fn, rng, n_samples, cond=c,
                                          y=y, uncond=u, **kw)
        return self._decode_out(out)

    def sample(self, model_fn, rng, n_samples, cond=None, y=None,
               encode_cond: Optional[bool] = None, uncond=None,
               **kw) -> DiffusionOutput:
        """Native-sampler delegation: when the inner process exposes
        ``.sample`` (latent rectified flow, EDM, or the latent Brownian
        bridge — all beyond the reference's pixel/DDPM-only
        LatentDiffusion), integrate in latent space and decode."""
        c = self._cond(cond, encode_cond)
        if uncond is not None:
            # only CFG-capable processes take uncond (the bridge doesn't)
            kw["uncond"] = self._cond(uncond, encode_cond)
        out = self.diffusion.sample(model_fn, rng, n_samples, cond=c, y=y,
                                    **kw)
        return self._decode_out(out)
