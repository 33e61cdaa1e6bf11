"""Autoguidance: guide a diffusion model with a worse version of itself
(Karras et al. 2024, arXiv:2406.02507).

Beyond-reference guidance family. Classifier-free guidance needs a
conditional/unconditional pair trained with label dropout; autoguidance
instead extrapolates away from a DEGRADED variant of the same model —
shorter EMA, earlier checkpoint, fewer params — which sharpens samples
*without any conditioning signal at all* (the reference's EO use-cases are
mostly unconditional, exactly where CFG does not apply).

    D_guided = D_bad + w * (D_main - D_bad),   w > 1

The pairing here is deliberate: post-hoc EMA (train/posthoc_ema.py) can
synthesize a short-EMA (low sigma_rel) variant of any run AFTER training
from the stored power-EMA snapshots — so the "bad" model costs nothing to
obtain (`--autoguide_sigma_rel` in cli/inference.py), per the paper's
EMA-length degradation recipe (§3.3).

Implemented as a *denoiser wrapper*, not a sampler change: every sampler
already takes an arbitrary ``model_fn``, so the two-model combine slots in
front of ddpm/ddim/dpm/unipc/flow/edm (and composes with RePaint, SDEdit,
DeepCache-free paths) with zero new plumbing — the same shape as
classifier guidance (diffusion/classifier_guidance.py). The two
evaluations run sequentially inside the jitted scan; XLA overlaps what it
can (they are independent), and params for both variants ride as ordinary
jit arguments.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax.numpy as jnp

from eo_diffusion_tpu.diffusion.gaussian import interval_scale

__all__ = ["autoguided_model_fn"]


def autoguided_model_fn(
    fn_main: Callable,
    fn_bad: Callable,
    scale: float,
    guidance_rescale: float = 0.0,
    guidance_interval: Optional[Tuple[float, float]] = None,
    timesteps: int = 1000,
    noise_frac_fn: Optional[Callable] = None,
) -> Callable:
    """Wrap two denoisers into the autoguided one.

    ``fn_main``/``fn_bad``: ``(x, t, cond, y) -> pred`` (same output
    parameterization — eps/x0/v all combine identically since the map is
    affine). ``guidance_rescale``/``guidance_interval`` mirror the CFG
    combine's refinements (arXiv:2305.08891 §3.4 / arXiv:2404.07724).

    The interval gate needs the NORMALIZED noise level, but the wrapper
    only sees the model-facing ``t``, whose meaning is process-specific
    (chain index for DDPM, ``t * time_scale`` for flow, ``ln(sigma)/4 *
    time_scale`` for EDM). ``noise_frac_fn(t) -> frac in [0, 1]`` supplies
    the process's inversion; the default ``t[0]/(timesteps-1)`` is only
    correct for DDPM-chain samplers (cli/inference.py builds the right one
    per preset.process).
    """
    assert scale >= 1.0, scale

    def fn(x, t, cond=None, y=None):
        e_m = fn_main(x, t, cond, y).astype(jnp.float32)
        e_b = fn_bad(x, t, cond, y).astype(jnp.float32)
        frac = (noise_frac_fn(t) if noise_frac_fn is not None
                else t[0] / max(timesteps - 1, 1))
        eff = interval_scale(scale, frac, guidance_interval)
        guided = e_b + eff * (e_m - e_b)
        if guidance_rescale:
            axes = tuple(range(1, guided.ndim))
            std_m = jnp.std(e_m, axis=axes, keepdims=True)
            std_g = jnp.std(guided, axis=axes, keepdims=True)
            fixed = guided * (std_m / jnp.maximum(std_g, 1e-8))
            guided = (guidance_rescale * fixed
                      + (1.0 - guidance_rescale) * guided)
        return guided

    return fn
