"""SDEdit: guided editing/synthesis by partial noising (arXiv:2108.01073).

Noise a source image part-way up the forward process and run only the tail
of the reverse chain: low ``strength`` keeps the source's structure (edit /
refine), strength 1.0 recovers ordinary sampling. The reference has no
editing entry point at all — its closest capability is RePaint mask
compositing (reference diffusion/model.py:58-60), which needs a mask;
SDEdit needs only the source image, which makes it the natural tool for the
EO synthetic-to-real / style-transfer use-cases (e.g. refine a simulated or
degraded scene with a model trained on clean imagery).

TPU shape: the partial chain is the SAME single ``lax.scan`` as full
sampling, just statically truncated (``start_index`` on
:meth:`GaussianDiffusion.ddim_sample` / :meth:`FlowMatching.sample`), so
each strength value is one compiled program with no data-dependent control
flow. Works through :class:`LatentDiffusion` unchanged (the source rides
the first-stage encoder; the truncated chain runs on the latent grid).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from eo_diffusion_tpu.core.schedules import make_ddim_schedule
from eo_diffusion_tpu.diffusion.gaussian import DiffusionOutput, GaussianDiffusion

__all__ = ["sdedit_plan", "sdedit_sample"]


def sdedit_plan(num_steps: int, strength: float) -> int:
    """Static step count for the truncated chain.

    ``strength`` in (0, 1]: the fraction of the reverse chain to run
    (SDEdit's t0; arXiv:2108.01073 §3 — 0.3-0.6 edits, ~0.7+ regenerates).
    """
    assert 0.0 < strength <= 1.0, f"strength {strength} outside (0, 1]"
    return int(np.clip(round(strength * num_steps), 1, num_steps))


def sdedit_sample(
    diffusion: Any,
    model_fn: Callable,
    rng: jax.Array,
    source: jax.Array,
    strength: float,
    num_steps: int = 50,
    eta: float = 0.0,
    method: str = "uniform",
    **kw,
) -> DiffusionOutput:
    """Edit ``source`` by noising to ``strength`` and denoising back.

    ``diffusion`` may be a :class:`GaussianDiffusion` (DDIM tail), a
    :class:`FlowMatching` (Euler/Heun tail over the straight-line
    interpolant), or a :class:`LatentDiffusion` wrapping either.  Extra
    ``kw`` (cond/y/guidance/model_state/...) flow to the underlying
    sampler, so SDEdit composes with CFG, DeepCache and conditioning.

    ``method`` is the DDIM spacing ("uniform"/"quad"/"trailing") on DDPM
    chains and the integrator ("euler"/"heun") on flow processes.
    """
    is_latent = hasattr(diffusion, "encode")  # LatentDiffusion duck-type
    inner = diffusion.diffusion if is_latent else diffusion
    src = diffusion.encode(source) if is_latent else source
    src = src.astype(jnp.float32)
    n = src.shape[0]

    noise_rng, chain_rng = jax.random.split(rng)
    noise = jax.random.normal(noise_rng, src.shape, jnp.float32)

    if isinstance(inner, GaussianDiffusion):
        dd = make_ddim_schedule(inner.schedule, num_steps, eta, method)
        k = sdedit_plan(dd.num_steps, strength)
        t_enc = jnp.full((n,), int(dd.timesteps[k - 1]), jnp.int32)
        x_T = inner.q_sample(src, t_enc, noise)
        return diffusion.ddim_sample(
            model_fn, chain_rng, n, num_steps=num_steps, eta=eta,
            method=method, x_T=x_T, start_index=k, **kw)

    # flow processes: the marginal at time t IS the straight-line point
    # (1-t)*x0 + t*eps, so the partial start is exact (flow.py mask path)
    if method == "uniform":  # DDIM-spacing default -> flow integrator default
        method = "euler"
    k = sdedit_plan(num_steps, strength)
    t_enc = k / num_steps
    x_T = (1.0 - t_enc) * src + t_enc * noise
    return diffusion.sample(
        model_fn, chain_rng, n, num_steps=num_steps, method=method,
        x_T=x_T, start_index=k, **kw)
