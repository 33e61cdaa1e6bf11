"""Flow matching / rectified flow (beyond-reference training objective).

The reference trains only DDPM epsilon-MSE (diffusion/model.py:38-44). This
module adds the continuous-time objective of Lipman et al. ("Flow Matching
for Generative Modeling", arXiv:2210.02747) / Liu et al. rectified flow
(arXiv:2209.03003), the formulation production systems (SD3, Flux) have
moved to: a straight-line probability path

    x_t = (1 - t) * x0 + t * eps,   t in [0, 1]

with the network regressing the constant velocity ``v = eps - x0``. Sampling
integrates the ODE ``dx/dt = v(x, t)`` from t=1 (noise) to t=0 (data) with
Euler or Heun steps — typically 8-32 model calls, no schedule tables at all.

API mirrors ``GaussianDiffusion`` (same ``train_loss`` signature for
``train.trainer.make_train_step``, same ``DiffusionOutput`` + CFG /
stateful-model / ``log_every`` sampler surface), so the Trainer, DeepCache
and the CLIs compose without new plumbing. Timesteps are fed to the model
scaled by ``time_scale`` so the sinusoidal ``timestep_embedding`` operates
in the same numeric range the backbones were designed for.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from eo_diffusion_tpu.diffusion.gaussian import (
    DiffusionOutput,
    _log_frame,
    cfg_combine,
    cfg_double_inputs,
    interval_scale,
)

__all__ = ["FlowMatching"]

VelocityFn = Callable[..., jax.Array]


@dataclasses.dataclass(frozen=True)
class FlowMatching:
    """Rectified-flow process over [0, 1] with straight-line paths."""

    image_size: int
    in_channels: int
    cond_type: Optional[str] = None  # None | "concat" (cond passed to model)
    time_scale: float = 1000.0  # model-facing t = t * time_scale
    # SD3-style logit-normal time sampling concentrates training where the
    # task is hardest (mid-path); "uniform" is the plain FM objective.
    time_sampling: str = "uniform"  # "uniform" | "logit_normal"
    logit_norm_scale: float = 1.0

    @classmethod
    def create(cls, image_size: int = 64, in_channels: int = 3,
               cond_type: Optional[str] = None, **kw) -> "FlowMatching":
        return cls(image_size=image_size, in_channels=in_channels,
                   cond_type=cond_type, **kw)

    # -- training -----------------------------------------------------------

    def _sample_t(self, rng: jax.Array, n: int) -> jax.Array:
        if self.time_sampling == "logit_normal":
            z = jax.random.normal(rng, (n,), jnp.float32) * self.logit_norm_scale
            return jax.nn.sigmoid(z)
        assert self.time_sampling == "uniform", self.time_sampling
        return jax.random.uniform(rng, (n,), jnp.float32)

    def training_tuple(
        self,
        rng: jax.Array,
        x0: jax.Array,
        noise: Optional[jax.Array] = None,
    ):
        """Draw one training instance: ``(x_t, t_model, target)`` with
        ``loss = mean((model(x_t, t_model) - target)^2)`` — the exact
        decomposition ``train_loss`` computes, exposed so schedulers that
        must own the MSE themselves (the 1F1B pipeline trainer's
        per-microbatch loss head, parallel/pipeline_train.py) draw the same
        (t, eps) as the fused path."""
        t_rng, n_rng = jax.random.split(rng)
        n = x0.shape[0]
        t = self._sample_t(t_rng, n)
        eps = (noise.astype(jnp.float32) if noise is not None
               else jax.random.normal(n_rng, x0.shape, jnp.float32))
        x0f = x0.astype(jnp.float32)
        tb = t[:, None, None, None]
        x_t = (1.0 - tb) * x0f + tb * eps
        return x_t.astype(x0.dtype), t * self.time_scale, eps - x0f

    def train_loss(
        self,
        model_fn: VelocityFn,
        rng: jax.Array,
        x0: jax.Array,
        cond: Optional[jax.Array] = None,
        y: Optional[jax.Array] = None,
        noise: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Conditional flow-matching MSE: ||model(x_t, t) - (eps - x0)||^2.

        ``noise`` pins the endpoint pairing instead of drawing fresh eps:
        with (x0, noise) generated as teacher ODE couplings this is exactly
        the ReFlow objective (Liu et al., arXiv:2209.03003 §3.2) that
        straightens the flow for few-step sampling — see
        ``diffusion/distill.py``."""
        x_t, t_model, target = self.training_tuple(rng, x0, noise)
        pred = model_fn(x_t, t_model, cond, y)
        return jnp.mean((pred.astype(jnp.float32) - target) ** 2)

    # -- sampling -----------------------------------------------------------

    def sample(
        self,
        model_fn: VelocityFn,
        rng: jax.Array,
        n_samples: int,
        num_steps: int = 32,
        method: str = "euler",  # "euler" | "heun"
        cond: Optional[jax.Array] = None,
        y: Optional[jax.Array] = None,
        x_T: Optional[jax.Array] = None,
        guidance_scale: float = 1.0,
        guidance_rescale: float = 0.0,
        guidance_interval: Optional[Tuple[float, float]] = None,
        uncond: Optional[jax.Array] = None,
        y_uncond: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
        x0: Optional[jax.Array] = None,
        log_every: Optional[int] = None,
        dtype=jnp.float32,
        model_state: Any = None,
        start_index: Optional[int] = None,
    ) -> DiffusionOutput:
        """Integrate the velocity ODE from t=1 to t=0 in one ``lax.scan``.

        ``start_index=k`` integrates only the LAST k intervals of the
        ``num_steps``-interval grid, i.e. from t = k/num_steps (static; the
        SDEdit partial chain, diffusion/edit.py — pair with an ``x_T`` on
        the straight-line path at that time). Grid spacing is unchanged.

        Heun (2nd-order) halves the step-count needed for a given error at
        2 model calls/step; with CFG, cond/uncond ride one doubled batch
        exactly like ``GaussianDiffusion.ddim_sample``.

        ``mask``/``x0``: RePaint-style inpainting on the flow path — before
        each step the known region (mask == 1) is re-placed on the
        straight-line path at the current time, ``(1-t)*x0 + t*eps``, and
        composited in (the flow analog of the reference's DDPM re-noising
        composite, model.py:58-60; exact on this path because the marginal
        at time t IS the linear interpolation). The model stays
        unconditional, matching ``cond_type="sum"`` semantics.
        """
        assert method in ("euler", "heun"), method
        if mask is not None:
            assert x0 is not None, "flow inpainting requires x0 (known image)"
        shape = (n_samples, self.image_size, self.image_size, self.in_channels)
        x = (x_T.astype(jnp.float32) if x_T is not None
             else jax.random.normal(rng, shape, jnp.float32))

        # uniform grid t_i: 1 -> 0 inclusive (num_steps intervals); with
        # start_index=k only the tail of the SAME grid runs (t = k/num_steps
        # down to 0, identical spacing)
        start = num_steps if start_index is None else int(start_index)
        assert 1 <= start <= num_steps, (
            f"start_index {start_index} outside the {num_steps}-interval grid")
        ts = jnp.linspace(start / num_steps, 0.0, start + 1)
        stateful = model_state is not None
        n_frames = -(-start // log_every) if log_every else 0

        def call_model(xx, t_scalar, st, i):
            tt = jnp.full((xx.shape[0],), t_scalar * self.time_scale, jnp.float32)
            x_in, t_in, c_in, y_in, doubled = cfg_double_inputs(
                xx, tt, cond, y, uncond, y_uncond, guidance_scale)
            if stateful:
                out, st = model_fn(x_in, t_in, c_in, y_in, st, i)
            else:
                out = model_fn(x_in, t_in, c_in, y_in)
            if doubled:
                out = cfg_combine(
                    out,
                    interval_scale(guidance_scale, t_scalar,
                                   guidance_interval),
                    guidance_rescale)
            return out.astype(jnp.float32), st

        mask_rng = jax.random.fold_in(rng, 7)

        def step(carry, i):
            x, frames, st = carry
            t_i, t_next = ts[i], ts[i + 1]
            dt = t_next - t_i  # negative: integrating toward data
            if mask is not None:
                eps = jax.random.normal(jax.random.fold_in(mask_rng, i),
                                        shape, jnp.float32)
                known = (1.0 - t_i) * x0.astype(jnp.float32) + t_i * eps
                x = mask * known + (1.0 - mask) * x
            v1, st = call_model(x.astype(dtype), t_i, st, i)
            if method == "heun":
                # final step (t_next == 0): Euler — the standard convention;
                # lax.cond actually skips the second model call there (at
                # 8-step Heun that's 1/16th of the sampling compute)
                def _heun(st):
                    x_pred = x + dt * v1
                    v2, st = call_model(x_pred.astype(dtype), t_next, st, i)
                    return 0.5 * (v1 + v2), st

                v, st = jax.lax.cond(
                    jnp.equal(i, start - 1),
                    lambda st: (v1, st), _heun, st)
            else:
                v = v1
            x = x + dt * v
            if log_every:
                frames = _log_frame(frames, x.astype(dtype), i, log_every)
            return (x, frames, st), None

        frames0 = (jnp.zeros((n_frames,) + shape, dtype) if log_every
                   else jnp.zeros((), dtype))
        state0 = model_state if stateful else jnp.zeros((), dtype)
        (x, frames, _), _ = jax.lax.scan(
            step, (x, frames0, state0), jnp.arange(start))
        if mask is not None:
            # final paste: at t=0 the known region is exactly x0 (the last
            # in-loop composite happened at t > 0; RePaint semantics keep
            # the known pixels verbatim, like the DPM solver's final paste)
            x = mask * x0.astype(jnp.float32) + (1.0 - mask) * x
        return DiffusionOutput(x=x, intermediates=frames if log_every else None)
