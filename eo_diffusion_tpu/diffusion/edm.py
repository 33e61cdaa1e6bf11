"""EDM: the Karras et al. 2022 diffusion formulation (beyond-reference).

"Elucidating the Design Space of Diffusion-Based Generative Models"
(arXiv:2206.00364) reframes diffusion in sigma space with an explicitly
preconditioned denoiser

    D(x; sigma) = c_skip(sigma) x + c_out(sigma) F(c_in(sigma) x, c_noise)

    c_skip = sd^2/(sigma^2+sd^2)      c_out = sigma sd / sqrt(sigma^2+sd^2)
    c_in   = 1/sqrt(sigma^2+sd^2)     c_noise = ln(sigma)/4

trained at log-normally sampled noise levels with weight
``lambda(sigma) = (sigma^2+sd^2)/(sigma sd)^2``, and sampled on the rho=7
Karras sigma grid with a deterministic 2nd-order Heun integrator plus
optional stochastic churn. The reference has only the cosine DDPM chain
(diffusion/model.py:87-92); EDM completes this framework's process-family
matrix (DDPM chain / rectified flow / EDM) — it is the formulation behind
the Stable Diffusion "Karras" samplers and most current pixel-space SOTA.

TPU notes: ``lambda(sigma) * c_out(sigma)^2 == 1`` identically, so the
weighted EDM loss IS a plain MSE on the raw network output against
``(x0 - c_skip x_t)/c_out`` — meaning ``training_tuple`` exposes the same
(x_t, t_model, target) decomposition every other process here exposes and
the whole Trainer stack (fused EMA step, grad-accum, FSDP/TP, the 1F1B
pipeline's per-microbatch loss head) composes without new plumbing. The
sampler is one ``lax.scan`` over the sigma grid like every other sampler
in this framework; CFG rides the shared batch-doubling helpers.

API mirrors ``FlowMatching`` (train_loss / training_tuple / sample), so
presets with ``process="edm"`` flow through the CLIs on the existing
ODE-sampler branch.
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

__all__ = ["EDMProcess", "karras_sigmas"]

DenoiseFn = Callable[..., jax.Array]


def karras_sigmas(num_steps: int, sigma_min: float, sigma_max: float,
                  rho: float) -> jnp.ndarray:
    """The rho-warped sigma grid (arXiv:2206.00364 eq. 5), descending, with
    the terminal 0 appended: shape [num_steps + 1]."""
    i = jnp.arange(num_steps, dtype=jnp.float32)
    lo, hi = sigma_min ** (1.0 / rho), sigma_max ** (1.0 / rho)
    sig = (hi + i / jnp.maximum(num_steps - 1, 1) * (lo - hi)) ** rho
    return jnp.concatenate([sig, jnp.zeros((1,), jnp.float32)])


@dataclasses.dataclass(frozen=True)
class EDMProcess:
    """Sigma-space diffusion with EDM preconditioning."""

    image_size: int
    in_channels: int
    cond_type: Optional[str] = None  # None | "concat"
    sigma_data: float = 0.5
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    rho: float = 7.0
    # training sigma distribution: ln(sigma) ~ N(p_mean, p_std^2) (table 1)
    p_mean: float = -1.2
    p_std: float = 1.2
    # model-facing t = c_noise * time_scale: c_noise = ln(sigma)/4 spans
    # roughly [-1.6, 1.1] over [sigma_min, sigma_max]; scaling by ~250 puts
    # it in the range the sinusoidal timestep_embedding resolves well
    time_scale: float = 250.0

    @classmethod
    def create(cls, image_size: int = 64, in_channels: int = 3,
               cond_type: Optional[str] = None, **kw) -> "EDMProcess":
        return cls(image_size=image_size, in_channels=in_channels,
                   cond_type=cond_type, **kw)

    # -- preconditioning ----------------------------------------------------

    def _coeffs(self, sigma: jax.Array):
        """(c_skip, c_in, c_out, t_model) for per-sample sigma [N]."""
        sd2 = self.sigma_data ** 2
        den = sigma**2 + sd2
        c_skip = sd2 / den
        c_out = sigma * self.sigma_data * jax.lax.rsqrt(den)
        c_in = jax.lax.rsqrt(den)
        t_model = jnp.log(jnp.maximum(sigma, 1e-20)) / 4.0 * self.time_scale
        return c_skip, c_in, c_out, t_model

    # -- training -----------------------------------------------------------

    def training_tuple(self, rng: jax.Array, x0: jax.Array,
                       noise: Optional[jax.Array] = None):
        """(x_model_in, t_model, target) with loss = plain MSE.

        ``lambda(sigma) c_out(sigma)^2 = 1`` collapses the weighted EDM loss
        to ``||F(c_in x_t, c_noise) - (x0 - c_skip x_t)/c_out||^2`` — raw
        network output vs an sigma-dependent target, unit weight. Same
        contract as the other processes' training_tuple (the 1F1B loss head
        consumes it unchanged)."""
        s_rng, n_rng = jax.random.split(rng)
        n = x0.shape[0]
        x0f = x0.astype(jnp.float32)
        sigma = jnp.exp(self.p_mean
                        + self.p_std * jax.random.normal(s_rng, (n,),
                                                         jnp.float32))
        eps = (noise.astype(jnp.float32) if noise is not None
               else jax.random.normal(n_rng, x0.shape, jnp.float32))
        sb = sigma[:, None, None, None]
        x_t = x0f + sb * eps
        c_skip, c_in, c_out, t_model = self._coeffs(sigma)
        cb = lambda v: v[:, None, None, None]
        target = (x0f - cb(c_skip) * x_t) / cb(c_out)
        return (cb(c_in) * x_t).astype(x0.dtype), t_model, target

    def train_loss(self, model_fn: DenoiseFn, rng: jax.Array, x0: jax.Array,
                   cond: Optional[jax.Array] = None,
                   y: Optional[jax.Array] = None,
                   noise: Optional[jax.Array] = None) -> jax.Array:
        x_in, t_model, target = self.training_tuple(rng, x0, noise)
        pred = model_fn(x_in, t_model, cond, y)
        return jnp.mean((pred.astype(jnp.float32) - target) ** 2)

    # -- sampling -----------------------------------------------------------

    def sample(
        self,
        model_fn: DenoiseFn,
        rng: jax.Array,
        n_samples: int,
        num_steps: int = 18,
        method: str = "heun",  # "euler" | "heun"
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
        s_churn: float = 0.0,
        s_noise: float = 1.0,
        s_tmin: float = 0.05,
        s_tmax: float = 50.0,
    ) -> DiffusionOutput:
        """Algorithm 2 of arXiv:2206.00364 as one ``lax.scan``: Heun steps
        on the Karras grid with optional churn (``s_churn > 0`` re-injects
        noise inside [s_tmin, s_tmax] — the stochastic sampler).

        ``mask``/``x0``: RePaint-style inpainting — the known region is
        re-noised to the current sigma (``x0 + sigma eps``, the exact
        marginal of the EDM forward) and composited before each step,
        keeping ``cond_type='sum'`` semantics uniform across the DDPM
        chain, the flow ODE, and EDM.
        """
        assert method in ("euler", "heun"), method
        if mask is not None:
            assert x0 is not None, "EDM inpainting requires x0 (known image)"
        shape = (n_samples, self.image_size, self.image_size,
                 self.in_channels)
        sigmas = karras_sigmas(num_steps, self.sigma_min, self.sigma_max,
                               self.rho)
        init_rng, churn_rng, mask_rng = jax.random.split(rng, 3)
        x = (x_T.astype(jnp.float32) if x_T is not None
             else sigmas[0] * jax.random.normal(init_rng, shape, jnp.float32))
        stateful = model_state is not None
        n_frames = -(-num_steps // log_every) if log_every else 0

        def denoise(xx, sigma_scalar, st, i):
            """D(x; sigma) via the preconditioned network, CFG-combined."""
            sig = jnp.full((xx.shape[0],), sigma_scalar, jnp.float32)
            c_skip, c_in, c_out, t_model = self._coeffs(sig)
            cb = lambda v: v[:, None, None, None]
            x_model = (cb(c_in) * xx).astype(dtype)
            x_in, t_in, c_in_arg, y_in, doubled = cfg_double_inputs(
                x_model, t_model, cond, y, uncond, y_uncond, guidance_scale)
            if stateful:
                out, st = model_fn(x_in, t_in, c_in_arg, y_in, st, i)
            else:
                out = model_fn(x_in, t_in, c_in_arg, y_in)
            if doubled:
                # D is affine in F, so combining raw outputs == combining Ds
                out = cfg_combine(
                    out,
                    interval_scale(guidance_scale,
                                   sigma_scalar / self.sigma_max,
                                   guidance_interval),
                    guidance_rescale)
            return cb(c_skip) * xx + cb(c_out) * out.astype(jnp.float32), st

        def step(carry, i):
            x, frames, st = carry
            sig, sig_next = sigmas[i], sigmas[i + 1]
            if mask is not None:
                eps = jax.random.normal(jax.random.fold_in(mask_rng, i),
                                        shape, jnp.float32)
                known = x0.astype(jnp.float32) + sig * eps
                x = mask * known + (1.0 - mask) * x
            if s_churn > 0.0:
                gamma = jnp.where(
                    (sig >= s_tmin) & (sig <= s_tmax),
                    jnp.minimum(s_churn / num_steps, jnp.sqrt(2.0) - 1.0),
                    0.0)
                sig_hat = sig * (1.0 + gamma)
                dn = jax.random.normal(jax.random.fold_in(churn_rng, i),
                                       shape, jnp.float32)
                x = x + jnp.sqrt(jnp.maximum(sig_hat**2 - sig**2, 0.0)) \
                    * s_noise * dn
            else:
                sig_hat = sig
            d_x, st = denoise(x, sig_hat, st, i)
            d1 = (x - d_x) / jnp.maximum(sig_hat, 1e-20)
            x_euler = x + (sig_next - sig_hat) * d1

            if method == "heun":
                # 2nd-order correction except into sigma = 0 (the final
                # step, where 1/sigma_next diverges): Algorithm 2 line 9
                def _heun(st):
                    d_x2, st = denoise(x_euler, sig_next, st, i)
                    d2 = (x_euler - d_x2) / jnp.maximum(sig_next, 1e-20)
                    return x + (sig_next - sig_hat) * 0.5 * (d1 + d2), st

                x_new, st = jax.lax.cond(
                    jnp.equal(i, num_steps - 1),
                    lambda st: (x_euler, st), _heun, st)
            else:
                x_new = x_euler
            if log_every:
                frames = _log_frame(frames, x_new.astype(dtype), i, log_every)
            return (x_new, frames, st), None

        frames0 = (jnp.zeros((n_frames,) + shape, dtype) if log_every
                   else jnp.zeros((), dtype))
        state0 = model_state if stateful else jnp.zeros((), dtype)
        (x, frames, _), _ = jax.lax.scan(
            step, (x, frames0, state0), jnp.arange(num_steps))
        if mask is not None:
            x = mask * x0.astype(jnp.float32) + (1.0 - mask) * x
        return DiffusionOutput(x=x, intermediates=frames if log_every else None)
