"""Consistency distillation: 1-4-step sampling from a trained DDPM teacher.

Song et al. 2023, "Consistency Models" (arXiv:2303.01469; beyond-reference
— the reference's fastest path is DDIM-250). ReFlow (diffusion/distill.py)
already gives few-step sampling for *flow* teachers; this module covers the
other half of the matrix: any trained DDPM-chain model (eps/x0/v objective)
distills into a consistency function

    f(x_t, t) = c_skip(t) x_t + c_out(t) F(x_t, t),   f(x_0-ish, 0) = x

that jumps from any noise level straight to the data estimate. Training
enforces self-consistency along the teacher's probability-flow ODE: for
adjacent grid points t1 < t2,

    loss = d( f_theta(x_{t2}, t2),  stopgrad f_{theta^-}(x_hat_{t1}, t1) )

where ``x_hat_{t1}`` is ONE deterministic DDIM step of the frozen teacher
from the q-sampled ``x_{t2}`` and ``theta^-`` is a slow EMA of the student
(the target network). Sampling is f applied once from pure noise, or a few
f -> re-noise -> f hops (Algorithm 1).

Formulation notes (VP chain, TPU-shaped):

* The DDPM chain is variance-preserving; the EDM-style boundary
  parameterization lives in sigma space. With
  ``sigma(t) = sqrt((1 - acp_t)/acp_t)`` the rescaled variable
  ``x_t / sqrt(acp_t)`` follows the VE process, so
  ``c_skip = sd^2/(sigma^2+sd^2)`` and ``c_out = sigma sd/sqrt(...)``
  apply to the rescaled input — folding the ``1/sqrt(acp)`` into the
  coefficients keeps every table a precomputed [T] float32 array gathered
  per sample (no data-dependent math in the scan).
* The network input is normalized by ``c_in = 1/sqrt(acp (sigma^2+sd^2))
  = 1/sqrt(1 - acp + acp sd^2)`` — bounded at every t, so the student can
  reuse the teacher's backbone (and initialize from its weights).
* ``distill_step`` is a pure (student, target, rng, x0) -> (loss, grads)
  function; the caller owns the three param trees (student / target EMA /
  frozen teacher) and the optimizer — same division of labor as the
  trainer's make_train_step.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from eo_diffusion_tpu.diffusion.gaussian import DiffusionOutput, GaussianDiffusion

__all__ = ["ConsistencyDistillation"]


@dataclasses.dataclass(frozen=True)
class ConsistencyDistillation:
    """Consistency function + distillation loss over a DDPM teacher chain."""

    diffusion: GaussianDiffusion
    n_points: int = 18  # grid points t_0=0 < ... < t_{N-1}=T-1
    sigma_data: float = 0.5
    huber_c: float = 0.0  # 0 = squared L2; >0 = pseudo-Huber (improved CT)

    @classmethod
    def create(cls, diffusion: GaussianDiffusion, **kw):
        return cls(diffusion=diffusion, **kw)

    # -- grid + coefficients -------------------------------------------------

    def grid(self) -> jnp.ndarray:
        """The sub-schedule indices [N], uniform over the teacher's chain
        (t_0 = 0, t_{N-1} = T-1)."""
        T = self.diffusion.timesteps
        return jnp.linspace(0.0, T - 1, self.n_points).round().astype(jnp.int32)

    def _coeffs(self, t: jax.Array):
        """(c_skip, c_out, c_in) per sample [N] for chain index t."""
        acp = jnp.asarray(self.diffusion.schedule.alphas_cumprod)[t]
        sd2 = self.sigma_data ** 2
        sig2 = (1.0 - acp) / jnp.maximum(acp, 1e-12)
        den = sig2 + sd2
        root_acp = jnp.sqrt(jnp.maximum(acp, 1e-12))
        # coefficients act on the RAW VP x_t: the 1/sqrt(acp) VE rescale is
        # folded in (see module notes)
        c_skip = sd2 / den / root_acp
        c_out = jnp.sqrt(sig2 * sd2 / den)
        c_in = jax.lax.rsqrt(1.0 - acp + acp * sd2)
        return c_skip, c_out, c_in

    def f(self, model_fn: Callable, x_t: jax.Array, t: jax.Array,
          cond=None, y=None) -> jax.Array:
        """The consistency function f(x_t, t) -> x0 estimate.

        ``model_fn(x, t, cond, y)`` is the student backbone on the
        normalized input; the boundary f(x, 0) ~ x holds by construction
        (sigma(0) ~ 0 -> c_skip ~ 1, c_out ~ 0)."""
        c_skip, c_out, c_in = self._coeffs(t)
        cb = lambda v: v[:, None, None, None]
        xf = x_t.astype(jnp.float32)
        out = model_fn((cb(c_in) * xf).astype(x_t.dtype), t, cond, y)
        return cb(c_skip) * xf + cb(c_out) * out.astype(jnp.float32)

    # -- teacher ODE step ----------------------------------------------------

    def _teacher_ddim_step(self, teacher_fn, x_t2, t2, t1, cond, y):
        """One deterministic DDIM step of the frozen teacher t2 -> t1
        (eta = 0; reference ddim.py:198-206 update with the teacher's
        objective conversion)."""
        d = self.diffusion
        raw = teacher_fn(x_t2, t2, cond, y)
        eps, x0_pred = d._to_eps_x0(raw, x_t2.astype(jnp.float32), t2)
        acp1 = jnp.asarray(d.schedule.alphas_cumprod)[t1]
        cb = lambda v: v[:, None, None, None]
        return (cb(jnp.sqrt(acp1)) * x0_pred
                + cb(jnp.sqrt(1.0 - acp1)) * eps)

    # -- training ------------------------------------------------------------

    def distill_loss(self, student_fn: Callable, target_fn: Callable,
                     teacher_fn: Optional[Callable], rng: jax.Array,
                     x0: jax.Array, cond=None, y=None) -> jax.Array:
        """Self-consistency loss for one batch (Song et al. Algorithm 2).

        ``student_fn`` carries gradients; ``target_fn`` (the slow-EMA
        student) and ``teacher_fn`` are evaluated under stop_gradient.

        ``teacher_fn=None`` switches to **consistency TRAINING** (Song et
        al. Algorithm 3, teacher-free): the target's input is the exact
        marginal point ``q_sample(x0, t1, eps)`` with the SAME noise draw
        as x_{t2} — the paper's unbiased shared-Brownian estimator of the
        ODE step, which needs only data."""
        i_rng, n_rng = jax.random.split(rng)
        n = x0.shape[0]
        g = self.grid()
        idx = jax.random.randint(i_rng, (n,), 0, self.n_points - 1)
        t1, t2 = g[idx], g[idx + 1]
        eps = jax.random.normal(n_rng, x0.shape, jnp.float32)
        x0f = x0.astype(jnp.float32)
        x_t2 = self.diffusion.q_sample(x0f, t2, eps)
        if teacher_fn is None:  # consistency training: shared-noise marginal
            x_t1_hat = self.diffusion.q_sample(x0f, t1, eps)
        else:
            x_t1_hat = self._teacher_ddim_step(teacher_fn, x_t2, t2, t1,
                                               cond, y)
        f2 = self.f(student_fn, x_t2, t2, cond, y)
        f1 = jax.lax.stop_gradient(
            self.f(target_fn, x_t1_hat, t1, cond, y))
        err = (f2 - f1) ** 2
        if self.huber_c > 0.0:  # pseudo-Huber (arXiv:2310.14189 eq. 9)
            per = jnp.sqrt(jnp.sum(err, axis=(1, 2, 3)) + self.huber_c**2) \
                - self.huber_c
            return jnp.mean(per)
        return jnp.mean(err)

    @staticmethod
    def update_target(target_params, student_params, decay: float = 0.95):
        """Slow-EMA target update (theta^- <- decay theta^- + (1-d) theta)."""
        return jax.tree.map(
            lambda tp, sp: decay * tp + (1.0 - decay) * sp,
            target_params, student_params)

    # -- sampling ------------------------------------------------------------

    def sample(self, student_fn: Callable, rng: jax.Array, n_samples: int,
               steps: int = 1, cond=None, y=None, x_T=None,
               dtype=jnp.float32) -> DiffusionOutput:
        """Algorithm 1: f from pure noise, then optional re-noise -> f hops
        at decreasing grid levels (steps = total f evaluations)."""
        d = self.diffusion
        shape = (n_samples, d.image_size, d.image_size, d.in_channels)
        g = self.grid()
        acp = jnp.asarray(d.schedule.alphas_cumprod)
        init_rng, hop_rng = jax.random.split(rng)
        T_idx = g[-1]
        # x_{T-1} marginal: sqrt(acp)*x0 + sqrt(1-acp)*eps ~ N(0, ~I) at the
        # terminal level; pure noise is the standard CM initialization
        x_T = (x_T.astype(jnp.float32) if x_T is not None
               else jax.random.normal(init_rng, shape, jnp.float32))
        t_full = jnp.full((n_samples,), T_idx, jnp.int32)
        x = self.f(student_fn, x_T.astype(dtype), t_full, cond, y)
        if steps > 1:
            import numpy as np

            # descending intermediate levels, excluding the endpoints
            # (static python ints: the hop structure is unrolled, steps<=4)
            hop_idx = np.linspace(self.n_points - 1, 0,
                                  steps + 1)[1:-1].round().astype(int)
            for j, tj in enumerate(g[hop_idx]):
                eps = jax.random.normal(jax.random.fold_in(hop_rng, j),
                                        shape, jnp.float32)
                tjf = jnp.full((n_samples,), tj, jnp.int32)
                x_tj = d.q_sample(x, tjf, eps)
                x = self.f(student_fn, x_tj.astype(dtype), tjf, cond, y)
        return DiffusionOutput(x=x)
