"""MeanFlow: one-step generative modeling via average velocity fields.

Geng et al., "Mean Flows for One-step Generative Modeling"
(arXiv:2505.13447) — the fourth few-step family in this framework, next to
ReFlow coupling distillation (diffusion/distill.py), consistency
distillation (diffusion/consistency.py) and progressive distillation
(diffusion/progressive.py). Unlike all three, MeanFlow trains a 1-4-step
sampler FROM SCRATCH: no teacher, no couplings, no halving rounds.

The model learns the *average* velocity over an interval,

    u(z_t, r, t) = (1 / (t - r)) * integral_r^t v(z_tau, tau) dtau,

instead of the instantaneous velocity v(z_t, t) that rectified flow
(diffusion/flow.py) regresses. Differentiating t * u(z_t, 0, t)-style
displacement identities gives the **MeanFlow identity**

    u(z_t, r, t) = v(z_t, t) - (t - r) * d/dt u(z_t, r, t),

where d/dt is the total derivative along the trajectory,
``dz/dt = v``:  du/dt = v . grad_z u + du/dt|_partial. The training target
is built from the identity with the straight-line conditional velocity
``v = eps - x0`` standing in for the marginal field, and the total
derivative is ONE ``jax.jvp`` through the network with tangents
``(v, 1, 0)`` on ``(z, t, r)`` — the JAX-native formulation of the paper's
`jvp` (their Alg. 1); on TPU the forward and its JVP fuse into one XLA
program, roughly 2x a plain forward.

Sampling needs no ODE solver at all: by definition of the average
velocity, ``z_r = z_t - (t - r) * u(z_t, r, t)`` is EXACT under the
learned field, so one model call maps noise to data (``x = eps -
u(eps, 0, 1)``), and an n-step variant just splits [0, 1] into n
segments. Reference framing: the reference has nothing few-step at all
(its fastest path is 250-step DDIM, inference.py:27); this family brings
the framework's serving floor to a single forward per image.

The network takes TWO times. To keep the universal ``model(x, t, cond,
y)`` call surface (trainer, pipelines, CLIs) unchanged, dual-time models
(``UNetConfig.dual_time`` / ``DiTConfig.dual_time``) receive the pair
packed as ``t = stack([t, r], axis=-1) * time_scale`` — every downstream
consumer treats ``t`` as an opaque array.
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

__all__ = ["MeanFlow"]

VelocityFn = Callable[..., jax.Array]


@dataclasses.dataclass(frozen=True)
class MeanFlow:
    """Average-velocity process over [0, 1] with straight-line paths.

    Same straight-line marginals as :class:`~eo_diffusion_tpu.diffusion.
    flow.FlowMatching` (``z_t = (1-t) x0 + t eps``), so the RePaint mask
    composite and SDEdit-style tails transfer unchanged; only the
    regression target and the sampler update differ.
    """

    image_size: int
    in_channels: int
    cond_type: Optional[str] = None  # None | "concat"
    time_scale: float = 1000.0  # model-facing times = t * time_scale
    # fraction of training samples with r != t (the rest see r == t, where
    # the identity degenerates to plain flow matching: u = v). The paper's
    # ablation (Table 1c) puts the sweet spot at 25-50%.
    ratio_rt: float = 0.5
    # (t, r) sampling: logit-normal (mu, sigma) per the paper's default
    # (Table 1d: (-0.4, 1.0)); "uniform" is the unbiased baseline.
    time_sampling: str = "logit_normal"  # "logit_normal" | "uniform"
    logit_mean: float = -0.4
    logit_std: float = 1.0
    # adaptive loss weighting (paper eq. 21, their best setting): per-sample
    # w = 1 / (||delta||^2 + c)^p with the WEIGHT stop-graded; p=1, c=1e-3
    # makes every sample contribute ~unit loss scale (a soft normalized-MSE).
    # adaptive_p = 0 recovers plain MSE.
    adaptive_p: float = 1.0
    adaptive_c: float = 1e-3
    # CFG-INTEGRATED training (paper §4, eq. 24 / Alg. 3 — the variant that
    # sets the paper's SOTA): cfg_omega > 1 replaces the tangent/target
    # velocity with the guided field
    #     v~ = omega * v + (1 - omega) * sg(u_theta(z_t, t, t | null)),
    # so the learned u IS the omega-guided average velocity and 1-NFE
    # sampling yields guided samples from a SINGLE conditional call (no
    # batch-doubling, ever). Needs class labels: cfg_null_index is the
    # learned null row (num_classes); cfg_dropout both trains the null
    # branch and switches those samples' target to the plain identity.
    cfg_omega: float = 1.0
    cfg_dropout: float = 0.1
    cfg_null_index: Optional[int] = None

    @classmethod
    def create(cls, image_size: int = 64, in_channels: int = 3,
               cond_type: Optional[str] = None, **kw) -> "MeanFlow":
        return cls(image_size=image_size, in_channels=in_channels,
                   cond_type=cond_type, **kw)

    # -- time plumbing -------------------------------------------------------

    def pack_time(self, t: jax.Array, r: jax.Array) -> jax.Array:
        """(t, r) in [0,1] -> the dual-time model input [N, 2]."""
        return jnp.stack([t, r], axis=-1) * self.time_scale

    def _sample_tr(self, rng: jax.Array, n: int) -> Tuple[jax.Array, jax.Array]:
        """Draw (t, r) with r <= t; r == t for a (1 - ratio_rt) fraction."""
        pair_rng, sel_rng = jax.random.split(rng)
        if self.time_sampling == "logit_normal":
            z = (jax.random.normal(pair_rng, (n, 2), jnp.float32)
                 * self.logit_std + self.logit_mean)
            ab = jax.nn.sigmoid(z)
        else:
            assert self.time_sampling == "uniform", self.time_sampling
            ab = jax.random.uniform(pair_rng, (n, 2), jnp.float32)
        t = jnp.maximum(ab[:, 0], ab[:, 1])
        r = jnp.minimum(ab[:, 0], ab[:, 1])
        keep = jax.random.uniform(sel_rng, (n,)) < self.ratio_rt
        r = jnp.where(keep, r, t)
        return t, r

    # -- training ------------------------------------------------------------

    def train_loss(
        self,
        model_fn: VelocityFn,
        rng: jax.Array,
        x0: jax.Array,
        cond: Optional[jax.Array] = None,
        y: Optional[jax.Array] = None,
        noise: Optional[jax.Array] = None,
    ) -> jax.Array:
        """MeanFlow loss: ``w * ||u - sg(v - (t-r) du/dt)||^2``.

        The total derivative ``du/dt = v . grad_z u + partial_t u`` (r held
        fixed) is one ``jax.jvp`` of the model with tangents ``(v, 1, 0)``
        on ``(z, t, r)`` — the time_scale packing is inside the
        differentiated function, so the chain rule through the model's
        scaled time input is automatic. The target carries
        ``stop_gradient`` (paper Alg. 1): gradients flow only through the
        primal prediction ``u``.
        """
        tr_rng, n_rng, drop_rng = jax.random.split(rng, 3)
        n = x0.shape[0]
        t, r = self._sample_tr(tr_rng, n)
        eps = (noise.astype(jnp.float32) if noise is not None
               else jax.random.normal(n_rng, x0.shape, jnp.float32))
        x0f = x0.astype(jnp.float32)
        tb = t[:, None, None, None]
        z = ((1.0 - tb) * x0f + tb * eps).astype(x0.dtype)
        v = eps - x0f  # conditional (straight-line) velocity, dz/dt

        use_cfg = self.cfg_omega != 1.0
        if use_cfg:
            assert y is not None and self.cfg_null_index is not None, (
                "cfg_omega != 1 is CFG-integrated training (paper §4): it "
                "needs class labels and cfg_null_index (the null row)")
            # internal label dropout: the null branch must ALSO be trained
            # (it appears inside the guided target), and dropped samples'
            # target degrades to the plain identity (omega=1), per Alg. 3
            y_null = jnp.full_like(y, self.cfg_null_index)
            dropped = jax.random.uniform(drop_rng, (n,)) < self.cfg_dropout
            y = jnp.where(dropped, y_null, y)
            # one extra (stop-graded) forward: the model's own estimate of
            # the MARGINAL velocity — u at r == t with the null class
            u_null = jax.lax.stop_gradient(
                model_fn(z, self.pack_time(t, t), cond, y_null)
            ).astype(jnp.float32)
            v_tilde = self.cfg_omega * v + (1.0 - self.cfg_omega) * u_null
            # dropped samples train the unconditional field: plain v
            v_tilde = jnp.where(dropped[:, None, None, None], v, v_tilde)
        else:
            v_tilde = v

        def u_fn(zz, tt, rr):
            return model_fn(zz, self.pack_time(tt, rr), cond, y)

        u, dudt = jax.jvp(
            u_fn, (z, t, r),
            (v_tilde.astype(z.dtype), jnp.ones_like(t), jnp.zeros_like(r)))
        u = u.astype(jnp.float32)
        target = v_tilde - (t - r)[:, None, None, None] * dudt.astype(jnp.float32)
        delta = u - jax.lax.stop_gradient(target)
        sq = jnp.mean(delta**2, axis=(1, 2, 3))  # per-sample [N]
        if self.adaptive_p:
            w = jax.lax.stop_gradient(
                1.0 / (sq + self.adaptive_c) ** self.adaptive_p)
            return jnp.mean(w * sq)
        return jnp.mean(sq)

    # -- sampling ------------------------------------------------------------

    def sample(
        self,
        model_fn: VelocityFn,
        rng: jax.Array,
        n_samples: int,
        num_steps: int = 1,
        method: str = "euler",  # interface parity with FlowMatching.sample
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
        """Segment-wise average-velocity sampling in one ``lax.scan``.

        On the uniform grid t_i = 1 - i/num_steps each step applies the
        displacement its own model call predicts EXACTLY:
        ``x_{t_{i+1}} = x_{t_i} - (t_i - t_{i+1}) u(x, t_{i+1}, t_i)``.
        ``num_steps=1`` is the paper's headline one-call generation.

        ``method`` exists for call-surface parity with
        ``FlowMatching.sample`` (the trainer preview and the inference CLI
        pass it); only "euler" is meaningful for an average-velocity field
        — higher-order correctors would re-integrate what u already
        aggregates — so anything else is rejected.

        CFG at sampling time is the shared ``cfg_double_inputs``/
        ``cfg_combine`` policy — the right tool for models trained with
        ``cfg_omega == 1``. Models trained CFG-INTEGRATED (``cfg_omega >
        1``, paper §4) need none of it: guidance is baked into the learned
        field, so sample class-conditionally with ``guidance_scale=1`` and
        one call per step.

        ``mask``/``x0``: RePaint-style composite — exact on this path
        because the time-t marginal IS the linear interpolation (same
        argument as FlowMatching.sample).
        """
        assert method == "euler", (
            f"MeanFlow integrates its own average-velocity displacement; "
            f"method={method!r} does not apply (use euler)")
        if mask is not None:
            assert x0 is not None, "inpainting requires x0 (known image)"
        shape = (n_samples, self.image_size, self.image_size, self.in_channels)
        x = (x_T.astype(jnp.float32) if x_T is not None
             else jax.random.normal(rng, shape, jnp.float32))

        start = num_steps if start_index is None else int(start_index)
        assert 1 <= start <= num_steps, (
            f"start_index {start_index} outside the {num_steps}-interval grid")
        ts = jnp.linspace(start / num_steps, 0.0, start + 1)
        stateful = model_state is not None
        n_frames = -(-start // log_every) if log_every else 0

        def call_model(xx, t_hi, t_lo, st, i):
            tt = self.pack_time(jnp.full((xx.shape[0],), t_hi, jnp.float32),
                                jnp.full((xx.shape[0],), t_lo, jnp.float32))
            x_in, t_in, c_in, y_in, doubled = cfg_double_inputs(
                xx, tt, cond, y, uncond, y_uncond, guidance_scale)
            if stateful:
                out, st = model_fn(x_in, t_in, c_in, y_in, st, i)
            else:
                out = model_fn(x_in, t_in, c_in, y_in)
            if doubled:
                out = cfg_combine(
                    out,
                    interval_scale(guidance_scale, t_hi, guidance_interval),
                    guidance_rescale)
            return out.astype(jnp.float32), st

        mask_rng = jax.random.fold_in(rng, 7)

        def step(carry, i):
            x, frames, st = carry
            t_i, t_next = ts[i], ts[i + 1]
            if mask is not None:
                eps = jax.random.normal(jax.random.fold_in(mask_rng, i),
                                        shape, jnp.float32)
                known = (1.0 - t_i) * x0.astype(jnp.float32) + t_i * eps
                x = mask * known + (1.0 - mask) * x
            u, st = call_model(x.astype(dtype), t_i, t_next, st, i)
            x = x - (t_i - t_next) * u
            if log_every:
                frames = _log_frame(frames, x.astype(dtype), i, log_every)
            return (x, frames, st), None

        frames0 = (jnp.zeros((n_frames,) + shape, dtype) if log_every
                   else jnp.zeros((), dtype))
        state0 = model_state if stateful else jnp.zeros((), dtype)
        (x, frames, _), _ = jax.lax.scan(
            step, (x, frames0, state0), jnp.arange(start))
        if mask is not None:
            x = mask * x0.astype(jnp.float32) + (1.0 - mask) * x
        return DiffusionOutput(x=x, intermediates=frames if log_every else None)
