"""Gaussian diffusion processes: training loss, DDPM and DDIM samplers.

TPU-native re-design of the reference's diffusion layer:

* ``EODiffusion`` (reference ``diffusion/model.py:12-150``): cosine-beta DDPM
  with epsilon-prediction MSE training, ancestral sampling with optional
  x0-clipping, and RePaint-"sum" masked conditioning (``model.py:58-60``).
* ``DDIMSampler`` (reference ``diffusion/ddim.py:11-207``): strided
  deterministic/eta-stochastic sampling with mask-inpainting and
  classifier-free guidance.

The key structural difference from the reference: the reverse trajectories
are ``jax.lax.scan`` loops *inside one jitted program* -- the entire
T-step (or S-step) trajectory stays in HBM with zero host round-trips,
instead of the reference's Python-loop-per-step (``model.py:54``,
``ddim.py:141``). RNG is a scan-carried, split-per-step JAX key.

All tensors are NHWC.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from eo_diffusion_tpu.core.schedules import (
    DDIMSchedule,
    DiffusionSchedule,
    make_ddim_schedule,
    make_schedule,
)

__all__ = ["GaussianDiffusion", "DiffusionOutput", "interval_scale",
           "cfg_double_inputs",
           "cfg_combine", "repaint_op_sequence"]


def repaint_op_sequence(timesteps: int, jump_len: int, jump_n: int):
    """RePaint resampling trajectory (Lugmayr et al. 2022, arXiv:2201.09865,
    Alg. 2 / the paper's ``get_schedule_jump``).

    Every ``jump_len`` levels the sampler jumps back up ``jump_len`` one-step
    forward diffusions and re-descends, ``jump_n - 1`` extra times -- the
    re-noising lets the generated region re-harmonize with the freshly
    composited known region instead of only seeing it once per level. The
    reference's working RePaint (model.py:58-60) is the jump-free special
    case (``jump_n=1``).

    Returns host-side numpy arrays ``(t_ops, is_reverse)``: at op ``k``,
    ``is_reverse[k]==1`` means an ancestral reverse step at level
    ``t_ops[k]`` (x_t -> x_{t-1}); ``0`` means one forward q-step *to* level
    ``t_ops[k]`` (x_{t-1} -> x_t with beta_t). Deltas are always +-1, so the
    whole trajectory compiles to one ``lax.scan`` with a two-way
    ``lax.cond`` (the forward branch never calls the model).
    """
    import numpy as np

    assert jump_len >= 1 and jump_n >= 1, (jump_len, jump_n)
    jumps = {j: jump_n - 1 for j in range(0, timesteps - jump_len, jump_len)}
    t = timesteps
    ts = []
    while t >= 1:
        t -= 1
        ts.append(t)
        if jumps.get(t, 0) > 0:
            jumps[t] -= 1
            for _ in range(jump_len):
                t += 1
                ts.append(t)
    ts.append(-1)
    t_ops, is_rev = [], []
    for a, b in zip(ts[:-1], ts[1:]):
        if b < a:  # reverse step at level a (always b == a - 1)
            t_ops.append(a)
            is_rev.append(1)
        else:  # forward q-step to level b (always b == a + 1)
            t_ops.append(b)
            is_rev.append(0)
    return np.asarray(t_ops, np.int32), np.asarray(is_rev, np.int32)


def cfg_double_inputs(x, t, cond, y, uncond=None, y_uncond=None,
                      guidance_scale: float = 1.0):
    """Classifier-free-guidance batch doubling — the single policy point
    shared by every sampler (ddim/ddpm/dpm/tiled/flow).

    Image-CFG (``uncond``, reference ddim.py:177-181) takes precedence over
    label-CFG (``y_uncond``, lucidrains classifier_free_guidance.py:374-386)
    when both are passed; a simultaneous image+label combine is deliberately
    not offered (no reference path has one). Returns
    ``(x_in, t_in, c_in, y_in, doubled)`` — when ``doubled`` is False the
    inputs pass through untouched and no combine is needed.
    """
    use_c = uncond is not None and guidance_scale != 1.0
    use_y = (not use_c) and y_uncond is not None and guidance_scale != 1.0
    if not (use_c or use_y):
        return x, t, cond, y, False
    x_in = jnp.concatenate([x, x], axis=0)
    t_in = jnp.concatenate([t, t], axis=0)
    if use_c:
        c_in = jnp.concatenate([uncond, cond], axis=0)
        y_in = None if y is None else jnp.concatenate([y, y], axis=0)
    else:
        c_in = None if cond is None else jnp.concatenate([cond, cond], axis=0)
        y_in = jnp.concatenate([y_uncond, y], axis=0)
    return x_in, t_in, c_in, y_in, True


def cfg_combine(out, guidance_scale: float, guidance_rescale: float = 0.0):
    """Guided combine of a batch-doubled model output:
    ``e_uncond + scale * (e_cond - e_uncond)`` (reference ddim.py:180).

    ``guidance_rescale`` (phi in arXiv:2305.08891 §3.4, the CFG-rescale half
    of the zero-terminal-SNR paper — the schedule half lives in
    core/schedules.rescale_zero_terminal_snr): large scales inflate the
    per-sample std of the guided prediction, which over-exposes images;
    rescaling it back toward the cond-branch std (then mixing by phi)
    restores the contrast. phi=0 (default) is the plain combine; the paper
    recommends phi≈0.7 with high scales. Applied to whatever the model
    predicts (eps/v/x0) — the paper states it on x0, but the std ratio is
    invariant to the affine eps<->x0 map only per-sample, so applying at the
    raw-output policy point keeps every sampler consistent.

    ``guidance_scale`` may be a traced scalar (limited-interval guidance,
    :func:`interval_scale`): at a scale of exactly 1 the combine reduces to
    the cond branch (``e_u + 1*(e_c - e_u)``), so per-step gating is one
    ``where`` on the scale with no shape change."""
    e_u, e_c = jnp.split(out, 2, axis=0)
    guided = e_u + guidance_scale * (e_c - e_u)
    if guidance_rescale:
        axes = tuple(range(1, guided.ndim))
        std_c = jnp.std(e_c, axis=axes, keepdims=True)
        std_g = jnp.std(guided, axis=axes, keepdims=True)
        fixed = guided * (std_c / jnp.maximum(std_g, 1e-8))
        guided = guidance_rescale * fixed + (1.0 - guidance_rescale) * guided
    return guided


def interval_scale(guidance_scale, noise_frac, interval):
    """Limited-interval guidance (Kynkäänniemi et al., arXiv:2404.07724):
    CFG applied only while the normalized noise level ``noise_frac``
    (1 = maximal noise: t/(T-1) on DDPM chains, t on the flow ODE,
    sigma/sigma_max on the EDM grid) lies inside ``interval = (lo, hi)``;
    outside, the effective scale is 1 (the plain cond branch). The paper
    shows disabling guidance at the extremes improves FID substantially at
    equal (or higher) scale. The doubled batch still runs on every step —
    gating the batch shape itself would be a dynamic shape inside the scan;
    the win here is quality, not compute."""
    if interval is None:
        return guidance_scale
    lo, hi = interval
    frac = jnp.asarray(noise_frac, jnp.float32)
    inside = (frac >= lo) & (frac <= hi)
    return jnp.where(inside, jnp.float32(guidance_scale), jnp.float32(1.0))

# A denoiser: (x_t [N,H,W,C], t [N], cond, y) -> eps_pred [N,H,W,C].
DenoiseFn = Callable[..., jax.Array]


@dataclasses.dataclass(frozen=True)
class DiffusionOutput:
    """Sampling result: final x plus (optionally) logged intermediates."""

    x: jax.Array
    intermediates: Optional[jax.Array] = None  # [K, N, H, W, C]


def _bcast(table: jax.Array, t: jax.Array) -> jax.Array:
    """Gather per-sample schedule coefficients and broadcast to NHWC."""
    return table[t][:, None, None, None]


def apply_dynamic_threshold(x0: jax.Array, percentile: float) -> jax.Array:
    """Imagen dynamic thresholding (arXiv:2205.11487 §2.3, beyond-reference).

    Per-sample threshold ``s = max(quantile_p(|x0|), 1)``; x0 is clipped to
    ``[-s, s]`` and divided by ``s``. At high CFG scales the predicted x0
    saturates far outside [-1, 1]; a static clip flattens everything at the
    rails (losing contrast), while this compresses the whole sample back
    into range. When x0 is already in range, ``s == 1`` and the op is the
    identity — so it is safe to leave on at guidance_scale 1. One
    ``jnp.quantile`` (a sort) per step per sample; scan-compatible (static
    shapes, no host sync)."""
    assert 0.5 < percentile <= 1.0, percentile
    flat = jnp.abs(x0.reshape((x0.shape[0], -1)).astype(jnp.float32))
    s = jnp.quantile(flat, percentile, axis=1)
    s = jnp.maximum(s, 1.0).reshape((-1,) + (1,) * (x0.ndim - 1))
    return jnp.clip(x0, -s, s) / s


def _log_frame(frames: jax.Array, x: jax.Array, i: jax.Array, k: int) -> jax.Array:
    """Write x into frames[i // k] when i % k == 0 (inside a scan).

    Streams every k-th intermediate into a fixed ceil(T/k)-frame buffer so
    trajectory logging costs K frames of HBM, not T.
    """
    slot = i // k
    cur = jax.lax.dynamic_index_in_dim(frames, slot, 0, keepdims=False)
    val = jnp.where(i % k == 0, x, cur)
    return jax.lax.dynamic_update_index_in_dim(frames, val, slot, 0)


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    """Pure-function diffusion process around a denoiser ``model_fn``.

    ``model_fn(x, t, cond, y) -> eps`` is typically
    ``lambda x, t, cond, y: unet.apply(params, x, t, cond=cond, y=y)``; the
    object itself carries only static schedule tables so it can be closed
    over by ``jax.jit``.
    """

    schedule: DiffusionSchedule
    image_size: int
    in_channels: int
    cond_type: Optional[str] = None  # None | "sum" (RePaint composite)
    # prediction objective (lucidrains parity, denoising_diffusion_pytorch.py:445-447):
    # "eps" (the reference's active path), "x0", or "v" (Salimans & Ho 2022)
    objective: str = "eps"
    # p2 loss reweighting (Choi et al. 2022; denoising_diffusion_pytorch.py:502-504):
    # weight = (k + snr)^-gamma; gamma=0 disables
    p2_loss_weight_k: float = 1.0
    p2_loss_weight_gamma: float = 0.0
    # min-SNR-gamma loss weighting (Hang et al. 2023, arXiv:2303.09556;
    # beyond-reference): clamp the per-timestep effective weight at
    # gamma (5.0 in the paper) so easy low-noise steps stop dominating the
    # gradient — measured there to ~3x convergence on DiT/UNet trainings.
    # 0 disables. Objective-aware: eps -> min(SNR,g)/SNR, x0 -> min(SNR,g),
    # v -> min(SNR,g)/(SNR+1) (paper §3.2; mutually composable with p2).
    min_snr_gamma: float = 0.0
    # self-conditioning (Chen et al. 2022; denoising_diffusion_pytorch.py:433,539+):
    # the denoiser additionally sees its own x0 estimate, appended as extra
    # cond channels (the UNet's in_channels must budget for them). Training
    # randomly feeds zeros vs a stop-gradient first-pass estimate.
    self_condition: bool = False
    # CompVis-style VLB auxiliary loss (reference diffusion/ddpm.py:164-174,
    # 299-326): total = L_simple + elbo_weight * E_t[lvlb_w(t) * err(t)]
    # with lvlb_w = beta^2 / (2 sigma^2 alpha (1-acp)); 0 disables.
    elbo_weight: float = 0.0

    # -- construction ------------------------------------------------------

    @classmethod
    def create(
        cls,
        timesteps: int = 1000,
        image_size: int = 64,
        in_channels: int = 3,
        cond_type: Optional[str] = None,
        schedule: str = "cosine_eo",
        objective: str = "eps",
        p2_loss_weight_k: float = 1.0,
        p2_loss_weight_gamma: float = 0.0,
        self_condition: bool = False,
        elbo_weight: float = 0.0,
        zero_terminal_snr: bool = False,
        min_snr_gamma: float = 0.0,
    ) -> "GaussianDiffusion":
        assert objective in ("eps", "x0", "v"), objective
        # Lin et al. 2023 (arXiv:2305.08891): with SNR(T) = 0 the model sees
        # PURE noise at the terminal step, so eps-prediction degenerates
        # (eps == x_T, nothing to learn, and x0 is unrecoverable from it) --
        # the rescale is only sound under the v parameterization. Pair with
        # ddim_sample(method="trailing") so sampling starts at t = T-1.
        assert not zero_terminal_snr or objective == "v", (
            "zero_terminal_snr requires objective='v' (at SNR=0 the eps/x0 "
            "parameterizations cannot recover x0; arXiv:2305.08891 §2.2)")
        return cls(
            schedule=make_schedule(timesteps, schedule,
                                   zero_terminal_snr=zero_terminal_snr),
            image_size=image_size,
            in_channels=in_channels,
            cond_type=cond_type,
            objective=objective,
            p2_loss_weight_k=p2_loss_weight_k,
            p2_loss_weight_gamma=p2_loss_weight_gamma,
            self_condition=self_condition,
            elbo_weight=elbo_weight,
            min_snr_gamma=min_snr_gamma,
        )

    def _with_self_cond(self, cond, x_sc):
        """Append the self-conditioning channels after any existing cond."""
        if cond is None:
            return x_sc
        return jnp.concatenate([cond, x_sc], axis=-1)

    @property
    def timesteps(self) -> int:
        return self.schedule.timesteps

    # -- forward process ---------------------------------------------------

    def q_sample(self, x0: jax.Array, t: jax.Array, noise: jax.Array) -> jax.Array:
        """q(x_t | x_0) sample (reference ``_forward_diffusion``, model.py:94-98)."""
        sched = self.schedule
        return (
            _bcast(jnp.asarray(sched.sqrt_alphas_cumprod), t) * x0
            + _bcast(jnp.asarray(sched.sqrt_one_minus_alphas_cumprod), t) * noise
        )

    def _target(self, x0, t, noise):
        """Regression target per objective.

        v-parameterization (Salimans & Ho 2022, lucidrains
        denoising_diffusion_pytorch.py:518-528): v = a*eps - s*x0 with
        a = sqrt(acp), s = sqrt(1-acp).
        """
        if self.objective == "eps":
            return noise
        if self.objective == "x0":
            return x0
        sched = self.schedule
        a = _bcast(jnp.asarray(sched.sqrt_alphas_cumprod), t)
        s = _bcast(jnp.asarray(sched.sqrt_one_minus_alphas_cumprod), t)
        return a * noise - s * x0

    def _to_eps_x0(self, pred, x_t, t):
        """Convert the model output to (eps, x0) for the reverse process."""
        sched = self.schedule
        a = _bcast(jnp.asarray(sched.sqrt_alphas_cumprod), t)
        s = _bcast(jnp.asarray(sched.sqrt_one_minus_alphas_cumprod), t)
        pred = pred.astype(jnp.float32)
        x_t = x_t.astype(jnp.float32)
        if self.objective == "eps":
            eps = pred
            x0 = (
                _bcast(jnp.asarray(sched.sqrt_recip_alphas_cumprod), t) * x_t
                - _bcast(jnp.asarray(sched.sqrt_recipm1_alphas_cumprod), t) * pred
            )
        elif self.objective == "x0":
            x0 = pred
            eps = (x_t - a * x0) / jnp.maximum(s, 1e-8)
        else:  # "v": x0 = a*x_t - s*v ; eps = s*x_t + a*v
            x0 = a * x_t - s * pred
            eps = s * x_t + a * pred
        return eps, x0

    def _p2_weight(self, t):
        if self.p2_loss_weight_gamma == 0.0:
            return None
        acp = jnp.asarray(self.schedule.alphas_cumprod)[t]
        snr = acp / (1.0 - acp)
        return (self.p2_loss_weight_k + snr) ** (-self.p2_loss_weight_gamma)

    def _min_snr_weight(self, t):
        """min-SNR-gamma weight per sample (arXiv:2303.09556 §3.2), in the
        parameterization actually trained (the paper states weights w.r.t.
        the x0 loss; dividing by the objective's SNR power converts)."""
        if self.min_snr_gamma == 0.0:
            return None
        acp = jnp.asarray(self.schedule.alphas_cumprod)[t]
        snr = acp / jnp.maximum(1.0 - acp, 1e-12)
        clipped = jnp.minimum(snr, self.min_snr_gamma)
        if self.objective == "eps":
            return clipped / jnp.maximum(snr, 1e-12)
        if self.objective == "v":
            return clipped / (snr + 1.0)
        return clipped  # x0

    def training_tuple(
        self,
        rng: jax.Array,
        x0: jax.Array,
        noise: Optional[jax.Array] = None,
    ):
        """Draw one training instance: ``(x_t, t, target)`` such that
        ``loss = mean((model(x_t, t) - target)^2)`` equals ``train_loss``
        for the plain objective-MSE configuration. Exposed for schedulers
        that own the MSE themselves (the 1F1B pipeline trainer's
        per-microbatch loss head, parallel/pipeline_train.py); the
        reweighted/self-conditioned variants need the fused ``train_loss``
        and are asserted off.
        """
        assert not self.self_condition, (
            "training_tuple is a plain-MSE decomposition; self-conditioning "
            "needs the two-pass train_loss")
        t_rng, n_rng, _ = jax.random.split(rng, 3)
        n = x0.shape[0]
        t = jax.random.randint(t_rng, (n,), 0, self.timesteps)
        noise = (jax.random.normal(n_rng, x0.shape, x0.dtype) if noise is None
                 else noise.astype(x0.dtype))
        x_t = self.q_sample(x0, t, noise)
        target = self._target(x0.astype(jnp.float32), t,
                              noise.astype(jnp.float32))
        return x_t, t, target

    def training_weight(self, t: jax.Array) -> Optional[jax.Array]:
        """Per-sample loss weight [N] that makes the decomposed loss
        ``mean(w * (pred - target)^2)`` equal the fused :meth:`train_loss`
        under every reweighting this process supports.

        All three reweightings are per-sample scalars in t, so they
        compose multiplicatively (train_loss applies p2/min-SNR to the
        elementwise error, then adds ``elbo_weight * lvlb[t] * per_sample``
        ON TOP of the already-weighted error — i.e.
        ``w = p2 * min_snr * (1 + elbo_weight * lvlb)``). This is what lets
        the 1F1B pipeline's per-microbatch loss head
        (parallel/pipeline_train.py) train reweighted configs instead of
        asserting them off (r4 weak #8); only self-conditioning remains
        train_loss-exclusive (its second model pass is structural, not a
        weight). Returns None when no reweighting is configured.
        """
        w = None
        p2 = self._p2_weight(t)
        if p2 is not None:
            w = p2
        snr = self._min_snr_weight(t)
        if snr is not None:
            w = snr if w is None else w * snr
        if self.elbo_weight > 0.0:
            vlb = 1.0 + self.elbo_weight * self._lvlb_weights()[t]
            w = vlb if w is None else w * vlb
        return w

    def train_loss(
        self,
        model_fn: DenoiseFn,
        rng: jax.Array,
        x0: jax.Array,
        cond: Optional[jax.Array] = None,
        y: Optional[jax.Array] = None,
        noise: Optional[jax.Array] = None,
    ) -> jax.Array:
        """Objective-MSE training loss.

        The reference's active path is epsilon-MSE (model.py:38-44 +
        train.py:86,117); "x0"/"v" objectives and p2 reweighting reproduce
        the vendored lucidrains trainer's options
        (denoising_diffusion_pytorch.py:445-447, 502-528).

        ``noise``: optional fixed eps per sample (reference
        ``EODiffusion.forward`` takes the noise as an argument, model.py:38;
        also the hook paired-distillation batches use, diffusion/distill.py).
        """
        t_rng, n_rng, sc_rng = jax.random.split(rng, 3)
        n = x0.shape[0]
        t = jax.random.randint(t_rng, (n,), 0, self.timesteps)
        if noise is None:
            noise = jax.random.normal(n_rng, x0.shape, x0.dtype)
        else:
            noise = noise.astype(x0.dtype)
        x_t = self.q_sample(x0, t, noise)
        if self.self_condition:
            # 50%: feed the stop-gradient x0 estimate from a zeros-cond pass
            # (denoising_diffusion_pytorch.py:539+). Both passes always run
            # under jit; the estimate is masked to zeros half the time.
            use_sc = jax.random.bernoulli(sc_rng, 0.5)
            zeros = jnp.zeros_like(x_t)
            pred0 = model_fn(x_t, t, self._with_self_cond(cond, zeros), y)
            _, x0_est = self._to_eps_x0(pred0, x_t, t)
            x_sc = jax.lax.stop_gradient(
                jnp.where(use_sc, x0_est.astype(x_t.dtype), zeros)
            )
            pred = model_fn(x_t, t, self._with_self_cond(cond, x_sc), y)
        else:
            pred = model_fn(x_t, t, cond, y)
        target = self._target(x0.astype(jnp.float32), t, noise.astype(jnp.float32))
        err = (pred.astype(jnp.float32) - target) ** 2
        w = self._p2_weight(t)
        if w is not None:
            err = err * w[:, None, None, None]
        w_snr = self._min_snr_weight(t)
        if w_snr is not None:
            err = err * w_snr[:, None, None, None]
        loss = jnp.mean(err)
        if self.elbo_weight > 0.0:
            # per-sample squared error reweighted by the VLB terms
            # (reference ddpm.py:305-324: loss_vlb = lvlb_weights[t] * err)
            per = jnp.mean(err, axis=(1, 2, 3))
            loss = loss + self.elbo_weight * jnp.mean(self._lvlb_weights()[t] * per)
        return loss

    def _lvlb_weights(self) -> jnp.ndarray:
        """CompVis lvlb weights for the eps parameterization
        (ddpm.py:164-174): beta^2 / (2 sigma_posterior^2 alpha (1-acp)),
        with the t=0 term copied from t=1 to avoid the 0/0."""
        s = self.schedule
        betas = jnp.asarray(s.betas, jnp.float32)
        alphas = jnp.asarray(s.alphas, jnp.float32)
        acp = jnp.asarray(s.alphas_cumprod, jnp.float32)
        acp_prev = jnp.asarray(s.alphas_cumprod_prev, jnp.float32)
        posterior_var = betas * (1.0 - acp_prev) / (1.0 - acp)
        w = betas**2 / (2.0 * jnp.maximum(posterior_var, 1e-20) * alphas * (1.0 - acp))
        return w.at[0].set(w[1])

    # -- reverse process (DDPM) --------------------------------------------

    def _reverse_step(
        self,
        model_fn: DenoiseFn,
        x_t: jax.Array,
        t: jax.Array,
        noise: jax.Array,
        cond: Optional[jax.Array],
        y: Optional[jax.Array],
        clip: bool,
        dynamic_threshold: Optional[float] = None,
    ) -> jax.Array:
        """One ancestral reverse step.

        ``clip=False``: posterior mean from predicted noise (reference
        ``_reverse_diffusion``, model.py:101-122). ``clip=True``: predict x0,
        clamp to [-1, 1], use the q-posterior mean (reference
        ``_reverse_diffusion_with_clip``, model.py:125-150).
        ``dynamic_threshold`` swaps the static clamp for Imagen dynamic
        thresholding (:func:`apply_dynamic_threshold`, arXiv:2205.11487) on
        the same q-posterior path. The t==0 branch (std=0, acp_prev=1) is
        expressed with ``jnp.where`` so the whole loop stays inside one
        compiled scan.
        """
        sched = self.schedule
        pred = model_fn(x_t, t, cond, y).astype(jnp.float32)
        eps, x0_pred = self._to_eps_x0(pred, x_t, t)
        x_t = x_t.astype(jnp.float32)

        alpha_t = _bcast(jnp.asarray(sched.alphas), t)
        acp_t = _bcast(jnp.asarray(sched.alphas_cumprod), t)
        acp_prev = _bcast(jnp.asarray(sched.alphas_cumprod_prev), t)
        beta_t = _bcast(jnp.asarray(sched.betas), t)

        t_pos = (t > 0)[:, None, None, None]

        if clip or dynamic_threshold is not None:
            x0_pred = (apply_dynamic_threshold(x0_pred, dynamic_threshold)
                       if dynamic_threshold is not None
                       else jnp.clip(x0_pred, -1.0, 1.0))
            # q-posterior mean; at t==0 acp_prev==1 makes this collapse to the
            # reference's t==0 expression (model.py:147) exactly.
            mean = (
                beta_t * jnp.sqrt(acp_prev) / (1.0 - acp_t) * x0_pred
                + (1.0 - acp_prev) * jnp.sqrt(alpha_t) / (1.0 - acp_t) * x_t
            )
        else:
            somacp = _bcast(jnp.asarray(sched.sqrt_one_minus_alphas_cumprod), t)
            mean = (1.0 / jnp.sqrt(alpha_t)) * (
                x_t - ((1.0 - alpha_t) / somacp) * eps
            )

        std = jnp.sqrt(beta_t * (1.0 - acp_prev) / (1.0 - acp_t))
        std = jnp.where(t_pos, std, 0.0)
        return mean + std * noise.astype(jnp.float32), x0_pred

    def ddpm_sample(
        self,
        model_fn: DenoiseFn,
        rng: jax.Array,
        n_samples: int,
        cond: Optional[jax.Array] = None,
        y: Optional[jax.Array] = None,
        clip: bool = True,
        dynamic_threshold: Optional[float] = None,
        log_every: Optional[int] = None,
        guidance_scale: float = 1.0,
        guidance_rescale: float = 0.0,
        guidance_interval: Optional[Tuple[float, float]] = None,
        y_uncond: Optional[jax.Array] = None,
        dtype=jnp.float32,
        model_state: Any = None,
        jump_len: int = 0,
        jump_n: int = 1,
    ) -> DiffusionOutput:
        """Ancestral DDPM sampling (reference ``EODiffusion.sampling``, model.py:47-75).

        RePaint-"sum" conditioning: when ``cond_type == "sum"`` the cond tensor
        is (gt | mask) channel-concat; at *every* reverse step the known
        region is re-noised to level t and composited in before denoising
        (reference model.py:58-60). Matching the reference, the same per-step
        noise drives both the gt re-noising and the reverse-step stochasticity.

        The T-step loop is a single ``lax.scan``; with ``log_every=k`` every
        k-th intermediate x_t is written into a preallocated ceil(T/k)-frame
        HBM buffer inside the scan (device-side; no host sync per step --
        unlike the reference's save_image calls, and without materializing
        the full T-step trajectory, which at T=1000/256^2/bs8 would be ~6 GB).

        ``jump_len``/``jump_n``: RePaint resampling (arXiv:2201.09865; see
        :func:`repaint_op_sequence`). ``jump_n > 1`` re-noises ``jump_len``
        levels up and re-descends at every jump point, which harmonizes the
        inpainted region with the known region far better than the
        single-descent composite. The reference has no equivalent (its
        RePaint is the jump-free composite, model.py:58-60). Defaults keep
        the exact single-descent trajectory (bit-identical RNG path). With a
        stateful denoiser (DeepCache) the state index ``i`` counts ops, not
        levels, so the cache cadence is in op-space under jumps.
        """
        assert clip or float(self.schedule.alphas[-1]) > 1e-8, (
            "clip=False uses the eps-form posterior mean (1/sqrt(alpha_t)) "
            "which diverges at a zero-terminal-SNR schedule's last step "
            "(alpha[T-1] = 0, arXiv:2305.08891); use clip=True "
            "(x0-posterior form, finite there)")
        shape = (n_samples, self.image_size, self.image_size, self.in_channels)
        init_rng, scan_rng = jax.random.split(rng)
        # the x_t carry stays float32 regardless of ``dtype``: per-step bf16
        # quantization accumulates over the T=1000 ancestral chain (measured
        # on the capstone model: RePaint SSIM 0.67 with a bf16 carry vs 0.92
        # with f32). ``dtype`` governs the model-facing tensors (the UNet
        # casts to its own cfg.dtype at entry) and the frames buffer.
        x_T = jax.random.normal(init_rng, shape, jnp.float32)

        if y_uncond is not None and guidance_scale != 1.0:
            # label-CFG: wrap the denoiser with a null-class guided combine
            # (lucidrains classifier_free_guidance.py:596-617). With a
            # stateful denoiser the doubled batch flows through it -- build
            # the initial state for batch 2*n_samples in that case.
            inner_fn = model_fn

            t_denom = float(max(self.timesteps - 1, 1))

            def _eff_scale(t):
                return interval_scale(guidance_scale, t[0] / t_denom,
                                      guidance_interval)

            if model_state is not None:
                def model_fn(x, t, c, yy, st, i):  # noqa: F811
                    x_in, t_in, c_in, y_in, _ = cfg_double_inputs(
                        x, t, c, yy, None, y_uncond, guidance_scale)
                    out, st = inner_fn(x_in, t_in, c_in, y_in, st, i)
                    return cfg_combine(out, _eff_scale(t), guidance_rescale), st
            else:
                def model_fn(x, t, c, yy):  # noqa: F811
                    x_in, t_in, c_in, y_in, _ = cfg_double_inputs(
                        x, t, c, yy, None, y_uncond, guidance_scale)
                    return cfg_combine(inner_fn(x_in, t_in, c_in, y_in),
                                       _eff_scale(t), guidance_rescale)

        gt = mask = None
        if cond is not None and self.cond_type == "sum":
            # cond = (gt | mask) channel-concat (reference model.py:50-52;
            # the reference hardcodes 3 gt channels -- generalized here)
            c_img = self.in_channels
            gt, mask = cond[..., :c_img], cond[..., c_img : c_img + 1]
            cond = None

        use_jumps = jump_len > 0 and jump_n > 1
        if use_jumps:
            # RePaint resampling (arXiv:2201.09865 Alg. 2): the op list is a
            # static host-side array, so the jump trajectory is still ONE
            # compiled scan; forward ops take the cheap lax.cond branch (no
            # model call).
            t_ops, rev_ops = repaint_op_sequence(self.timesteps, jump_len, jump_n)
            ts = jnp.asarray(t_ops)
            rev_flags = jnp.asarray(rev_ops)
            n_ops = int(t_ops.shape[0])
        else:
            ts = jnp.arange(self.timesteps - 1, -1, -1)
            rev_flags = jnp.ones((self.timesteps,), jnp.int32)
            n_ops = self.timesteps
        n_frames = -(-n_ops // log_every) if log_every else 0
        stateful = model_state is not None

        def step(carry, xs):
            t_scalar, is_rev, i = xs
            x_t, key, x_sc, frames, m_state = carry
            key, nk = jax.random.split(key)
            noise = jax.random.normal(nk, shape, jnp.float32)
            t = jnp.full((n_samples,), t_scalar, jnp.int32)

            def reverse_op(x_t, x_sc, m_state):
                if gt is not None:
                    gt_noised = self.q_sample(gt, t, noise)
                    x_t = mask * gt_noised + (1.0 - mask) * x_t

                c = self._with_self_cond(cond, x_sc) if self.self_condition else cond
                x_in = x_t.astype(dtype)
                if stateful:
                    # precompute the denoiser output on exactly the (x, t, c,
                    # y) _reverse_step would pass; feed it through as a
                    # constant fn
                    raw, m_state2 = model_fn(x_in, t, c, y, m_state, i)
                    eff_fn = lambda *_a: raw
                else:
                    m_state2 = m_state
                    eff_fn = lambda *_a: model_fn(x_in, t, c, y)
                x_new, x0_pred = self._reverse_step(eff_fn, x_t, t, noise, c, y,
                                                    clip, dynamic_threshold)
                if self.self_condition:
                    # clamp the carried estimate (lucidrains clips x_start
                    # during sampling; unclipped feedback diverges -- found
                    # by driving)
                    x_sc = jnp.clip(x0_pred, -1.0, 1.0).astype(dtype)
                return x_new, x_sc, m_state2

            if use_jumps:
                def forward_op(x_t, x_sc, m_state):
                    # one q-step up to level t: x_t = sqrt(1-beta_t) x_{t-1}
                    # + sqrt(beta_t) eps (RePaint eq. 9)
                    beta_t = _bcast(jnp.asarray(self.schedule.betas), t)
                    x_up = jnp.sqrt(1.0 - beta_t) * x_t + jnp.sqrt(beta_t) * noise
                    return x_up, x_sc, m_state

                x_t, x_sc, m_state = jax.lax.cond(
                    is_rev == 1, reverse_op, forward_op, x_t, x_sc, m_state)
            else:
                x_t, x_sc, m_state = reverse_op(x_t, x_sc, m_state)
            if log_every:
                frames = _log_frame(frames, x_t.astype(dtype), i, log_every)
            return (x_t, key, x_sc, frames, m_state), None

        x_sc0 = jnp.zeros(shape, dtype) if self.self_condition else jnp.zeros((), dtype)
        frames0 = jnp.zeros((n_frames,) + shape, dtype) if log_every else jnp.zeros((), dtype)
        state0 = model_state if stateful else jnp.zeros((), dtype)
        (x, _, _, frames, _), _ = jax.lax.scan(
            step, (x_T, scan_rng, x_sc0, frames0, state0),
            (ts, rev_flags, jnp.arange(n_ops))
        )
        return DiffusionOutput(x=x, intermediates=frames if log_every else None)

    # -- reverse process (DDIM) --------------------------------------------

    def ddim_sample(
        self,
        model_fn: DenoiseFn,
        rng: jax.Array,
        n_samples: int,
        num_steps: int = 250,
        eta: float = 0.0,
        method: str = "uniform",
        cond: Optional[jax.Array] = None,
        y: Optional[jax.Array] = None,
        mask: Optional[jax.Array] = None,
        x0: Optional[jax.Array] = None,
        x_T: Optional[jax.Array] = None,
        temperature: float = 1.0,
        guidance_scale: float = 1.0,
        guidance_rescale: float = 0.0,
        guidance_interval: Optional[Tuple[float, float]] = None,
        uncond: Optional[jax.Array] = None,
        y_uncond: Optional[jax.Array] = None,
        clip: bool = False,
        dynamic_threshold: Optional[float] = None,
        log_every: Optional[int] = None,
        dtype=jnp.float32,
        model_state: Any = None,
        start_index: Optional[int] = None,
        x0_proj: Optional[Callable[[jax.Array], jax.Array]] = None,
    ) -> DiffusionOutput:
        """DDIM sampling (reference ``DDIMSampler``, ddim.py:57-207).

        ``clip=True`` clamps pred_x0 to [-1,1] each step (lucidrains'
        clip_x_start; stabilizes weak models at extreme t). Default False for
        parity with the reference's unclipped p_sample_ddim.
        ``dynamic_threshold`` (a percentile, e.g. 0.995) replaces the static
        clip with Imagen dynamic thresholding (:func:`apply_dynamic_threshold`
        — the high-CFG saturation fix, arXiv:2205.11487); like the clip
        branch, eps is re-derived from the thresholded x0.

        * eta=0 gives the deterministic DDIM ODE; eta=1 recovers ancestral
          DDPM variance on the subsequence (Song et al. 2010.02502 eq. 16).
        * ``mask``/``x0``: RePaint-style inpainting -- before each step the
          known region of x0 is re-noised to the current level and composited
          (reference ddim.py:145-148; the reference's missing-noise-arg bug,
          SURVEY.md §2.4, is fixed here by actually drawing noise).
        * ``guidance_scale``/``uncond``: classifier-free guidance on the
          channel-concat conditioning by batch-doubling (reference
          ddim.py:177-181); ``y_uncond`` instead guides on class labels with
          a null-class pass (lucidrains classifier_free_guidance.py:374-386,
          596-686) -- pass the null-class index array (see
          ``UNetConfig.class_dropout_prob``).
        * ``start_index``: run only the LAST ``start_index`` steps of the
          subsequence (static; pairs with an ``x_T`` noised to
          ``dd.timesteps[start_index-1]`` — the SDEdit partial chain,
          diffusion/edit.py). Default runs the full subsequence.
        * ``x0_proj``: per-step projection applied to pred_x0 after the
          optional clip (DDNM's null-space data-consistency hook,
          diffusion/inverse.py; the direction term keeps the ORIGINAL e_t,
          arXiv:2212.00490 Alg. 1).

        The S-step loop is one ``lax.scan``.
        """
        dd: DDIMSchedule = make_ddim_schedule(self.schedule, num_steps, eta, method)
        shape = (n_samples, self.image_size, self.image_size, self.in_channels)

        init_rng, scan_rng = jax.random.split(rng)
        # f32 carry (same rationale as ddpm_sample: per-step quantization of
        # x accumulates across steps); ``dtype`` governs the model input and
        # the frames buffer
        img = (x_T.astype(jnp.float32) if x_T is not None
               else jax.random.normal(init_rng, shape, jnp.float32))

        steps = jnp.asarray(dd.timesteps)          # ascending DDPM t per DDIM index
        alphas = jnp.asarray(dd.alphas)
        alphas_prev = jnp.asarray(dd.alphas_prev)
        sigmas = jnp.asarray(dd.sigmas)

        start = dd.num_steps if start_index is None else int(start_index)
        assert 1 <= start <= dd.num_steps, (
            f"start_index {start_index} outside the {dd.num_steps}-step "
            "subsequence")
        n_frames = -(-start // log_every) if log_every else 0
        # stateful model (DeepCache etc.): fn(x, t, cond, y, state, i) ->
        # (eps, state). With batch-doubling guidance the doubled batch flows
        # through the stateful fn too -- build the initial state for batch
        # 2*n_samples in that case (deepcache_model_fn example_x).
        stateful = model_state is not None

        def step(carry, xs):
            idx, i = xs
            x, key, x_sc, frames, m_state = carry
            key, nk, mk = jax.random.split(key, 3)
            t_scalar = steps[idx]
            t = jnp.full((n_samples,), t_scalar, jnp.int32)

            if mask is not None:
                assert x0 is not None, "DDIM inpainting requires x0"
                img_orig = self.q_sample(x0, t, jax.random.normal(mk, shape, jnp.float32))
                x = img_orig * mask + (1.0 - mask) * x

            x_m = x.astype(dtype)  # model-facing view of the f32 carry
            if self.self_condition:
                cond_eff = self._with_self_cond(cond, x_sc)
                uncond_eff = self._with_self_cond(uncond, x_sc) if uncond is not None else None
            else:
                cond_eff, uncond_eff = cond, uncond

            def call_model(xx, tt, cc, yy, st):
                if stateful:
                    return model_fn(xx, tt, cc, yy, st, i)
                return model_fn(xx, tt, cc, yy), st

            x_in, t_in, c_in, y_in, doubled = cfg_double_inputs(
                x_m, t, cond_eff, y, uncond_eff, y_uncond, guidance_scale)
            out, m_state = call_model(x_in, t_in, c_in, y_in, m_state)
            raw = (cfg_combine(
                out,
                interval_scale(guidance_scale,
                               t_scalar / max(self.timesteps - 1, 1),
                               guidance_interval),
                guidance_rescale) if doubled else out)
            xf = x.astype(jnp.float32)
            e_t, pred_x0 = self._to_eps_x0(raw, xf, t)
            if clip or dynamic_threshold is not None:
                pred_x0 = (apply_dynamic_threshold(pred_x0, dynamic_threshold)
                           if dynamic_threshold is not None
                           else jnp.clip(pred_x0, -1.0, 1.0))
                # re-derive eps from the clamped x0 so the update is consistent
                a = _bcast(jnp.asarray(self.schedule.sqrt_alphas_cumprod), t)
                s = _bcast(jnp.asarray(self.schedule.sqrt_one_minus_alphas_cumprod), t)
                e_t = (xf - a * pred_x0) / jnp.maximum(s, 1e-8)
            if x0_proj is not None:
                # DDNM: range-space replacement happens LAST so the data
                # consistency A x0_hat = y is exact; e_t stays as predicted
                pred_x0 = x0_proj(pred_x0)

            a_t = alphas[idx]
            a_prev = alphas_prev[idx]
            sigma_t = sigmas[idx]

            # reference ddim.py:198-206; at eta == 0 every sigma is zero, so
            # skip the per-step Gaussian draw entirely (threefry over the
            # full image tensor x 50 steps is pure waste on the ODE path)
            dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma_t**2, 0.0)) * e_t
            x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt
            if eta != 0.0:
                x_prev = x_prev + sigma_t * jax.random.normal(nk, shape, jnp.float32) * temperature
            if self.self_condition:
                # clamped like lucidrains' clip_x_start sampling path
                x_sc = jnp.clip(pred_x0, -1.0, 1.0).astype(dtype)
            if log_every:
                frames = _log_frame(frames, x_prev.astype(dtype), i, log_every)
            return (x_prev, key, x_sc, frames, m_state), None

        # iterate DDIM indices in descending order (reference ddim.py:135,142)
        idxs = jnp.arange(start - 1, -1, -1)
        x_sc0 = jnp.zeros(shape, dtype) if self.self_condition else jnp.zeros((), dtype)
        frames0 = jnp.zeros((n_frames,) + shape, dtype) if log_every else jnp.zeros((), dtype)
        state0 = model_state if stateful else jnp.zeros((), dtype)
        (x, _, _, frames, _), _ = jax.lax.scan(
            step, (img, scan_rng, x_sc0, frames0, state0), (idxs, jnp.arange(start))
        )
        return DiffusionOutput(x=x, intermediates=frames if log_every else None)

    def dpm_sample(self, model_fn, rng, n_samples, **kw) -> "DiffusionOutput":
        """DPM-Solver++(2M) sampling (``diffusion/dpm_solver.py``) as a method,
        so all three samplers share the call surface (``ddpm_sample`` /
        ``ddim_sample`` / ``dpm_sample``) and wrappers like
        :class:`~eo_diffusion_tpu.diffusion.latent.LatentDiffusion` can route
        uniformly."""
        from eo_diffusion_tpu.diffusion.dpm_solver import dpm_solver_sample

        return dpm_solver_sample(self, model_fn, rng, n_samples, **kw)

    def unipc_sample(self, model_fn, rng, n_samples, **kw) -> "DiffusionOutput":
        """UniPC-2 predictor-corrector (diffusion/unipc.py) as a method, so
        the CLIs and :class:`~eo_diffusion_tpu.diffusion.latent.LatentDiffusion`
        route uniformly."""
        from eo_diffusion_tpu.diffusion.unipc import unipc_sample

        return unipc_sample(self, model_fn, rng, n_samples, **kw)

    # -- latent interpolation ------------------------------------------------

    def interpolate(
        self,
        model_fn: DenoiseFn,
        rng: jax.Array,
        x1: jax.Array,
        x2: jax.Array,
        lam: float = 0.5,
        t: Optional[int] = None,
        clip: bool = True,
        dtype=jnp.float32,
    ) -> DiffusionOutput:
        """Interpolate between two images in noise space (reference lucidrains
        ``GaussianDiffusion.interpolate``, denoising_diffusion_pytorch.py:638-651):
        q-sample both endpoints to level ``t`` (default T-1), lerp the two
        latents with ``lam``, and run the ancestral reverse chain from t.
        """
        t = self.timesteps - 1 if t is None else int(t)
        assert 0 < t < self.timesteps, t
        assert x1.shape == x2.shape, (x1.shape, x2.shape)
        shape = x1.shape
        r1, r2, scan_rng = jax.random.split(rng, 3)
        tb = jnp.full((shape[0],), t, jnp.int32)
        xt1 = self.q_sample(x1.astype(jnp.float32), tb, jax.random.normal(r1, shape, jnp.float32))
        xt2 = self.q_sample(x2.astype(jnp.float32), tb, jax.random.normal(r2, shape, jnp.float32))
        x = (1.0 - lam) * xt1 + lam * xt2

        def step(carry, t_scalar):
            # f32 carry like the other samplers; ``dtype`` casts the model input
            x_t, key = carry
            key, nk = jax.random.split(key)
            noise = jax.random.normal(nk, shape, jnp.float32)
            tt = jnp.full((shape[0],), t_scalar, jnp.int32)
            x_in = x_t.astype(dtype)
            eff_fn = lambda *_a: model_fn(x_in, tt, None, None)
            x_t, _ = self._reverse_step(eff_fn, x_t, tt, noise, None, None, clip)
            return (x_t, key), None

        ts = jnp.arange(t - 1, -1, -1)
        (x, _), _ = jax.lax.scan(step, (x, scan_rng), ts)
        return DiffusionOutput(x=x)
