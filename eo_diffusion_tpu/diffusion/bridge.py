"""Brownian-bridge diffusion (BBDM) for paired image-to-image translation.

Beyond-reference capability. The reference attacks cloud removal either
generatively (unconditional DDPM + RePaint composite, reference
diffusion/model.py:58-60) or with channel-concat conditioning
(backbones/unet_openai.py:754-756) — both still start sampling from pure
noise and must re-synthesize the whole image. A Brownian bridge (Li et
al., "BBDM: Image-to-Image Translation with Brownian Bridge Diffusion
Models", CVPR 2023, arXiv:2205.07680) instead pins BOTH endpoints of the
process: with source image y (the cloudy view) and target x0 (the clear
view),

    x_t = (1 - m_t) x0 + m_t y + sqrt(delta_t) eps
    m_t = t / (T - 1),    delta_t = 2 s (m_t - m_t^2)

the variance vanishes at both ends, so x_{T-1} = y exactly: sampling
STARTS AT THE SOURCE IMAGE and the reverse process only has to move what
differs between the domains. The network regresses the full residual

    target = m_t (y - x0) + sqrt(delta_t) eps        (BBDM eq. 9)

so the data prediction is simply ``x0_hat = x_t - pred``.

Reverse transitions are the exact Gaussian bridge posterior
q(x_s | x_t, x0, y) for any s < t (not just adjacent steps), derived via
the Kalman form instead of BBDM's adjacent-step coefficient tables so one
formula serves strided sampling too:

    a    = (1 - m_t) / (1 - m_s)                  (transition gain)
    K    = a * delta_s / delta_t                  (gain; 0 when delta_t = 0)
    mean = mu_s + K (x_t - mu_t),   mu_r = (1 - m_r) x0_hat + m_r y
    var  = delta_s (delta_t - a^2 delta_s) / delta_t

The endpoint degeneracies need no special-casing beyond a guarded divide:
at t = T-1 (delta_t = 0) the posterior collapses to the prior
N(mu_s, delta_s); at s = 0 (delta_s = 0) it collapses to N(x0_hat, 0).

TPU shape: the whole trajectory is one ``lax.scan`` inside a single jit
(like every other sampler here); coefficient tables are host-precomputed
and gathered per step.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from eo_diffusion_tpu.diffusion.gaussian import DiffusionOutput, _log_frame

__all__ = ["BrownianBridge"]


@dataclasses.dataclass(frozen=True)
class BrownianBridge:
    """Discrete Brownian-bridge process between paired images.

    ``cond`` everywhere below is the SOURCE image y (e.g. the cloudy view):
    it is required — it is the far endpoint of the bridge, not an optional
    conditioning signal. With ``cond_type="concat"`` (the default and what
    the presets use) the source is additionally channel-concatenated into
    the denoiser like every other concat recipe; ``cond_type=None`` runs
    the paper's pure formulation where y enters only through the bridge.
    """

    image_size: int
    in_channels: int
    timesteps: int = 1000
    max_var: float = 1.0  # s in delta_t = 2 s (m_t - m_t^2); BBDM's "s"
    cond_type: Optional[str] = "concat"

    @classmethod
    def create(cls, image_size: int = 64, in_channels: int = 3,
               timesteps: int = 1000, cond_type: Optional[str] = "concat",
               **kw) -> "BrownianBridge":
        assert cond_type in (None, "concat"), (
            f"BrownianBridge supports cond_type None|'concat', got "
            f"{cond_type!r} (sum/RePaint is a masking protocol; the bridge "
            f"is already image-conditional through its endpoint)")
        return cls(image_size=image_size, in_channels=in_channels,
                   timesteps=timesteps, cond_type=cond_type, **kw)

    # -- schedule ------------------------------------------------------------

    def _m(self, t: jax.Array) -> jax.Array:
        return t.astype(jnp.float32) / float(self.timesteps - 1)

    def _delta(self, m: jax.Array) -> jax.Array:
        return 2.0 * self.max_var * (m - m * m)

    def marginal(self, x0: jax.Array, y: jax.Array, t: jax.Array,
                 eps: jax.Array) -> jax.Array:
        """x_t = (1-m_t) x0 + m_t y + sqrt(delta_t) eps (BBDM eq. 4-5)."""
        m = self._m(t)[:, None, None, None]
        d = self._delta(m)
        return (1.0 - m) * x0 + m * y + jnp.sqrt(d) * eps

    # -- training -------------------------------------------------------------

    def training_tuple(self, rng: jax.Array, x0: jax.Array,
                       noise: Optional[jax.Array] = None,
                       cond: Optional[jax.Array] = None):
        """One training instance ``(x_t, t_model, target)`` with
        ``loss = mean((model(x_t, t_model) - target)^2)`` — the shared
        decomposition contract (see flow.py:71-91). ``cond`` is the bridge
        endpoint y and is required."""
        assert cond is not None, "BrownianBridge training requires the source image (cond)"
        t_rng, n_rng = jax.random.split(rng)
        n = x0.shape[0]
        # t=0 is the trivial identity instance (x_0 = x0, target 0): skip it
        t = jax.random.randint(t_rng, (n,), 1, self.timesteps)
        eps = (noise.astype(jnp.float32) if noise is not None
               else jax.random.normal(n_rng, x0.shape, jnp.float32))
        x0f = x0.astype(jnp.float32)
        yf = cond.astype(jnp.float32)
        m = self._m(t)[:, None, None, None]
        d = self._delta(m)
        x_t = (1.0 - m) * x0f + m * yf + jnp.sqrt(d) * eps
        target = m * (yf - x0f) + jnp.sqrt(d) * eps
        return x_t.astype(x0.dtype), t, target

    def train_loss(self, model_fn: Callable, rng: jax.Array, x0: jax.Array,
                   cond: Optional[jax.Array] = None, y=None,
                   noise: Optional[jax.Array] = None) -> jax.Array:
        """BBDM residual-MSE (eq. 9). ``cond`` (the source image) shapes the
        bridge; with ``cond_type='concat'`` it also conditions the model."""
        x_t, t, target = self.training_tuple(rng, x0, noise, cond)
        c = cond if self.cond_type == "concat" else None
        pred = model_fn(x_t, t, c, y)
        return jnp.mean((pred.astype(jnp.float32) - target) ** 2)

    # -- sampling -------------------------------------------------------------

    def strided_grid(self, num_steps: int):
        """``(num_steps, t_seq, m_seq, d_seq)`` for an S-step strided chain
        — ``num_steps`` is the CLAMPED count (at most T-1, like DDIM's
        table edge) and must replace the caller's value. Shared by
        :meth:`sample` and the tiled whole-scene sampler so the grid and
        variance tables cannot diverge."""
        T = self.timesteps
        assert num_steps >= 1, num_steps
        num_steps = min(num_steps, T - 1)
        ts = np.linspace(T - 1, 0, num_steps + 1).round().astype(np.int32)
        assert len(np.unique(ts)) == len(ts), (
            "strided grid collapsed; lower num_steps")
        t_seq = jnp.asarray(ts)
        m_seq = t_seq.astype(jnp.float32) / float(T - 1)
        d_seq = 2.0 * self.max_var * (m_seq - m_seq * m_seq)
        return num_steps, t_seq, m_seq, d_seq

    @staticmethod
    def posterior_step(x, x0_hat, yf, m_t, m_s, d_t, d_s):
        """One strided bridge posterior update (Kalman form): returns
        ``(mean, var)`` of x_s | x_t, x0_hat, y. The d_t == 0 guards cover
        the endpoints where the bridge variance vanishes. Single source of
        truth for :meth:`sample` AND ``tiled.tiled_bridge_sample``."""
        a = (1.0 - m_t) / (1.0 - m_s)  # m_s < 1 for every s < t <= T-1
        safe_dt = jnp.where(d_t > 0, d_t, 1.0)
        gain = jnp.where(d_t > 0, a * d_s / safe_dt, 0.0)
        mu_t = (1.0 - m_t) * x0_hat + m_t * yf
        mu_s = (1.0 - m_s) * x0_hat + m_s * yf
        mean = mu_s + gain * (x - mu_t)
        var = jnp.where(d_t > 0,
                        d_s * jnp.maximum(d_t - a * a * d_s, 0.0) / safe_dt,
                        d_s)
        return mean, var

    def sample(
        self,
        model_fn: Callable,
        rng: jax.Array,
        n_samples: int,
        num_steps: int = 50,
        cond: Optional[jax.Array] = None,
        y: Optional[jax.Array] = None,
        clip: bool = True,
        log_every: Optional[int] = None,
        dtype=jnp.float32,
        model_state: Any = None,
        eta: float = 1.0,
    ) -> DiffusionOutput:
        """Translate ``cond`` (source) to the target domain in ``num_steps``
        strided bridge-posterior steps. No noise init: x starts at the
        source image (the m=1 endpoint, where the marginal is exactly y).

        ``eta`` scales the posterior noise (1 = exact ancestral bridge,
        0 = fully deterministic mean path — the bridge analog of DDIM-eta0).
        ``model_state`` threads a stateful denoiser (DeepCache) exactly like
        the other samplers.
        """
        assert cond is not None, "BrownianBridge sampling requires the source image (cond)"
        shape = (n_samples, self.image_size, self.image_size, self.in_channels)
        num_steps, t_seq, m_seq, d_seq = self.strided_grid(num_steps)

        yf = cond.astype(jnp.float32)
        c_model = cond.astype(dtype) if self.cond_type == "concat" else None
        x = jnp.broadcast_to(yf, shape)  # x_{T-1} = y exactly (delta = 0)
        stateful = model_state is not None
        n_frames = -(-num_steps // log_every) if log_every else 0

        def call_model(xx, tt, st, i):
            if stateful:
                return model_fn(xx, tt, c_model, y, st, i)
            return model_fn(xx, tt, c_model, y), st

        def step(carry, xs):
            i, key = xs
            x, frames, st = carry
            t_i = jnp.full((n_samples,), t_seq[i], jnp.int32)
            pred, st = call_model(x.astype(dtype), t_i, st, i)
            x0_hat = x - pred.astype(jnp.float32)
            if clip:
                x0_hat = jnp.clip(x0_hat, -1.0, 1.0)

            mean, var = self.posterior_step(x, x0_hat, yf,
                                            m_seq[i], m_seq[i + 1],
                                            d_seq[i], d_seq[i + 1])
            if eta != 0.0:  # static: the deterministic path skips threefry
                mean = mean + eta * jnp.sqrt(var) * jax.random.normal(
                    key, shape, jnp.float32)
            x = mean
            if log_every:
                frames = _log_frame(frames, x.astype(dtype), i, log_every)
            return (x, frames, st), None

        frames0 = (jnp.zeros((n_frames,) + shape, dtype) if log_every
                   else jnp.zeros((), dtype))
        state0 = model_state if stateful else jnp.zeros((), dtype)
        keys = jax.random.split(rng, num_steps)
        (x, frames, _), _ = jax.lax.scan(
            step, (x, frames0, state0), (jnp.arange(num_steps), keys))
        return DiffusionOutput(x=x, intermediates=frames if log_every else None)
