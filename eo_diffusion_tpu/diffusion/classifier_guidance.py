"""Classifier guidance (Dhariwal & Nichol 2021) for the samplers.

The guided-diffusion counterpart to classifier-free guidance: a noisy-image
classifier (:class:`eo_diffusion_tpu.models.encoder_unet.EncoderUNet`)
steers the reverse process through its input gradient,

    eps'(x_t, t) = eps(x_t, t) - sqrt(1 - acp_t) * s * grad_x log p(y | x_t)

(the eps-space form of adding ``s * grad log p(y|x)`` to the score). The
wrapper composes with any of this framework's samplers: wrap the denoiser
``model_fn`` and pass it to ``ddpm_sample`` / ``ddim_sample`` /
``dpm_solver_sample`` unchanged.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion

__all__ = ["classifier_guided"]


def classifier_guided(
    diffusion: GaussianDiffusion,
    model_fn: Callable,
    classifier_fn: Callable,
    y: jax.Array,
    scale: float = 1.0,
) -> Callable:
    """Wrap ``model_fn`` with classifier gradients toward labels ``y``.

    :param classifier_fn: (x_t, t) -> logits [N, num_classes]
    :param y: [N] target labels.
    :returns: a model_fn computing guided eps in the diffusion's native
        objective space (output converted back so any objective works).
    """
    assert diffusion.objective == "eps", (
        "classifier guidance wrapper currently assumes an eps-objective model"
    )
    somacp = jnp.asarray(diffusion.schedule.sqrt_one_minus_alphas_cumprod)

    def log_prob_selected(x, t):
        logits = classifier_fn(x, t)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        return jnp.sum(jnp.take_along_axis(logp, y[:, None], axis=1))

    def guided(x, t, cond, yy):
        eps = model_fn(x, t, cond, yy)
        grad = jax.grad(log_prob_selected)(x.astype(jnp.float32), t)
        return eps - somacp[t][:, None, None, None] * scale * grad.astype(eps.dtype)

    return guided
