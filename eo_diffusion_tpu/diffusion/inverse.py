"""DDNM zero-shot restoration: solve linear inverse problems with a plain
trained DDPM, no task-specific training (Wang et al. 2023, arXiv:2212.00490).

Given observation y = A(x) for a known linear degradation A with
pseudo-inverse A+, every reverse DDIM step replaces the range-space
component of the predicted clean image:

    x0_hat = A+ y + (I - A+ A) x0_pred

so A(x0_hat) = y exactly (noise-free DDNM, Alg. 1) while the diffusion
prior fills the null space. This turns ANY unconditional checkpoint in the
framework into a super-resolver / inpainter / colorizer — a capability the
reference does not have at all (its restoration story is RePaint-mask
compositing inside sampling, reference diffusion/model.py:58-60, which
covers inpainting only and needs cond_type='sum' plumbing).

TPU shape: operators are closed-form jnp functions (pooling / masking /
channel means), so the projection fuses into the sampler's single
``lax.scan`` via :meth:`GaussianDiffusion.ddim_sample`'s ``x0_proj`` hook —
zero extra model calls, no host round-trips.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from eo_diffusion_tpu.diffusion.gaussian import DiffusionOutput, GaussianDiffusion

__all__ = [
    "LinearOperator",
    "sr_operator",
    "inpaint_operator",
    "gray_operator",
    "ddnm_projector",
    "ddnm_sample",
]


@dataclasses.dataclass(frozen=True)
class LinearOperator:
    """A linear degradation A with its Moore-Penrose pseudo-inverse A+.

    Both are NHWC -> NHWC-like maps; the only contract the DDNM projector
    needs is A(A+(y)) == y (A+ is a right inverse on A's range), which
    holds in closed form for all three operators below.
    """

    forward: Callable[[jax.Array], jax.Array]  # A
    pinv: Callable[[jax.Array], jax.Array]     # A+
    name: str = "linear"


def sr_operator(factor: int) -> LinearOperator:
    """Box-downsampling A (factor x factor mean pool); A+ = nearest upsample.

    For the box kernel the rows of A are orthogonal with squared norm
    1/factor^2, so A+ = A^T (A A^T)^-1 = replicate — cheap and exact.
    """
    assert factor >= 1

    def fwd(x):
        n, h, w, c = x.shape
        assert h % factor == 0 and w % factor == 0, (h, w, factor)
        x = x.reshape(n, h // factor, factor, w // factor, factor, c)
        return x.mean(axis=(2, 4))

    def pinv(y):
        return jnp.repeat(jnp.repeat(y, factor, axis=1), factor, axis=2)

    return LinearOperator(fwd, pinv, name=f"sr{factor}")


def inpaint_operator(mask: jax.Array) -> LinearOperator:
    """Masking A (mask == 1 observed); A+ = the same mask (A is a
    coordinate projection, so A+ = A^T restricted to the kept entries)."""
    m = jnp.asarray(mask, jnp.float32)
    return LinearOperator(lambda x: x * m, lambda y: y * m, name="inpaint")


def gray_operator(channels: int = 3) -> LinearOperator:
    """Channel-mean A (grayscale); A+ replicates the gray value. For the
    row a = (1/C, ..., 1/C): A+ = a^T (a a^T)^-1 = ones. Restoration with
    this operator is zero-shot colorization."""

    def fwd(x):
        return x.mean(axis=-1, keepdims=True)

    def pinv(y):
        return jnp.repeat(y, channels, axis=-1)

    return LinearOperator(fwd, pinv, name="gray")


def ddnm_projector(op: LinearOperator, y: jax.Array) -> Callable:
    """The per-step x0 replacement: x0 - A+ A x0 + A+ y (Alg. 1 line 5)."""
    y = jnp.asarray(y, jnp.float32)

    def proj(x0):
        return x0 - op.pinv(op.forward(x0)) + op.pinv(y)

    return proj


def ddnm_sample(
    diffusion: GaussianDiffusion,
    model_fn: Callable,
    rng: jax.Array,
    y: jax.Array,
    op: LinearOperator,
    num_steps: int = 100,
    eta: float = 0.85,
    clip: bool = True,
    **kw: Any,
) -> DiffusionOutput:
    """Restore x from observation ``y`` under ``op`` with a plain DDPM.

    ``y`` lives in observation space (e.g. the low-res image for
    :func:`sr_operator`); batch size and the restored shape derive from
    ``A+ y``. ``eta=0.85`` is the paper's default (stochasticity helps the
    null-space prior mix); ``clip=True`` clamps pred_x0 before the
    projection so the final range-space replacement stays exact. Extra
    ``kw`` (guidance, model_state, ...) flow to ``ddim_sample``.
    """
    x_init = op.pinv(jnp.asarray(y, jnp.float32))
    n = x_init.shape[0]
    assert x_init.shape[1] == diffusion.image_size and \
        x_init.shape[-1] == diffusion.in_channels, (
        f"A+ y has shape {x_init.shape}; the process expects "
        f"{diffusion.image_size}px x {diffusion.in_channels}ch")
    proj = ddnm_projector(op, y)
    out = diffusion.ddim_sample(
        model_fn, rng, n, num_steps=num_steps, eta=eta, clip=clip,
        x0_proj=proj, **kw)
    # final paste: the chain's last update still blends sqrt(1-acp[0])*e_t
    # into the output; projecting once more makes A(x) = y exact (the same
    # convention as the samplers' final RePaint paste, flow.py/dpm_solver.py)
    return DiffusionOutput(x=proj(out.x), intermediates=out.intermediates)
