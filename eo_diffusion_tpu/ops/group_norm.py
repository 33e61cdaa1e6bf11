"""Fused GroupNorm + affine(+FiLM) + SiLU Pallas kernel.

The reference's ResBlock body is GroupNorm32 -> SiLU -> conv with an optional
FiLM scale-shift from the timestep embedding (unet_openai.py:312-343,
374-384). XLA runs the normalization as separate reduce + normalize passes;
this kernel does one read + one write of HBM per tensor: per-group
mean/variance (via a tiny group-indicator matmul on the MXU), the affine,
and the SiLU all happen in VMEM in float32.

FiLM folds into the same kernel: with per-sample gamma/beta
``y = xhat * gamma[n] + beta[n]`` where the caller passes
``gamma[n] = scale_param * (1 + film_scale[n])`` and
``beta[n] = bias_param * (1 + film_scale[n]) + film_shift[n]``
(exactly what GN -> *(1+s)+t composes to).

Dispatch: the kernel requires the [HW, C] slab to fit in VMEM; larger
activations (e.g. 256^2 level-0 slabs) fall back to the XLA path, as do
non-TPU backends. Differentiable via custom_vjp with an XLA-recompute
backward.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["fused_group_norm", "group_norm_reference"]

_VMEM_BUDGET = 10 * 2**20  # conservative per-slab budget (bytes, f32 copy)


def group_norm_reference(x, gamma, beta, groups: int, eps: float = 1e-5,
                         act: str = "none"):
    """XLA reference path. x: [N,H,W,C]; gamma/beta: [N,C] (per-sample affine)."""
    n, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(n, h * w, groups, c // groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    xhat = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(n, h, w, c)
    y = xhat * gamma[:, None, None, :].astype(jnp.float32) + beta[:, None, None, :].astype(jnp.float32)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


def _gn_kernel(x_ref, gamma_ref, beta_ref, o_ref, *, groups: int, eps: float, act: str):
    x = x_ref[0].astype(jnp.float32)  # [HW, C]
    hw, c = x.shape
    cg = c // groups

    # group-indicator matmul: exact per-group sums on the MXU
    ch_ids = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // cg
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    m = (ch_ids == g_ids).astype(jnp.float32)  # [C, G]

    s1 = jnp.sum(x, axis=0, keepdims=True)  # [1, C]
    s2 = jnp.sum(x * x, axis=0, keepdims=True)
    denom = jnp.float32(hw * cg)
    gmean = jax.lax.dot(s1, m, preferred_element_type=jnp.float32) / denom  # [1, G]
    gsq = jax.lax.dot(s2, m, preferred_element_type=jnp.float32) / denom
    gvar = gsq - gmean * gmean
    grstd = jax.lax.rsqrt(gvar + eps)

    mean_c = jax.lax.dot(gmean, m.T, preferred_element_type=jnp.float32)  # [1, C]
    rstd_c = jax.lax.dot(grstd, m.T, preferred_element_type=jnp.float32)

    gamma = gamma_ref[0].astype(jnp.float32)  # [1, C]
    beta = beta_ref[0].astype(jnp.float32)
    y = (x - mean_c) * rstd_c * gamma + beta
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


def _gn_pallas(x, gamma, beta, groups: int, eps: float, act: str, interpret: bool = False):
    n, h, w, c = x.shape
    xf = x.reshape(n, h * w, c)
    out = pl.pallas_call(
        functools.partial(_gn_kernel, groups=groups, eps=eps, act=act),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h * w, c), x.dtype),
        interpret=interpret,
    )(xf, gamma[:, None, :], beta[:, None, :])
    return out.reshape(n, h, w, c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _gn_op(x, gamma, beta, groups, eps, act):
    return _gn_pallas(x, gamma, beta, groups, eps, act)


def _gn_fwd(x, gamma, beta, groups, eps, act):
    return _gn_pallas(x, gamma, beta, groups, eps, act), (x, gamma, beta)


def _gn_bwd(groups, eps, act, res, g):
    x, gamma, beta = res
    _, vjp = jax.vjp(
        lambda x, ga, be: group_norm_reference(x, ga, be, groups, eps, act), x, gamma, beta
    )
    return vjp(g)


_gn_op.defvjp(_gn_fwd, _gn_bwd)


def fused_group_norm(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    groups: int = 32,
    eps: float = 1e-5,
    act: str = "none",
    impl: str = "auto",
) -> jax.Array:
    """GroupNorm + per-sample affine + optional SiLU, fused where profitable.

    x: [N,H,W,C]; gamma/beta: [C] or [N,C].
    """
    n, h, w, c = x.shape
    if gamma.ndim == 1:
        gamma = jnp.broadcast_to(gamma[None], (n, c))
    if beta.ndim == 1:
        beta = jnp.broadcast_to(beta[None], (n, c))

    on_tpu = jax.default_backend() in ("tpu", "axon")
    fits = (h * w * c * 4) <= _VMEM_BUDGET
    lane_ok = c % 128 == 0 and (h * w) % 8 == 0
    # Measured on v5e: the Pallas GN is correctness-parity but within noise of
    # XLA's own fused GN at UNet shapes, so "auto" prefers XLA; "pallas" is
    # available for explicit experimentation on other topologies.
    if impl != "pallas" or not (on_tpu and fits and lane_ok):
        return group_norm_reference(x, gamma, beta, groups, eps, act)
    return _gn_op(x, gamma, beta, groups, eps, act)
