"""NN primitives for the TPU UNet.

TPU-first re-designs of the reference's torch helpers
(``backbones/unet_openai.py:11-148``):

* ``timestep_embedding``  -> reference ``unet_openai.py:81-99``
* ``GroupNorm32``         -> reference ``unet_openai.py:11-13`` (float32 stats)
* zero-init convolutions  -> reference ``zero_module`` (``unet_openai.py:62-68``)

Layout convention is NHWC throughout (TPU-native; XLA tiles the channel axis
onto the 128-lane VPU/MXU). The checkpoint converter handles the NCHW->NHWC
and OIHW->HWIO transposes from torch checkpoints.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

__all__ = [
    "timestep_embedding",
    "GroupNorm32",
    "Conv",
    "ZeroConv",
    "Dense",
    "ZeroDense",
    "avg_pool_2d",
    "nearest_upsample_2d",
]


def timestep_embedding(
    timesteps: jax.Array, dim: int, max_period: float = 10000.0
) -> jax.Array:
    """Sinusoidal timestep embeddings (reference ``unet_openai.py:81-99``).

    :param timesteps: [N] (possibly fractional) timestep indices.
    :param dim: output embedding dimension.
    :returns: [N, dim] float32 embeddings (cos | sin halves, zero-padded if odd).
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period)
        * jnp.arange(half, dtype=jnp.float32)
        / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate(
            [embedding, jnp.zeros_like(embedding[:, :1])], axis=-1
        )
    return embedding


class GroupNorm32(nn.Module):
    """GroupNorm(32) with float32 statistics regardless of activation dtype.

    Matches the reference ``GroupNorm32`` (``unet_openai.py:11-13``): the
    input is cast to float32 for normalization and cast back, so bf16
    activations do not degrade the normalization statistics.
    """

    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        orig_dtype = x.dtype
        # 32 groups whenever divisible (parity with the reference); otherwise
        # fall back to the largest divisor <= 32 instead of crashing on
        # non-multiple-of-32 widths (small/tiny configs).
        ch = x.shape[-1]
        groups = min(self.num_groups, ch)
        while ch % groups:
            groups -= 1
        y = nn.GroupNorm(
            num_groups=groups,
            epsilon=self.epsilon,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x.astype(jnp.float32))
        return y.astype(orig_dtype)


def Conv(
    features: int,
    kernel: int = 3,
    stride: int = 1,
    *,
    dtype: Any = jnp.float32,
    name: Optional[str] = None,
) -> nn.Conv:
    """2D conv with torch-style explicit padding = (kernel-1)//2.

    Explicit symmetric padding (not XLA 'SAME') so strided convs place the
    window exactly like torch ``Conv2d(padding=1)`` -- required for
    bit-parity with converted reference checkpoints.
    """
    pad = (kernel - 1) // 2
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def ZeroConv(
    features: int,
    kernel: int = 3,
    *,
    dtype: Any = jnp.float32,
    name: Optional[str] = None,
) -> nn.Conv:
    """Zero-initialized conv (reference ``zero_module``, ``unet_openai.py:62-68``)."""
    pad = (kernel - 1) // 2
    return nn.Conv(
        features=features,
        kernel_size=(kernel, kernel),
        padding=((pad, pad), (pad, pad)),
        kernel_init=nn.initializers.zeros,
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def Dense(features: int, *, dtype: Any = jnp.float32, name: Optional[str] = None) -> nn.Dense:
    return nn.Dense(features=features, dtype=dtype, param_dtype=jnp.float32, name=name)


def ZeroDense(features: int, *, dtype: Any = jnp.float32, name: Optional[str] = None) -> nn.Dense:
    return nn.Dense(
        features=features,
        kernel_init=nn.initializers.zeros,
        bias_init=nn.initializers.zeros,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


def avg_pool_2d(x: jax.Array, window: int = 2) -> jax.Array:
    """Average pooling, NHWC."""
    return nn.avg_pool(x, (window, window), strides=(window, window))


def nearest_upsample_2d(x: jax.Array) -> jax.Array:
    """2x nearest-neighbour upsample, NHWC (reference ``Upsample``, unet_openai.py:229-242).

    Includes the reference's 3x3 -> 7x7 padding hack (``unet_openai.py:237-239``):
    a 3x3 spatial input upsamples to 6x6 and is padded at the top/left to 7x7
    so odd-sized pyramids (e.g. 28px inputs) round-trip.
    """
    n, h, w, c = x.shape
    out = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    if h == w == 3:
        out = jnp.pad(out, ((0, 0), (1, 0), (1, 0), (0, 0)))
    return out
