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

import contextlib as _contextlib
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
    "int8_dense_compute",
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


# --------------------------------------------------------------------------
# W8A8 int8 compute (VERDICT r4 item 4). Trace-time routing like
# ops.attention's identity/sequence contexts: inside int8_dense_compute(),
# Dense() returns a module with IDENTICAL param structure (kernel/bias,
# f32 masters) whose matmul runs on the MXU's int8 path — per-output-
# channel weight quantization and per-tensor dynamic activation
# quantization happen in-graph, so ANY trained checkpoint serves quantized
# with no conversion. Measured on-chip (gallery/int8_mxu_probe.json): the
# win is matmul-shaped — 2.0x on the DiT [8192,768]x[768,768] proj, ~1.1x
# on the 768->3072 MLP, <=1.0x on small or conv shapes — so only matmuls
# above _INT8_MIN_* thresholds take the quantized path.
# --------------------------------------------------------------------------

_INT8_DENSE = False
_INT8_MIN_ROWS = 1024
_INT8_MIN_DIM = 256


@_contextlib.contextmanager
def int8_dense_compute():
    """Context manager: route large Dense matmuls through int8 compute.

    Enter around the model call while jit traces it (the serving engine
    and cli.inference do this under ``--int8_compute``); the routing is
    baked into the jaxpr.
    """
    global _INT8_DENSE
    prev, _INT8_DENSE = _INT8_DENSE, True
    try:
        yield
    finally:
        _INT8_DENSE = prev


class _Int8Dense(nn.Module):
    """Drop-in nn.Dense with W8A8 matmul (same params: f32 kernel/bias)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_dim, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        rows = 1
        for s in x.shape[:-1]:
            rows *= s
        if (rows < _INT8_MIN_ROWS or in_dim < _INT8_MIN_DIM
                or self.features < _INT8_MIN_DIM):
            # below the measured break-even: plain matmul (nn.Dense
            # semantics — compute in self.dtype)
            xd = x.astype(self.dtype)
            return xd @ kernel.astype(self.dtype) + bias.astype(self.dtype)
        # per-output-channel symmetric weight quant (in-graph; XLA hoists
        # the constant-foldable part, and the cost is trivial vs the matmul)
        sw = jnp.maximum(jnp.max(jnp.abs(kernel), axis=0), 1e-12) / 127.0
        qw = jnp.clip(jnp.round(kernel / sw), -127, 127).astype(jnp.int8)
        # dynamic per-tensor activation quant (f32 statistics)
        xf = x.astype(jnp.float32)
        sx = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12) / 127.0
        qx = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(
            qx.reshape(rows, in_dim), qw, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (sx * sw) + bias
        return y.reshape(x.shape[:-1] + (self.features,)).astype(self.dtype)


def Dense(features: int, *, dtype: Any = jnp.float32, name: Optional[str] = None):
    if _INT8_DENSE:
        return _Int8Dense(features=features, dtype=dtype, name=name)
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
