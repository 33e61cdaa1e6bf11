"""Weight-only int8 quantization for serving (beyond-reference).

Production-serving option: matrix/conv kernels are stored as symmetric
per-output-channel int8 with float32 scales and dequantized *inside* the
jitted sampler program — halving parameter HBM storage and the per-step
weight-read bandwidth of the always-warm server (serving/engine.py
``ServingConfig.int8`` / ``cli.serve --int8``). Activations stay bf16/f32:
this is W8A16 in the usual taxonomy, chosen because on TPU the weight
*read* is the part the batch size cannot amortize at serving batch sizes,
while int8 *arithmetic* would need Pallas quantized kernels for a further
win (not attempted — XLA fuses the dequant multiply into the consumer
matmul's operand stream).

Policy: only leaves with ``ndim >= 2`` quantize (Dense ``[in, out]`` and
conv ``[h, w, in, out]`` kernels, per-last-axis scales); biases, norm
scales and embeddings-as-vectors stay float32 (negligible bytes, outsized
quality impact). The quantized model is a *pair of pytrees* with the
original structure — int8 values + broadcast-ready scales — so the whole
thing rides jit arguments and ``jax.tree`` utilities unchanged.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

__all__ = ["quantize_tree", "dequantize_tree", "quantized_bytes"]


def _quantize_leaf(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel (last axis) int8: returns (q, scale)
    with ``w ~ q * scale``; scale shaped to broadcast against w."""
    reduce_axes = tuple(range(w.ndim - 1))
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=reduce_axes,
                   keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale.astype(jnp.float32)


def quantize_tree(params: Any) -> Tuple[Any, Any]:
    """Quantize every >=2-D leaf; 1-D/0-D leaves pass through with a unit
    scalar scale so the two trees stay structurally identical."""

    def q(w):
        if w.ndim >= 2:
            return _quantize_leaf(w)
        return w, jnp.float32(1.0)

    pairs = jax.tree.map(q, params)
    qt = jax.tree.map(lambda p: p[0], pairs,
                      is_leaf=lambda x: isinstance(x, tuple))
    st = jax.tree.map(lambda p: p[1], pairs,
                      is_leaf=lambda x: isinstance(x, tuple))
    return qt, st


def dequantize_tree(qt: Any, st: Any, dtype=jnp.float32) -> Any:
    """Reconstruct the float tree (jit-friendly: one fused multiply per
    quantized leaf; pass-through leaves return unchanged)."""

    def d(q, s):
        if q.dtype == jnp.int8:
            return (q.astype(jnp.float32) * s).astype(dtype)
        return q

    return jax.tree.map(d, qt, st)


def quantized_bytes(qt: Any) -> int:
    return sum(leaf.size * leaf.dtype.itemsize
               for leaf in jax.tree.leaves(qt))
