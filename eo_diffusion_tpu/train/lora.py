"""LoRA parameter-efficient fine-tuning (Hu et al. 2021, arXiv:2106.09685).

Adapt a trained diffusion checkpoint to a new domain — another sensor,
region, or season, the canonical EO transfer problem — by training only
low-rank deltas on the kernel leaves: W_eff = W + (alpha/r) * A @ B with
A ~ N(0, 1/r), B = 0 (so the adapter starts as an exact identity). The
reference has no fine-tuning story at all beyond full-weights --ckpt
resume (reference train.py:94-98).

Framework shape: LoRA here is pure **pytree surgery**, not a model
rewrite — ``lora_init`` builds a small {path: {"a","b"}} tree over the
selected kernels, ``lora_merge`` maps it back onto the base params, and
the merged tree feeds the UNMODIFIED flax apply. Under jit the merge is
a handful of small matmuls fused into the step; gradients flow through
the merge into the adapter leaves only, so the optimizer state is rank x
(fan_in + fan_out) per target instead of the full kernel. Works for any
backbone in the registry (conv kernels flatten to (kh*kw*cin, cout); 2-D
dense kernels as-is).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.tree_util import keystr, tree_flatten_with_path

__all__ = ["lora_init", "lora_merge", "lora_param_count", "lora_spec"]


def _is_target(path, leaf, match: Optional[Sequence[str]]) -> bool:
    if getattr(path[-1], "key", None) != "kernel" or leaf.ndim < 2:
        return False
    if leaf.ndim not in (2, 4):
        return False
    if match is None:
        return True
    k = keystr(path)
    return any(m in k for m in match)


def _dims(shape) -> tuple:
    """(fan_in, fan_out) of the 2-D view the delta is built in."""
    if len(shape) == 2:
        return shape[0], shape[1]
    kh, kw, cin, cout = shape
    return kh * kw * cin, cout


def lora_spec(params: Any, match: Optional[Sequence[str]] = None) -> Dict[str, tuple]:
    """{path: kernel shape} for every targeted leaf (host-side, static)."""
    flat, _ = tree_flatten_with_path(params)
    return {keystr(p): tuple(l.shape) for p, l in flat
            if _is_target(p, l, match)}


def lora_init(rng: jax.Array, params: Any, rank: int = 8,
              match: Optional[Sequence[str]] = None) -> Dict[str, Dict[str, jax.Array]]:
    """Build the adapter tree: {path: {"a": [d_in, r], "b": [r, d_out]}}.

    ``match``: optional substrings of the flattened path (e.g.
    ``["attn", "emb_proj"]``) restricting which kernels get adapters;
    default adapts every 2-D/4-D kernel. B = 0 makes the initial merge an
    exact identity (tested).
    """
    spec = lora_spec(params, match)
    assert spec, "no kernels matched the LoRA target spec"
    lora = {}
    for i, (k, shape) in enumerate(sorted(spec.items())):
        d_in, d_out = _dims(shape)
        r = min(rank, d_in, d_out)
        key = jax.random.fold_in(rng, i)
        lora[k] = {
            "a": (jax.random.normal(key, (d_in, r), jnp.float32)
                  / np.sqrt(r)),
            "b": jnp.zeros((r, d_out), jnp.float32),
        }
    return lora


def lora_merge(params: Any, lora: Dict[str, Dict[str, jax.Array]],
               alpha: float = 8.0) -> Any:
    """base + (alpha/r) * (A @ B) on every adapted kernel (jit-traceable;
    gradients flow into ``lora`` only if ``params`` is stop-gradient'd or
    simply not differentiated by the caller)."""

    def merge(path, leaf):
        k = keystr(path)
        ab = lora.get(k)
        if ab is None:
            return leaf
        r = ab["a"].shape[1]
        delta = (ab["a"] @ ab["b"]).reshape(leaf.shape) * (alpha / r)
        return leaf + delta.astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(merge, params)


def lora_param_count(lora: Dict[str, Dict[str, jax.Array]]) -> int:
    return sum(int(np.prod(v.shape)) for ab in lora.values()
               for v in ab.values())
