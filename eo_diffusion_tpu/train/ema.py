"""Exponential moving average of model parameters as a pytree transform.

Re-design of the reference's torch ``ExponentialMovingAverage``
(``script_utils/utils.py:56-67``, a ``swa_utils.AveragedModel`` wrapper) and
the decay-adjustment applied at its call site (``train.py:70-73``).

On TPU the EMA is a pure ``tree_map`` executed inside the jitted train step
(guarded by ``lax.cond`` on the step counter) so the shadow params never
leave HBM.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

__all__ = ["adjusted_decay", "ema_update", "ema_update_every", "warmed_decay"]


def warmed_decay(decay: float, n_updates: jax.Array) -> jax.Array:
    """timm-style decay warmup: min(decay, (1 + n) / (10 + n)).

    Early updates average aggressively so the EMA tracks from the first
    steps instead of dragging initialization noise for a full 1/(1-decay)
    horizon (observed on the r1 capstone run: unwarmed EMA sampled noise at
    6k steps).
    """
    n = n_updates.astype(jnp.float32)
    return jnp.minimum(jnp.float32(decay), (1.0 + n) / (10.0 + n))


def adjusted_decay(decay: float, batch_size: int, ema_steps: int, epochs: int) -> float:
    """The torchvision-style decay adjustment (reference train.py:70-72):

    alpha = min(1, (1 - decay) * batch_size * ema_steps / epochs);
    effective decay = 1 - alpha.
    """
    adjust = 1 * batch_size * ema_steps / epochs
    alpha = 1.0 - decay
    alpha = min(1.0, alpha * adjust)
    return 1.0 - alpha


def ema_update(ema_params: Any, params: Any, decay: float) -> Any:
    """ema <- decay * ema + (1 - decay) * params  (reference utils.py:64-65)."""
    d = jnp.asarray(decay, jnp.float32)
    return jax.tree.map(
        lambda e, p: (d * e.astype(jnp.float32) + (1.0 - d) * p.astype(jnp.float32)).astype(e.dtype),
        ema_params,
        params,
    )


def ema_update_every(
    ema_params: Any, params: Any, decay: float, step: jax.Array, every: int
) -> Any:
    """Conditionally update EMA every ``every`` steps inside jit.

    Matches the reference cadence ``if global_steps % model_ema_steps == 0``
    (train.py:122-123) without a host round-trip. ``lax.cond`` rather than a
    per-leaf ``where``: the identity branch skips the read-modify-write of
    the whole 88M-param shadow tree on the 9-of-10 off steps (measured
    6.10 -> 5.39 ms per optimizer pass, tools/profile_opt.py).
    """
    do = (step % every) == 0
    return jax.lax.cond(
        do,
        lambda ep: ema_update(ep[0], ep[1], decay),
        lambda ep: ep[0],
        (ema_params, params),
    )
