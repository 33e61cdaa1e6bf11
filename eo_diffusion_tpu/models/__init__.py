"""Backbone families. Shared small helpers only — heavy modules import lazily."""

import jax.numpy as jnp


def time_template(model, n: int = 1) -> jnp.ndarray:
    """Timestep placeholder matching the model's time-input layout, for
    ``model.init`` templates: ``[n]`` normally, ``[n, 2]`` for dual-time
    (MeanFlow) backbones whose time input packs (t, r) —
    ``UNetConfig.dual_time`` / ``DiTConfig.dual_time``.

    ``model`` may be a flax module (``.config`` / ``.cfg`` attribute) or a
    config dataclass itself.
    """
    cfg = getattr(model, "config", None) or getattr(model, "cfg", None) or model
    if getattr(cfg, "dual_time", False):
        return jnp.zeros((n, 2), jnp.float32)
    return jnp.zeros((n,), jnp.int32)
