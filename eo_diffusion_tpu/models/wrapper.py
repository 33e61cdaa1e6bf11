"""Conditioning-key dispatch wrapper.

Re-design of the Lightning path's ``DiffusionWrapper``
(reference ``diffusion/model_pl.py:189-215``): a uniform
``(x, t, conditioning) -> prediction`` adapter that routes named
conditioning inputs to the backbone's mechanisms:

* ``None``        -- unconditional
* ``"concat"``    -- channel-concat tensors (c_concat)
* ``"crossattn"`` -- context tokens -> cross-attention (c_crossattn,
                     concatenated along the token axis like model_pl.py:203;
                     requires a UNet built with ``context_dim > 0``)
* ``"adm"``       -- class labels -> embedding add (c_adm / y)
* ``"hybrid"``    -- concat + crossattn together (model_pl.py:205-208);
                     c_adm additionally routes to the class embedding when
                     present (superset of the reference)
* ``"spade"``     -- segmap-modulated normalization (SpadeUNet; the SDM
                     conditioning mechanism, backbones/unet.py:156-182)
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp

__all__ = ["ConditioningWrapper"]

_KEYS = (None, "concat", "crossattn", "adm", "hybrid", "spade")


class ConditioningWrapper:
    """Wraps ``model.apply`` into ``fn(params, x, t, conditioning)``.

    ``conditioning`` is a dict that may hold ``c_concat`` (list or tensor,
    concatenated along channels like model_pl.py:198-201), ``c_crossattn``
    (list or [N, tokens, dim] tensor, concatenated along tokens) and/or
    ``c_adm`` (class labels).
    """

    def __init__(self, model, conditioning_key: Optional[str] = None):
        assert conditioning_key in _KEYS, conditioning_key
        self.model = model
        self.conditioning_key = conditioning_key

    @staticmethod
    def _cat(c, axis: int = -1):
        if c is None:
            return None
        if isinstance(c, (list, tuple)):
            return jnp.concatenate(list(c), axis=axis)
        return c

    def __call__(self, params, x, t, conditioning: Optional[Dict[str, Any]] = None,
                 train: bool = False):
        key = self.conditioning_key
        conditioning = conditioning or {}
        cond = self._cat(conditioning.get("c_concat"), axis=-1)
        ctx = self._cat(conditioning.get("c_crossattn"), axis=1)  # token axis
        y = conditioning.get("c_adm")
        if key is None:
            return self.model.apply(params, x, t, train=train)
        if key == "concat":
            return self.model.apply(params, x, t, cond=cond, train=train)
        if key == "crossattn":
            return self.model.apply(params, x, t, context=ctx, train=train)
        if key == "adm":
            return self.model.apply(params, x, t, y=y, train=train)
        if key == "hybrid":
            return self.model.apply(params, x, t, cond=cond, context=ctx, y=y,
                                    train=train)
        if key == "spade":
            return self.model.apply(params, x, t, cond=cond, train=train)
        raise ValueError(key)
