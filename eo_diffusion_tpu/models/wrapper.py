"""Conditioning-key dispatch wrapper.

Re-design of the Lightning path's ``DiffusionWrapper``
(reference ``diffusion/model_pl.py:189-215``): a uniform
``(x, t, conditioning) -> prediction`` adapter that routes named
conditioning inputs to the backbone's mechanisms:

* ``None``      -- unconditional
* ``"concat"``  -- channel-concat tensors (c_concat)
* ``"adm"``     -- class labels -> embedding add (c_adm / y)
* ``"hybrid"``  -- concat + adm together
* ``"spade"``   -- segmap-modulated normalization (SpadeUNet; the SDM
                   counterpart of the reference's crossattn slot -- this
                   framework's UNets are convolutional and have no
                   cross-attention context path)
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp

__all__ = ["ConditioningWrapper"]

_KEYS = (None, "concat", "adm", "hybrid", "spade")


class ConditioningWrapper:
    """Wraps ``model.apply`` into ``fn(params, x, t, conditioning)``.

    ``conditioning`` is a dict that may hold ``c_concat`` (list or tensor,
    concatenated along channels like model_pl.py:198-201) and/or ``c_adm``
    (class labels).
    """

    def __init__(self, model, conditioning_key: Optional[str] = None):
        assert conditioning_key in _KEYS, conditioning_key
        self.model = model
        self.conditioning_key = conditioning_key

    @staticmethod
    def _cat(c_concat):
        if c_concat is None:
            return None
        if isinstance(c_concat, (list, tuple)):
            return jnp.concatenate(list(c_concat), axis=-1)
        return c_concat

    def __call__(self, params, x, t, conditioning: Optional[Dict[str, Any]] = None,
                 train: bool = False):
        key = self.conditioning_key
        conditioning = conditioning or {}
        cond = self._cat(conditioning.get("c_concat"))
        y = conditioning.get("c_adm")
        if key is None:
            return self.model.apply(params, x, t, train=train)
        if key == "concat":
            return self.model.apply(params, x, t, cond=cond, train=train)
        if key == "adm":
            return self.model.apply(params, x, t, y=y, train=train)
        if key == "hybrid":
            return self.model.apply(params, x, t, cond=cond, y=y, train=train)
        if key == "spade":
            return self.model.apply(params, x, t, cond=cond, train=train)
        raise ValueError(key)
