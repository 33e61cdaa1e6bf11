"""Perturbed-Attention Guidance (PAG, arXiv:2403.17377).

Inference-time quality guidance that needs NO extra training and NO
condition: the "bad" branch is the same model with every self-attention map
replaced by the identity (``ops.attention.identity_attention``), and the
prediction is extrapolated away from it:

    e_guided = e + s * (e - e_perturbed)          (paper eq. 8)

Like autoguidance (diffusion/autoguide.py) this works on unconditional
models — the EO presets' common case, where classifier-free guidance has no
null branch to lean on. The reference has no analog (its guidance surface
is CFG only, diffusion/ddim.py:177-181); PAG is a beyond-reference axis.

TPU notes: the perturbed branch is traced inside the trace-time context, so
both branches live in ONE jaxpr/jit — XLA schedules them back to back and
the identity branch skips the attention matmuls entirely (V passthrough),
making the perturbed call strictly cheaper than a full forward. Composes
with CFG (the samplers' batch-doubling wraps OUTSIDE this fn, so the PAG
delta applies to both CFG rows — the "PAG on both branches" variant of the
paper's eq. 9) and with every DDPM-chain/flow/EDM sampler, since it is a
plain ``model_fn -> model_fn`` wrapper.
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

__all__ = ["pag_model_fn"]


def pag_model_fn(model_fn: Callable, pag_scale: float) -> Callable:
    """Wrap ``model_fn(x, t, cond, y) -> pred`` with the PAG combine.

    ``pag_scale`` follows the paper's ``s``: 0 is identity (returns the
    plain prediction), 1-5 are typical operating points. When the model
    carries a learned-variance tail (``pred`` has twice x's channels), only
    the prediction half is guided; the variance half passes through from
    the unperturbed branch.
    """
    from eo_diffusion_tpu.ops.attention import (identity_attention,
                                                identity_attention_hits)

    if pag_scale == 0:  # identity: skip the (paid) perturbed branch entirely
        return model_fn

    def fn(x, t, cond, y):
        pred = model_fn(x, t, cond, y)
        hits0 = identity_attention_hits()
        with identity_attention():
            pred_p = model_fn(x, t, cond, y)
        if identity_attention_hits() == hits0:
            # trace-time guard (ADVICE r3): a backbone whose attention does
            # not route through attention_from_qkv (e.g. ConvNeXt linear
            # attention) makes the perturbed branch equal the plain branch —
            # PAG would be a silent numeric no-op that still pays the
            # double forward. Fail loudly instead.
            raise ValueError(
                "pag_scale is a no-op on this backbone: no self-attention "
                "site routed through ops.attention.attention_from_qkv "
                "during the perturbed trace (PAG perturbs only that "
                "dispatch). Use a UNet/DiT backbone with standard "
                "attention, or drop --pag_scale.")
        c = x.shape[-1]
        s = jnp.asarray(pag_scale, jnp.float32)
        if pred.shape[-1] == 2 * c:  # learned-variance tail passes through
            e, tail = pred[..., :c], pred[..., c:]
            guided = e + s.astype(e.dtype) * (e - pred_p[..., :c])
            return jnp.concatenate([guided, tail], axis=-1)
        return pred + s.astype(pred.dtype) * (pred - pred_p)

    return fn
