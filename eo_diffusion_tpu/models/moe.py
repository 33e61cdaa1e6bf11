"""Mixture-of-Experts FFN for the DiT backbone (beyond-reference axis).

The reference has no MoE anywhere (SURVEY.md §2.3 lists expert parallelism
as N/A); this module adds sparse conditional computation in the
TPU-canonical *dense-dispatch* formulation (GShard, arXiv:2006.16668;
Switch Transformer, arXiv:2101.03961): token-choice top-k routing with a
static per-expert capacity, expressed entirely as one-hot einsums over
``[tokens, experts, capacity]`` — no ragged shapes, no sorts, no
data-dependent control flow, so the whole layer is three MXU matmuls plus
elementwise work that XLA fuses, and it partitions cleanly under GSPMD.

Expert parallelism: every expert-batched parameter carries a leading
``E`` dim (``w_in [E, d, h]``, ...). ``parallel.mesh.ep_param_specs``
shards that dim over the mesh 'model' axis; the dispatch/combine einsums
then contract tokens against expert shards and GSPMD inserts the
all-to-all-equivalent collectives. Numerics are annotation-independent
(tests assert sharded == unsharded losses).

Routing rules (standard, documented here because they set semantics):

* router logits/softmax in float32 regardless of activation dtype;
* top-k gate values renormalized over the selected experts;
* capacity ``C = round(S * k / E * capacity_factor)``; tokens assigned
  past an expert's capacity are DROPPED for that slot — their residual
  path (the DiT block's gated skip) still carries them;
* load-balance aux loss (Switch eq. 4): ``E * Σ_e f_e · P_e`` with
  ``f_e`` the fraction of tokens whose top-1 choice is ``e`` and ``P_e``
  the mean router probability — sown as the ``moe_aux`` intermediate,
  consumed by ``train.trainer.make_train_step`` (a no-op when the
  collection is immutable, i.e. during sampling).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from eo_diffusion_tpu.nn.primitives import Dense

__all__ = ["MoEMLP"]


class MoEMLP(nn.Module):
    """Token-choice top-k MoE FFN: drop-in for the DiT block's dense MLP.

    Input/output ``[B, T, d]``; routing flattens to ``S = B*T`` tokens so
    load balance is global over the device batch (under a data-sharded
    batch each shard routes its own tokens — no cross-replica router
    state, which is what keeps the layer a pure function of its inputs).
    """

    hidden_size: int  # d (model width)
    mlp_hidden: int  # h (per-expert FFN width)
    num_experts: int
    top_k: int = 1
    capacity_factor: float = 1.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, t, d = x.shape
        E, k = self.num_experts, self.top_k
        assert 1 <= k <= E, (k, E)
        S = b * t
        C = max(int(round(S * k / E * self.capacity_factor)), 1)
        xf = x.reshape(S, d)

        # router: f32 end-to-end (param_dtype is already f32; dtype=f32
        # keeps the logits/softmax numerics independent of activation bf16)
        logits = Dense(E, name="router")(xf.astype(jnp.float32))  # [S, E]
        probs = jax.nn.softmax(logits, axis=-1)
        gate_vals, expert_idx = jax.lax.top_k(probs, k)  # [S, k]
        gate_vals = gate_vals / jnp.maximum(
            jnp.sum(gate_vals, axis=-1, keepdims=True), 1e-9)

        # capacity assignment, slot by slot (k is 1-2: unrolled statically).
        # Slot j's tokens queue behind everything slots < j already placed.
        dispatch = jnp.zeros((S, E, C), jnp.float32)
        combine = jnp.zeros((S, E, C), jnp.float32)
        prev_counts = jnp.zeros((E,), jnp.float32)
        for j in range(k):
            mask = jax.nn.one_hot(expert_idx[:, j], E, dtype=jnp.float32)
            pos = jnp.cumsum(mask, axis=0) - 1.0 + prev_counts[None]  # [S,E]
            keep = mask * (pos < C)
            prev_counts = prev_counts + jnp.sum(keep, axis=0)
            slot = jnp.sum(pos * keep, axis=-1)  # [S] queue position (or 0)
            pos_oh = jax.nn.one_hot(slot.astype(jnp.int32), C,
                                    dtype=jnp.float32)
            d_j = keep[:, :, None] * pos_oh[:, None, :]  # [S, E, C]
            dispatch = dispatch + d_j
            combine = combine + gate_vals[:, j][:, None, None] * d_j

        # load-balance aux (Switch eq. 4): top-1 assignment fraction x mean
        # router probability, scaled so a uniform router scores 1.0
        top1 = jax.nn.one_hot(expert_idx[:, 0], E, dtype=jnp.float32)
        aux = E * jnp.sum(jnp.mean(top1, axis=0) * jnp.mean(probs, axis=0))
        # "intermediates" is the one collection flax denies at init, so the
        # param tree stays clean; a custom collection would be captured by
        # model.init into params (and double-append on every apply)
        self.sow("intermediates", "moe_aux", aux)

        w_in = self.param("w_in", nn.initializers.lecun_normal(),
                          (E, d, self.mlp_hidden), jnp.float32)
        b_in = self.param("b_in", nn.initializers.zeros,
                          (E, self.mlp_hidden), jnp.float32)
        w_out = self.param("w_out", nn.initializers.lecun_normal(),
                           (E, self.mlp_hidden, d), jnp.float32)
        b_out = self.param("b_out", nn.initializers.zeros, (E, d),
                           jnp.float32)

        cdt = self.dtype
        xe = jnp.einsum("sec,sd->ecd", dispatch.astype(cdt), xf.astype(cdt))
        h = jnp.einsum("ecd,edh->ech", xe, w_in.astype(cdt))
        h = nn.gelu(h + b_in[:, None, :].astype(cdt), approximate=True)
        oe = jnp.einsum("ech,ehd->ecd", h, w_out.astype(cdt))
        oe = oe + b_out[:, None, :].astype(cdt)
        y = jnp.einsum("sec,ecd->sd", combine.astype(cdt), oe)
        return y.reshape(b, t, d).astype(x.dtype)
