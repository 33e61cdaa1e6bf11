"""DiT: diffusion transformer backbone (beyond-reference model family).

The reference's backbones are all convolutional UNets (SURVEY.md §2
#3/#16-18). This module adds the transformer denoiser of Peebles & Xie,
"Scalable Diffusion Models with Transformers" (arXiv:2212.09748) as a
TPU-first alternative: the entire network is patchify -> N identical
pre-LN transformer blocks -> unpatchify, i.e. nothing but large dense
matmuls and the framework's fused Pallas attention — the shape XLA tiles
best onto the MXU, with none of the UNet's resolution ladder.

Design notes (TPU-first):

* Tokens are ``(size/patch)^2`` (64px/p4 -> 256, 256px/p8 -> 1024) and the
  head dim is ``hidden/heads`` (64 for the standard S/B configs) — both
  native tile shapes for the zero-copy fused-qkv kernel in
  ``ops/attention.py`` (contrast the UNet's intrinsically padded D=48).
* Conditioning is adaLN-Zero: every block's LayerNorm is modulated by
  (shift, scale, gate) regressed from ``t``/``y`` embeddings through a
  zero-init projection, so a fresh DiT is the identity function with a
  zero output head — the same safe-grafting property as the UNet's
  zero-init out convs.
* The call signature matches ``models/unet.UNet`` exactly
  (``(x, t, cond=None, y=None, train=False)``, NHWC, channel-concat
  ``cond``), so every sampler, the Trainer, DeepCache-free paths, CFG and
  the CLIs work unchanged; attention projections are named ``qkv`` /
  ``proj_out`` so ``parallel.mesh.tp_param_specs`` shards them with no
  new code.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from eo_diffusion_tpu.nn.primitives import Dense, ZeroDense, timestep_embedding

__all__ = ["DiTConfig", "DiT", "dit_s", "dit_b", "torso_block"]


@dataclasses.dataclass(frozen=True)
class DiTConfig:
    image_size: int
    in_channels: int
    out_channels: int
    patch_size: int = 4
    hidden_size: int = 384
    depth: int = 12
    num_heads: int = 6
    mlp_ratio: float = 4.0
    num_classes: Optional[int] = None
    class_dropout_prob: float = 0.0
    dtype: Any = jnp.float32  # compute/activation dtype (params stay f32)
    attn_impl: str = "auto"
    # cross-attention conditioning (the LatentDiffusion 'crossattn' slot,
    # completing the conditioning-key matrix for this family like
    # UNetConfig.context_dim does for the UNet): when > 0 every block gains
    # a zero-init cross-attention over `context` tokens after its
    # self-attention (the PixArt/SD3-style placement)
    context_dim: int = 0
    # Mixture-of-Experts FFN (models/moe.py — GShard/Switch dense dispatch,
    # beyond-reference): > 0 replaces the dense MLP with num_experts
    # routed experts in every moe_every-th block (GLaM-style interleave:
    # blocks 1, 1+moe_every, ... stay MoE, the rest dense). Expert weights
    # carry a leading E dim that parallel.mesh.ep_param_specs shards over
    # the mesh 'model' axis (expert parallelism).
    num_experts: int = 0
    moe_top_k: int = 1
    moe_every: int = 2
    moe_capacity: float = 1.25
    # Token merging (ToMe, arXiv:2303.17604 — ops/tome.py): fraction of the
    # token count merged away inside every block's attention (parameter-
    # free, so it can be switched on at inference over any trained DiT
    # checkpoint; --tome_ratio in cli/inference.py). tome_mlp extends the
    # same merge map around the MLP/MoE branch (faster, slightly lossier —
    # the ToMe-SD paper's default is attention-only).
    tome_ratio: float = 0.0
    tome_mlp: bool = False
    # dual-time conditioning (MeanFlow, arXiv:2505.13447: the average
    # velocity u(z, r, t) takes TWO times): when True the timestep argument
    # is packed as [N, 2] = (t, r) and a second embedding MLP for r is
    # summed into the conditioning stream (the official MeanFlow DiT
    # embeds both times and sums them).
    dual_time: bool = False

    @property
    def label_vocab(self) -> Optional[int]:
        if self.num_classes is None:
            return None
        return self.num_classes + (1 if self.class_dropout_prob > 0 else 0)

    @property
    def grid(self) -> int:
        assert self.image_size % self.patch_size == 0, (
            self.image_size, self.patch_size)
        return self.image_size // self.patch_size

    @property
    def tokens(self) -> int:
        return self.grid * self.grid


def posemb_sincos_2d(h: int, w: int, dim: int) -> jax.Array:
    """Fixed 2D sin-cos positional embedding [h*w, dim] (DiT uses
    non-learned positions; half the channels encode rows, half columns)."""
    assert dim % 4 == 0, dim
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    emb_y = timestep_embedding(ys.reshape(-1), dim // 2)
    emb_x = timestep_embedding(xs.reshape(-1), dim // 2)
    return jnp.concatenate([emb_y, emb_x], axis=-1)  # [h*w, dim] f32


def _modulated_ln(x: jax.Array, shift: jax.Array, scale: jax.Array) -> jax.Array:
    """LayerNorm (no learned affine, f32 statistics) followed by the adaLN
    modulation ``x * (1 + scale) + shift``; returns x's dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
    out = normed * (1.0 + scale[:, None, :]) + shift[:, None, :]
    return out.astype(x.dtype)


class CrossAttentionTokens(nn.Module):
    """Cross-attention from tokens to context tokens [N, L, Dc].

    Zero-init output projection: a fresh module is an exact identity, so
    the slot can be added to pretrained DiT checkpoints safely (same
    contract as the UNet's CrossAttentionBlock, models/unet.py). Projection
    names (to_q/to_kv/proj_out) match parallel.mesh.tp_param_specs."""

    num_heads: int
    dtype: Any

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array) -> jax.Array:
        b, t, d = x.shape
        heads = self.num_heads
        ch = d // heads
        h = _modulated_ln(x, jnp.zeros((b, d), jnp.float32),
                          jnp.zeros((b, d), jnp.float32))  # plain LN
        q = Dense(d, dtype=self.dtype, name="to_q")(h).reshape(b, t, heads, ch)
        kv = Dense(2 * d, dtype=self.dtype, name="to_kv")(
            context.astype(h.dtype))
        kv = kv.reshape(b, context.shape[1], 2, heads, ch)
        k, v = kv[:, :, 0], kv[:, :, 1]
        scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.float32(ch))).astype(q.dtype)
        w = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(v.dtype)
        a = jnp.einsum("bhts,bshc->bthc", w, v).reshape(b, t, d)
        return ZeroDense(d, dtype=self.dtype, name="proj_out")(a)


class DiTBlock(nn.Module):
    """Pre-LN transformer block with adaLN-Zero conditioning.

    The six modulation vectors come from a zero-init projection of the
    conditioning embedding, so at init both residual branches are gated
    shut (exact identity). With ``context_dim > 0`` a zero-init
    cross-attention over context tokens sits between self-attention and
    the MLP."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float
    dtype: Any
    attn_impl: str
    context_dim: int = 0
    num_experts: int = 0  # > 0: MoE FFN instead of the dense MLP
    moe_top_k: int = 1
    moe_capacity: float = 1.25
    tome_r: int = 0       # tokens merged around attention (ops/tome.py)
    tome_mlp: bool = False
    grid_hw: Tuple[int, int] = (0, 0)  # token grid (for the ToMe partition)

    @nn.compact
    def __call__(self, x: jax.Array, c: jax.Array,
                 context: Optional[jax.Array] = None) -> jax.Array:
        from eo_diffusion_tpu.ops.attention import attention_from_qkv

        d = self.hidden_size
        mod = ZeroDense(6 * d, name="ada_mod")(nn.silu(c.astype(jnp.float32)))
        (shift_a, scale_a, gate_a,
         shift_m, scale_m, gate_m) = jnp.split(mod, 6, axis=-1)

        h = _modulated_ln(x, shift_a, scale_a)
        merge = unmerge = None
        if self.tome_r:
            from eo_diffusion_tpu.ops.tome import build_merge

            # metric = the attention input (ToMe-SD computes it on the
            # block input; post-LN is scale-normalized, which only helps
            # the cosine similarity). One map serves attn and (optionally)
            # the MLP branch, so both unmerges stay consistent.
            merge, unmerge = build_merge(h, self.grid_hw, self.tome_r)
            h = merge(h)
        qkv = Dense(3 * d, dtype=self.dtype, name="qkv")(h)
        a = attention_from_qkv(qkv, self.num_heads, new_order=True,
                               impl=self.attn_impl)
        a = Dense(d, dtype=self.dtype, name="proj_out")(a)
        if merge is not None:
            a = unmerge(a)
        x = x + gate_a[:, None, :].astype(x.dtype) * a

        if self.context_dim:
            assert context is not None, "context_dim > 0 requires context"
            x = x + CrossAttentionTokens(self.num_heads, self.dtype,
                                         name="cross")(x, context)

        h = _modulated_ln(x, shift_m, scale_m)
        if merge is not None and self.tome_mlp:
            h = merge(h)
        if self.num_experts:
            from eo_diffusion_tpu.models.moe import MoEMLP

            h = MoEMLP(d, int(d * self.mlp_ratio), self.num_experts,
                       top_k=self.moe_top_k,
                       capacity_factor=self.moe_capacity,
                       dtype=self.dtype, name="moe")(h)
        else:
            h = Dense(int(d * self.mlp_ratio), dtype=self.dtype,
                      name="mlp_in")(h)
            h = nn.gelu(h, approximate=True)
            h = Dense(d, dtype=self.dtype, name="mlp_out")(h)
        if merge is not None and self.tome_mlp:
            h = unmerge(h)
        return x + gate_m[:, None, :].astype(x.dtype) * h


class DiT(nn.Module):
    """Diffusion transformer denoiser; drop-in for ``models/unet.UNet``.

    Structured as setup-defined stages (``embed`` -> ``block_i`` x depth ->
    ``final``) so ``parallel/pipeline.py`` can run the uniform block stack
    pipeline-parallel over a 'stage' mesh axis while reusing these exact
    modules/params; ``__call__`` is the plain sequential composition."""

    cfg: DiTConfig

    def setup(self):
        cfg = self.cfg
        d = cfg.hidden_size
        self.patch_embed = Dense(d, dtype=cfg.dtype, name="patch_embed")
        self.t_embed_0 = Dense(d, name="t_embed_0")
        self.t_embed_1 = Dense(d, name="t_embed_1")
        if cfg.dual_time:
            self.r_embed_0 = Dense(d, name="r_embed_0")
            self.r_embed_1 = Dense(d, name="r_embed_1")
        if cfg.num_classes is not None:
            self.label_embed = nn.Embed(cfg.label_vocab, d, name="label_embed",
                                        dtype=jnp.float32)
        tome_r = 0
        if cfg.tome_ratio:
            from eo_diffusion_tpu.ops.tome import (aligned_merge_count,
                                                   tome_partition)

            _, src = tome_partition(cfg.grid, cfg.grid)
            tome_r = aligned_merge_count(cfg.tokens, len(src), cfg.tome_ratio)
        self.blocks = [
            DiTBlock(d, cfg.num_heads, cfg.mlp_ratio, cfg.dtype,
                     cfg.attn_impl, cfg.context_dim,
                     # GLaM-style interleave: MoE in blocks 1, 1+every, ...
                     num_experts=(cfg.num_experts if cfg.num_experts and
                                  i % cfg.moe_every == cfg.moe_every - 1
                                  else 0),
                     moe_top_k=cfg.moe_top_k,
                     moe_capacity=cfg.moe_capacity,
                     tome_r=tome_r, tome_mlp=cfg.tome_mlp,
                     grid_hw=(cfg.grid, cfg.grid),
                     name=f"block_{i}")
            for i in range(cfg.depth)
        ]
        self.final_mod = ZeroDense(2 * d, name="final_mod")
        self.final_proj = ZeroDense(cfg.patch_size**2 * cfg.out_channels,
                                    dtype=cfg.dtype, name="final_proj")

    def embed(self, x: jax.Array, cond: Optional[jax.Array] = None) -> jax.Array:
        """Patchify (+ channel-concat cond, same entry as the UNet,
        reference unet_openai.py:754-756 semantics) + positions: [N,T,D]."""
        cfg = self.cfg
        if cond is not None:
            x = jnp.concatenate([x, cond.astype(x.dtype)], axis=-1)
        n, hgt, wid, ch = x.shape
        assert hgt == wid == cfg.image_size, (x.shape, cfg.image_size)
        assert ch == cfg.in_channels, (ch, cfg.in_channels)
        p, g = cfg.patch_size, cfg.grid
        # patchify as one dense matmul: [N, g, p, g, p, C] -> [N, T, p*p*C]
        tok = x.reshape(n, g, p, g, p, ch).transpose(0, 1, 3, 2, 4, 5)
        tok = tok.reshape(n, g * g, p * p * ch)
        h = self.patch_embed(tok)
        return h + posemb_sincos_2d(g, g, cfg.hidden_size).astype(h.dtype)[None]

    def condition(self, t: jax.Array, y: Optional[jax.Array] = None,
                  train: bool = False) -> jax.Array:
        """Conditioning embedding (f32): timestep MLP (+ class table).

        ``class_dropout_prob > 0`` only reserves the learned null row
        (index == num_classes); the CFG label *dropout itself* is owned by
        the train step (train/trainer.make_train_step), the same single
        owner as for the UNet — the module never drops labels, so there is
        exactly one dropout mechanism regardless of backbone."""
        cfg = self.cfg
        if cfg.dual_time:
            # MeanFlow dual-time input: t packed [N, 2] = (t, r)
            assert t.ndim == 2 and t.shape[-1] == 2, (
                "dual_time models take timesteps packed as [N, 2] = (t, r)",
                t.shape)
            t, r = t[:, 0], t[:, 1]
        temb = self.t_embed_0(timestep_embedding(t, 256))
        c = self.t_embed_1(nn.silu(temb))
        if cfg.dual_time:
            remb = self.r_embed_0(timestep_embedding(r, 256))
            c = c + self.r_embed_1(nn.silu(remb))
        if cfg.num_classes is not None:
            assert y is not None, "class-conditional DiT requires y"
            c = c + self.label_embed(y)
        return c

    def final(self, h: jax.Array, c: jax.Array) -> jax.Array:
        """adaLN + zero-init head + unpatchify: [N,T,D] -> [N,H,W,C_out]."""
        cfg = self.cfg
        p, g = cfg.patch_size, cfg.grid
        mod = self.final_mod(nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        h = _modulated_ln(h, shift, scale)
        out = self.final_proj(h)
        n = out.shape[0]
        out = out.reshape(n, g, g, p, p, cfg.out_channels)
        return out.transpose(0, 1, 3, 2, 4, 5).reshape(
            n, g * p, g * p, cfg.out_channels)

    def __call__(
        self,
        x: jax.Array,
        t: jax.Array,
        cond: Optional[jax.Array] = None,
        y: Optional[jax.Array] = None,
        context: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        h = self.embed(x, cond)
        c = self.condition(t, y, train)
        for block in self.blocks:
            h = block(h, c, context)
        return self.final(h, c)


def torso_block(cfg: DiTConfig) -> DiTBlock:
    """The uniform torso block the pipeline engines rebuild — constructed
    with EXACTLY the fields ``DiT.setup`` passes (including the ToMe
    wiring), so the pipelined path stays numerically identical to the
    sequential ``model.apply``. MoE interleaving makes the torso
    non-uniform; the pipeline callers assert ``num_experts == 0``."""
    assert not cfg.num_experts, (
        "the pipeline torso is uniform; MoE blocks are not wired")
    tome_r = 0
    if cfg.tome_ratio:
        from eo_diffusion_tpu.ops.tome import (aligned_merge_count,
                                               tome_partition)

        _, src = tome_partition(cfg.grid, cfg.grid)
        tome_r = aligned_merge_count(cfg.tokens, len(src), cfg.tome_ratio)
    return DiTBlock(cfg.hidden_size, cfg.num_heads, cfg.mlp_ratio,
                    cfg.dtype, cfg.attn_impl, cfg.context_dim,
                    tome_r=tome_r, tome_mlp=cfg.tome_mlp,
                    grid_hw=(cfg.grid, cfg.grid))


def dit_s(image_size: int, in_channels: int = 3, patch_size: int = 4,
          **kw) -> DiTConfig:
    """DiT-S/4: 384-wide, 12 blocks, 6 heads (~33M params)."""
    return DiTConfig(image_size=image_size, in_channels=in_channels,
                     out_channels=kw.pop("out_channels", in_channels),
                     patch_size=patch_size, hidden_size=384, depth=12,
                     num_heads=6, **kw)


def dit_b(image_size: int, in_channels: int = 3, patch_size: int = 8,
          **kw) -> DiTConfig:
    """DiT-B/8: 768-wide, 12 blocks, 12 heads (~130M params)."""
    return DiTConfig(image_size=image_size, in_channels=in_channels,
                     out_channels=kw.pop("out_channels", in_channels),
                     patch_size=patch_size, hidden_size=768, depth=12,
                     num_heads=12, **kw)
