"""TPU-native OpenAI-style UNet denoiser (Flax linen, NHWC).

Re-design of the reference production backbone ``backbones/unet_openai.py``
(UNetModel, lines 522-780) for TPU:

* NHWC layout, bf16-friendly compute with float32 GroupNorm/softmax.
* The architecture is derived from a static :class:`UNetPlan` built by
  :func:`build_unet_plan`, mirroring the constructor logic of the reference
  (``unet_openai.py:607-744``) block-for-block so converted torch checkpoints
  map 1:1 (dead ``nout/act/conv_out`` head params, ``unet_openai.py:744``,
  are intentionally not recreated).
* Conditioning parity: channel-concat `cond` before the first conv
  (``unet_openai.py:754-756``) and class embedding added to the timestep
  embedding (``unet_openai.py:604-605, 764-766``).
* Attention supports both reference head-split orders
  (``QKVAttentionLegacy``/``QKVAttention``, ``unet_openai.py:456-519``) and
  can route through the fused Pallas kernel (``eo_diffusion_tpu.ops``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from eo_diffusion_tpu.nn.primitives import (
    Conv,
    Dense,
    GroupNorm32,
    ZeroConv,
    ZeroDense,
    avg_pool_2d,
    nearest_upsample_2d,
    timestep_embedding,
)

__all__ = [
    "UNetConfig",
    "UNet",
    "build_unet_plan",
    "UNetPlan",
    "LayerSpec",
    "unet_eo_train",
    "unet_clouds",
    "unet_big",
    "unet_std",
    "unet_small",
]


# ---------------------------------------------------------------------------
# Config + plan
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """Mirrors the reference ``UNetModel.__init__`` surface (unet_openai.py:553-575)."""

    image_size: int
    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Tuple[int, ...] = ()
    time_emb_factor: int = 4
    dropout: float = 0.0
    channel_mult: Tuple[int, ...] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_classes: Optional[int] = None
    use_checkpoint: bool = False
    num_heads: int = 1
    num_head_channels: int = -1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_new_attention_order: bool = False
    dtype: Any = jnp.float32  # compute/activation dtype (params stay float32)
    attn_impl: str = "auto"  # "auto" (pallas on TPU for long seq) | "xla" | "pallas"
    # cross-attention conditioning: when set, every self-attention block is
    # followed by a zero-init cross-attention block over `context` tokens
    # (the LatentDiffusion 'crossattn' slot; 0 disables)
    context_dim: int = 0
    # classifier-free guidance: probability of dropping the class label to a
    # learned null embedding during training (lucidrains
    # classifier_free_guidance.py:289,326-335). When > 0 the embedding table
    # gets one extra row; label index == num_classes selects the null class.
    class_dropout_prob: float = 0.0
    # dual-time conditioning (MeanFlow, arXiv:2505.13447: the average
    # velocity u(z, r, t) is a function of TWO times): when True, the
    # timestep argument is packed as [N, 2] = (t, r) and a second,
    # independently-parameterized embedding MLP for r is added to the
    # embedding stream (the official MeanFlow encodes both times and sums).
    dual_time: bool = False
    # FreeU (Si et al., arXiv:2309.11497): training-free decoder
    # re-weighting at sampling time — (b1, b2) scale the backbone features'
    # first half-channels and (s1, s2) scale the skip connections' lowest
    # Fourier modes at the two deepest decoder stages. Parameter-free, so
    # --freeu at inference applies to any trained checkpoint; None = exact
    # reference forward (the parity tests pin that path).
    freeu: Optional[Tuple[float, float, float, float]] = None

    @property
    def label_vocab(self) -> Optional[int]:
        if self.num_classes is None:
            return None
        return self.num_classes + (1 if self.class_dropout_prob > 0 else 0)

    def __post_init__(self):
        object.__setattr__(self, "attention_resolutions", tuple(self.attention_resolutions))
        object.__setattr__(self, "channel_mult", tuple(self.channel_mult))
        if self.freeu is not None:
            object.__setattr__(self, "freeu", tuple(self.freeu))
            assert len(self.freeu) == 4, self.freeu

    @property
    def time_embed_dim(self) -> int:
        return self.model_channels * self.time_emb_factor


@dataclasses.dataclass(frozen=True)
class LayerSpec:
    """One layer inside a (TimestepEmbedSequential-equivalent) block."""

    kind: str  # "conv" | "res" | "attn" | "down" | "up"
    in_ch: int
    out_ch: int
    num_heads: int = 0
    up: bool = False
    down: bool = False


@dataclasses.dataclass(frozen=True)
class UNetPlan:
    """Static layer plan, shared by the model and the checkpoint converter."""

    input_blocks: Tuple[Tuple[LayerSpec, ...], ...]
    middle_block: Tuple[LayerSpec, ...]
    output_blocks: Tuple[Tuple[LayerSpec, ...], ...]
    out_ch: int  # channels entering the output head


def _freeu_pair(h: jax.Array, skip: jax.Array, b: float, s: float):
    """FreeU decoder re-weighting (arXiv:2309.11497) at one skip join:
    backbone ``h`` has its first half-channels scaled by ``b`` (the paper
    finds backbone features carry denoising semantics that benefit from
    amplification), and the skip's LOWEST Fourier modes scale by ``s``
    (attenuating the low-frequency content that fights the amplified
    backbone; the central 3x3 of the shifted 2D spectrum, the diffusers
    threshold-1 convention). f32 math; NHWC."""
    c = h.shape[-1] // 2
    hf = h.astype(jnp.float32)
    h = jnp.concatenate([hf[..., :c] * b, hf[..., c:]], axis=-1)

    sf = jnp.fft.fftshift(jnp.fft.fft2(skip.astype(jnp.float32),
                                       axes=(1, 2)), axes=(1, 2))
    hh, ww = skip.shape[1], skip.shape[2]
    cy, cx = hh // 2, ww // 2
    mask = jnp.ones((hh, ww), jnp.float32)
    mask = mask.at[max(cy - 1, 0):cy + 2, max(cx - 1, 0):cx + 2].set(s)
    sf = sf * mask[None, :, :, None]
    skip = jnp.fft.ifft2(jnp.fft.ifftshift(sf, axes=(1, 2)),
                         axes=(1, 2)).real
    return h.astype(jnp.float32), skip


def _attn_heads(cfg: UNetConfig, ch: int, upsample: bool) -> int:
    if cfg.num_head_channels == -1:
        heads = cfg.num_heads_upsample if (upsample and cfg.num_heads_upsample != -1) else cfg.num_heads
    else:
        assert ch % cfg.num_head_channels == 0, (ch, cfg.num_head_channels)
        heads = ch // cfg.num_head_channels
    assert ch % heads == 0, (ch, heads)
    return heads


def build_unet_plan(cfg: UNetConfig) -> UNetPlan:
    """Replicates the block construction of reference ``unet_openai.py:607-744``."""
    ch = input_ch = int(cfg.channel_mult[0] * cfg.model_channels)
    input_blocks = [ ( LayerSpec("conv", cfg.in_channels, ch), ) ]
    input_block_chans = [ch]
    ds = 1
    for level, mult in enumerate(cfg.channel_mult):
        for _ in range(cfg.num_res_blocks):
            layers = [LayerSpec("res", ch, int(mult * cfg.model_channels))]
            ch = int(mult * cfg.model_channels)
            if ds in cfg.attention_resolutions:
                layers.append(LayerSpec("attn", ch, ch, num_heads=_attn_heads(cfg, ch, False)))
            input_blocks.append(tuple(layers))
            input_block_chans.append(ch)
        if level != len(cfg.channel_mult) - 1:
            out_ch = ch
            if cfg.resblock_updown:
                input_blocks.append((LayerSpec("res", ch, out_ch, down=True),))
            else:
                input_blocks.append((LayerSpec("down", ch, out_ch),))
            ch = out_ch
            input_block_chans.append(ch)
            ds *= 2

    middle = (
        LayerSpec("res", ch, ch),
        LayerSpec("attn", ch, ch, num_heads=_attn_heads(cfg, ch, False)),
        LayerSpec("res", ch, ch),
    )

    output_blocks = []
    for level, mult in list(enumerate(cfg.channel_mult))[::-1]:
        for i in range(cfg.num_res_blocks + 1):
            ich = input_block_chans.pop()
            layers = [LayerSpec("res", ch + ich, int(cfg.model_channels * mult))]
            ch = int(cfg.model_channels * mult)
            if ds in cfg.attention_resolutions:
                layers.append(LayerSpec("attn", ch, ch, num_heads=_attn_heads(cfg, ch, True)))
            if level and i == cfg.num_res_blocks:
                out_ch = ch
                if cfg.resblock_updown:
                    layers.append(LayerSpec("res", ch, out_ch, up=True))
                else:
                    layers.append(LayerSpec("up", ch, out_ch))
                ds //= 2
            output_blocks.append(tuple(layers))

    return UNetPlan(
        input_blocks=tuple(input_blocks),
        middle_block=middle,
        output_blocks=tuple(output_blocks),
        out_ch=ch,
    )


# ---------------------------------------------------------------------------
# Layers
# ---------------------------------------------------------------------------


class ResBlock(nn.Module):
    """Residual block (reference ``ResBlock``, unet_openai.py:274-385).

    GroupNorm32 -> SiLU -> conv3x3, timestep-embedding add (or FiLM
    scale-shift), GroupNorm32 -> SiLU -> dropout -> zero-init conv3x3, with a
    learned skip projection when channels change. ``up``/``down`` variants
    resample both branches between the first norm and conv.
    """

    out_channels: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    use_conv_skip: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x.shape[-1]
        h = GroupNorm32(name="in_norm")(x)
        h = nn.silu(h)
        if self.up:
            h = nearest_upsample_2d(h)
            x = nearest_upsample_2d(x)
        elif self.down:
            h = avg_pool_2d(h)
            x = avg_pool_2d(x)
        h = Conv(self.out_channels, 3, dtype=self.dtype, name="in_conv")(h)

        emb_width = 2 * self.out_channels if self.use_scale_shift_norm else self.out_channels
        emb_out = Dense(emb_width, dtype=self.dtype, name="emb_proj")(nn.silu(emb))
        emb_out = emb_out[:, None, None, :].astype(h.dtype)

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32(name="out_norm")(h) * (1 + scale) + shift
            h = nn.silu(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            h = ZeroConv(self.out_channels, 3, dtype=self.dtype, name="out_conv")(h)
        else:
            h = h + emb_out
            h = GroupNorm32(name="out_norm")(h)
            h = nn.silu(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            h = ZeroConv(self.out_channels, 3, dtype=self.dtype, name="out_conv")(h)

        if self.out_channels == in_ch:
            skip = x
        elif self.use_conv_skip:
            skip = Conv(self.out_channels, 3, dtype=self.dtype, name="skip_conv")(x)
        else:
            skip = Conv(self.out_channels, 1, dtype=self.dtype, name="skip_conv")(x)
        return skip + h


class AttentionBlock(nn.Module):
    """Spatial self-attention (reference ``AttentionBlock``, unet_openai.py:388-433).

    Both reference head-split orders are supported so converted checkpoints
    compute identically:

    * legacy (``QKVAttentionLegacy``, 456-485): qkv channels are laid out
      head-major then (q|k|v) within each head;
    * new (``QKVAttention``, 488-519): (q|k|v)-major then head within each.

    Softmax statistics run in float32 ("more stable with f16 than dividing
    afterwards", unet_openai.py:478) and the double-sqrt scaling is applied to
    q and k symmetrically.
    """

    num_heads: int = 1
    use_new_attention_order: bool = False
    dtype: Any = jnp.float32
    attn_impl: str = "auto"  # "auto" | "xla" | "pallas"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from eo_diffusion_tpu.ops.attention import attention_from_qkv

        b, hgt, wid, c = x.shape
        t = hgt * wid

        xt = x.reshape(b, t, c)
        qkv = Dense(3 * c, dtype=self.dtype, name="qkv")(GroupNorm32(name="norm")(xt))
        # the qkv tensor feeds the kernel directly (zero-copy head/slice
        # selection via BlockSpec index maps on TPU)
        a = attention_from_qkv(qkv, self.num_heads,
                               new_order=self.use_new_attention_order,
                               impl=self.attn_impl)
        out = ZeroDense(c, dtype=self.dtype, name="proj_out")(a)
        return (xt + out).reshape(b, hgt, wid, c)


class CrossAttentionBlock(nn.Module):
    """Cross-attention to context tokens (the LatentDiffusion 'crossattn'
    conditioning slot, reference diffusion/ddpm.py:34-36 /
    model_pl.py:189-215 -- never exercised by the reference's active path;
    provided here so the conditioning-key matrix is complete).

    q comes from the spatial features, k/v from ``context`` [N, L, Dc].
    Zero-initialized output projection: with fresh params the block is an
    identity, so it can be added to pretrained checkpoints safely.
    """

    num_heads: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array) -> jax.Array:
        b, hgt, wid, c = x.shape
        heads = self.num_heads
        ch = c // heads
        t = hgt * wid
        xt = x.reshape(b, t, c)
        h = GroupNorm32(name="norm")(xt)
        q = Dense(c, dtype=self.dtype, name="to_q")(h).reshape(b, t, heads, ch)
        kv = Dense(2 * c, dtype=self.dtype, name="to_kv")(context.astype(h.dtype))
        kv = kv.reshape(b, context.shape[1], 2, heads, ch)
        k, v = kv[:, :, 0], kv[:, :, 1]
        scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.float32(ch))).astype(q.dtype)
        w = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale)
        w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(v.dtype)
        a = jnp.einsum("bhts,bshc->bthc", w, v).reshape(b, t, c)
        out = ZeroDense(c, dtype=self.dtype, name="proj_out")(a)
        return (xt + out).reshape(b, hgt, wid, c)


class Upsample(nn.Module):
    """2x nearest upsample + optional conv (reference unet_openai.py:211-242)."""

    out_channels: int
    use_conv: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out = nearest_upsample_2d(x)
        if self.use_conv:
            out = Conv(self.out_channels, 3, dtype=self.dtype, name="conv")(out)
        return out


class Downsample(nn.Module):
    """Stride-2 conv or avg-pool downsample (reference unet_openai.py:245-271)."""

    out_channels: int
    use_conv: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.use_conv:
            return Conv(self.out_channels, 3, stride=2, dtype=self.dtype, name="conv")(x)
        assert x.shape[-1] == self.out_channels
        return avg_pool_2d(x)


# ---------------------------------------------------------------------------
# UNet
# ---------------------------------------------------------------------------


def _make_layer(cfg: UNetConfig, spec: LayerSpec, name: str) -> nn.Module:
    if spec.kind == "conv":
        return Conv(spec.out_ch, 3, dtype=cfg.dtype, name=name)
    if spec.kind == "res":
        cls = ResBlock
        if cfg.use_checkpoint:
            # arg indices under flax remat include the module instance at 0:
            # (self, x, emb, train) -- `train` must stay static or flax traces
            # it and the Dropout `deterministic` bool-conversion crashes
            cls = nn.remat(ResBlock, static_argnums=(3,))
        return cls(
            out_channels=spec.out_ch,
            dropout=cfg.dropout,
            use_scale_shift_norm=cfg.use_scale_shift_norm,
            up=spec.up,
            down=spec.down,
            dtype=cfg.dtype,
            name=name,
        )
    if spec.kind == "attn":
        return AttentionBlock(
            num_heads=spec.num_heads,
            use_new_attention_order=cfg.use_new_attention_order,
            dtype=cfg.dtype,
            attn_impl=cfg.attn_impl,
            name=name,
        )
    if spec.kind == "down":
        return Downsample(spec.out_ch, use_conv=cfg.conv_resample, dtype=cfg.dtype, name=name)
    if spec.kind == "up":
        return Upsample(spec.out_ch, use_conv=cfg.conv_resample, dtype=cfg.dtype, name=name)
    raise ValueError(spec.kind)


class UNet(nn.Module):
    """The full timestep-embedded UNet (reference ``UNetModel``, unet_openai.py:522-780).

    ``__call__(x, t, cond=None, y=None)`` with x: [N, H, W, C] (NHWC!),
    t: [N] int/float timesteps, cond: [N, H, W, Cc] channel-concat
    conditioning, y: [N] int class labels.
    """

    config: UNetConfig

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        timesteps: jax.Array,
        cond: Optional[jax.Array] = None,
        y: Optional[jax.Array] = None,
        context: Optional[jax.Array] = None,
        *,
        train: bool = False,
        deep_cache: Optional[jax.Array] = None,
        return_deep: bool = False,
        cache_depth: Optional[int] = None,
        control: Optional[Tuple[Tuple[jax.Array, ...], jax.Array]] = None,
    ) -> jax.Array:
        """Optional DeepCache split (Ma et al. 2312.00858; no reference
        counterpart): the first ``cache_depth`` input blocks and the matching
        last output blocks form the *shallow* path that always recomputes;
        everything between (downsampled levels, middle, all attention) is the
        *deep* branch whose up-sampled feature changes slowly across adjacent
        diffusion steps.

        * ``return_deep=True``: also return that deep feature (the h entering
          the first shallow output block) for caching.
        * ``deep_cache=h``: skip the deep branch and splice ``h`` in -- only
          the shallow blocks run. ``partial(x, t, cache=full(x, t).deep)``
          is bit-identical to ``full(x, t)``.
        * ``cache_depth`` defaults to the full-resolution level
          (stem + num_res_blocks blocks).

        ``control``: ControlNet adapter residuals (models/controlnet.py;
        arXiv:2302.05543) — ``(per-input-block residuals, middle
        residual)``. Each block residual is added to the matching skip
        tensor where the decoder consumes it, and the middle residual to
        the middle-block output; the frozen encoder itself runs
        unmodified (the paper's wiring). ``None`` leaves the forward
        bit-identical (the parity tests pin that path).
        """
        cfg = self.config
        plan = build_unet_plan(cfg)
        assert (context is not None) == (cfg.context_dim > 0), (
            "pass context iff the model was configured with context_dim"
        )

        if cond is not None:
            # channel-concat conditioning entry (reference unet_openai.py:754-756)
            x = jnp.concatenate([x, cond.astype(x.dtype)], axis=-1)

        assert (y is not None) == (cfg.num_classes is not None), (
            "must specify y if and only if the model is class-conditional"
        )
        assert x.shape[-1] == cfg.in_channels, (x.shape, cfg.in_channels)

        # timestep embedding MLP (reference unet_openai.py:597-602, 763)
        if cfg.dual_time:
            # MeanFlow dual-time input: timesteps packed [N, 2] = (t, r)
            assert timesteps.ndim == 2 and timesteps.shape[-1] == 2, (
                "dual_time models take timesteps packed as [N, 2] = (t, r)",
                timesteps.shape)
            timesteps, r_times = timesteps[:, 0], timesteps[:, 1]
        emb = timestep_embedding(timesteps, cfg.model_channels)
        emb = Dense(cfg.time_embed_dim, dtype=cfg.dtype, name="time_embed_0")(emb)
        emb = nn.silu(emb)
        emb = Dense(cfg.time_embed_dim, dtype=cfg.dtype, name="time_embed_2")(emb)
        if cfg.dual_time:
            remb = timestep_embedding(r_times, cfg.model_channels)
            remb = Dense(cfg.time_embed_dim, dtype=cfg.dtype,
                         name="time_embed_r0")(remb)
            remb = nn.silu(remb)
            remb = Dense(cfg.time_embed_dim, dtype=cfg.dtype,
                         name="time_embed_r2")(remb)
            emb = emb + remb

        if cfg.num_classes is not None:
            # class embedding added to emb (reference unet_openai.py:604-605,
            # 764-766); +1 null row when CFG label-dropout is enabled
            emb = emb + nn.Embed(
                cfg.label_vocab, cfg.time_embed_dim, param_dtype=jnp.float32, name="label_emb"
            )(y).astype(emb.dtype)

        def apply_layer(spec, name, h):
            layer = _make_layer(cfg, spec, name=name)
            h = self._apply(layer, spec, h, emb, train)
            if spec.kind == "attn" and cfg.context_dim > 0:
                h = CrossAttentionBlock(
                    num_heads=spec.num_heads, dtype=cfg.dtype, name=f"{name}_xattn"
                )(h, context)
            return h

        n_blocks = len(plan.input_blocks)
        cd = cache_depth if cache_depth is not None else 1 + cfg.num_res_blocks
        use_cache = deep_cache is not None or return_deep
        if use_cache:
            assert 0 < cd < n_blocks, (cd, n_blocks)
        assert not (use_cache and control is not None), (
            "ControlNet residuals land on the deep branch; they do not "
            "compose with the DeepCache split")

        h = x.astype(cfg.dtype)
        hs = []
        in_blocks = plan.input_blocks[:cd] if deep_cache is not None else plan.input_blocks
        for bi, block in enumerate(in_blocks):
            for li, spec in enumerate(block):
                h = apply_layer(spec, f"input_{bi}_{li}", h)
            hs.append(h)

        if control is not None:
            block_res, mid_res = control
            assert len(block_res) == len(hs), (len(block_res), len(hs))
            # residuals join the SKIP tensors (where the decoder reads
            # them), not the encoder stream — h entering middle is clean
            hs = [s + r.astype(s.dtype) for s, r in zip(hs, block_res)]

        # FreeU (arXiv:2309.11497): re-weight the two deepest decoder
        # stages' skip joins, keyed by the backbone channel width (an exact
        # match for distinct channel_mult tails; a repeated tail mult would
        # also catch its shallower twin — acceptable for the training-free
        # knob, documented here)
        fre = cfg.freeu
        ch_deep = cfg.model_channels * cfg.channel_mult[-1]
        ch_deep2 = (cfg.model_channels * cfg.channel_mult[-2]
                    if len(cfg.channel_mult) > 1 else None)

        def join(h, skip):
            if fre is not None:
                if h.shape[-1] == ch_deep:
                    h, skip = _freeu_pair(h, skip, fre[0], fre[2])
                elif ch_deep2 is not None and h.shape[-1] == ch_deep2:
                    h, skip = _freeu_pair(h, skip, fre[1], fre[3])
            return jnp.concatenate([h.astype(cfg.dtype),
                                    skip.astype(cfg.dtype)], axis=-1)

        deep_h = None
        split = n_blocks - cd if use_cache else n_blocks
        if deep_cache is None:
            for li, spec in enumerate(plan.middle_block):
                h = apply_layer(spec, f"middle_{li}", h)
            if control is not None:
                h = h + mid_res.astype(h.dtype)
            for bi, block in enumerate(plan.output_blocks[:split]):
                h = join(h, hs.pop())
                for li, spec in enumerate(block):
                    h = apply_layer(spec, f"output_{bi}_{li}", h)
            deep_h = h
        else:
            h = deep_cache.astype(cfg.dtype)

        for bi, block in enumerate(plan.output_blocks[split:], start=split):
            h = join(h, hs.pop())
            for li, spec in enumerate(block):
                h = apply_layer(spec, f"output_{bi}_{li}", h)

        # output head (reference unet_openai.py:739-743): norm -> SiLU -> zero conv
        h = GroupNorm32(name="out_norm")(h)
        h = nn.silu(h)
        h = ZeroConv(cfg.out_channels, 3, dtype=cfg.dtype, name="out_conv")(h)
        out = h.astype(x.dtype)
        if return_deep:
            return out, deep_h
        return out

    @staticmethod
    def _apply(layer, spec, h, emb, train):
        if spec.kind == "res":
            return layer(h, emb, train)  # positional: remat static_argnums
        return layer(h)


# ---------------------------------------------------------------------------
# Factory presets
# ---------------------------------------------------------------------------


def _preset_mults(image_size: int) -> Tuple[int, ...]:
    if image_size == 128:
        return (1, 1, 2, 3, 4)
    if image_size == 64:
        return (1, 2, 3, 4)
    if image_size in (32, 28):
        return (1, 2, 2, 2)
    raise ValueError(f"unsupported image size: {image_size}")


def _preset_attn_ds(image_size: int) -> Tuple[int, ...]:
    res = "28,14,7" if image_size == 28 else "32,16,8"
    return tuple(image_size // int(r) for r in res.split(","))


def unet_eo_train(image_size: int = 64, in_channels: int = 3, out_channels: int = 3,
                  base_dim: int = 128, num_classes: Optional[int] = None,
                  dtype: Any = jnp.float32) -> UNetConfig:
    """The active train.py config (reference train.py:50: base 128, mults
    [1,2,3,4], no attention, 1 res-block, 1 head)."""
    return UNetConfig(
        image_size=image_size, in_channels=in_channels, model_channels=base_dim,
        out_channels=out_channels, num_res_blocks=1, attention_resolutions=(),
        channel_mult=(1, 2, 3, 4), num_heads=1, num_classes=num_classes, dtype=dtype,
    )


def unet_clouds(image_size: int = 64, in_channels: int = 3, out_channels: int = 3,
                num_classes: Optional[int] = None, dtype: Any = jnp.float32) -> UNetConfig:
    """The published clouds checkpoint config (reference configs/Configs.txt:20-23,
    notebook cell 7): base 128, mults [1,2,3,4], attention at ds 4/8,
    2 res-blocks, 8 heads."""
    return UNetConfig(
        image_size=image_size, in_channels=in_channels, model_channels=128,
        out_channels=out_channels, num_res_blocks=2, attention_resolutions=(4, 8),
        channel_mult=(1, 2, 3, 4), num_heads=8, num_classes=num_classes, dtype=dtype,
    )


def _preset(image_size: int, base_width: int, num_res_blocks: int, head_ch: int,
            time_emb_factor: int = 4, in_channels: int = 3, out_channels: int = 3,
            num_classes: Optional[int] = None, dtype: Any = jnp.float32) -> UNetConfig:
    return UNetConfig(
        image_size=image_size, in_channels=in_channels, model_channels=base_width,
        out_channels=out_channels, num_res_blocks=num_res_blocks,
        attention_resolutions=_preset_attn_ds(image_size), dropout=0.1,
        channel_mult=_preset_mults(image_size), num_classes=num_classes,
        num_heads=4, num_head_channels=head_ch, time_emb_factor=time_emb_factor,
        use_scale_shift_norm=True, resblock_updown=True,
        use_new_attention_order=True, dtype=dtype,
    )


def unet_big(image_size: int, **kw) -> UNetConfig:
    """Reference ``UNetBig`` preset (unet_openai.py:783-827)."""
    return _preset(image_size, base_width=kw.pop("base_width", 192), num_res_blocks=3, head_ch=64, **kw)


def unet_std(image_size: int, **kw) -> UNetConfig:
    """Reference ``UNet`` preset (unet_openai.py:830-874)."""
    return _preset(image_size, base_width=kw.pop("base_width", 64), num_res_blocks=3, head_ch=64, **kw)


def unet_small(image_size: int, **kw) -> UNetConfig:
    """Reference ``UNetSmall`` preset (unet_openai.py:877-922)."""
    return _preset(image_size, base_width=kw.pop("base_width", 32), num_res_blocks=2,
                   head_ch=32, time_emb_factor=2, **kw)
