"""ControlNet conditioning adapters (Zhang et al. 2023, arXiv:2302.05543).

Add a NEW conditioning modality (SAR backscatter, DEM, segmentation, a
cloudy co-registered view, ...) to an already-trained diffusion UNet
without touching its weights — the canonical EO upgrade path when a new
sensor stream becomes available after a model has shipped. The reference
has no adapter story at all; its only conditioning is baked in at
training time (channel-concat, reference ``backbones/unet_openai.py:754``).

Architecture (paper §3.2, adapted to the plan-driven Flax UNet in
``models/unet.py``):

* a **trainable copy of the UNet encoder** (input blocks + middle block),
  initialized from the frozen base checkpoint (:func:`init_from_base`) —
  layer names match ``UNet`` exactly (``input_{bi}_{li}``,
  ``middle_{li}``, ``time_embed_*``, ``label_emb``) so the copy is plain
  pytree surgery;
* a small **hint encoder** mapping the control image to feature space,
  ending in a zero conv (the hint contributes nothing at step 0);
* **zero-initialized 1x1 convs** on every encoder-block output and on the
  middle output. The residual tuple they produce is consumed by
  ``UNet.__call__(..., control=...)``, which adds each residual to the
  corresponding skip tensor at the decoder joins and to the middle-block
  output — the frozen encoder itself runs unmodified, exactly the paper's
  wiring (and diffusers' ``ControlNetModel`` convention).

Zero init makes the controlled forward **bit-identical** to the base
model before training (tested), so training can only improve on the
frozen prior. Everything is jit-friendly: the plan is static, the
residuals are a fixed-length tuple.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from eo_diffusion_tpu.models.unet import (
    UNet,
    UNetConfig,
    _make_layer,
    build_unet_plan,
)
from eo_diffusion_tpu.nn.primitives import (
    Conv,
    Dense,
    ZeroConv,
    timestep_embedding,
)

__all__ = ["ControlNet", "init_from_base", "controlled_apply_fn",
           "control_param_count"]


class ControlNet(nn.Module):
    """Trainable encoder copy + hint encoder + zero-conv heads.

    ``__call__(x, t, hint, y=None)`` returns ``(block_residuals, mid)``:
    one residual per UNet input block (same channel widths as the skip
    tensors ``hs``) plus the middle-block residual. Feed the tuple to
    ``UNet.__call__(..., control=...)`` on the FROZEN base params.
    """

    config: UNetConfig
    hint_channels: int

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        timesteps: jax.Array,
        hint: jax.Array,
        y: Optional[jax.Array] = None,
        train: bool = False,
    ) -> Tuple[Tuple[jax.Array, ...], jax.Array]:
        cfg = self.config
        assert cfg.context_dim == 0, (
            "ControlNet adapters are wired for the self-attention UNet")
        plan = build_unet_plan(cfg)
        assert x.shape[-1] == cfg.in_channels, (x.shape, cfg.in_channels)
        assert hint.shape[-1] == self.hint_channels, (
            hint.shape, self.hint_channels)

        # timestep (+class) embedding — names match UNet so init_from_base
        # copies the trained embedding MLP verbatim
        emb = timestep_embedding(timesteps, cfg.model_channels)
        emb = Dense(cfg.time_embed_dim, dtype=cfg.dtype, name="time_embed_0")(emb)
        emb = nn.silu(emb)
        emb = Dense(cfg.time_embed_dim, dtype=cfg.dtype, name="time_embed_2")(emb)
        if cfg.num_classes is not None:
            assert y is not None, "class-conditional base needs y"
            emb = emb + nn.Embed(cfg.label_vocab, cfg.time_embed_dim,
                                 param_dtype=jnp.float32,
                                 name="label_emb")(y).astype(emb.dtype)

        # hint encoder (paper: conv stack ending in a zero conv; the EO
        # pixel-space hint is already at the model grid, so no strides)
        first_ch = int(cfg.channel_mult[0] * cfg.model_channels)
        g = hint.astype(cfg.dtype)
        g = nn.silu(Conv(16, 3, dtype=cfg.dtype, name="hint_0")(g))
        g = nn.silu(Conv(32, 3, dtype=cfg.dtype, name="hint_1")(g))
        g = ZeroConv(first_ch, 3, dtype=cfg.dtype, name="hint_out")(g)

        h = x.astype(cfg.dtype)
        residuals = []
        for bi, block in enumerate(plan.input_blocks):
            for li, spec in enumerate(block):
                layer = _make_layer(cfg, spec, name=f"input_{bi}_{li}")
                h = UNet._apply(layer, spec, h, emb, train)
            if bi == 0:
                # hint joins after the stem conv (paper eq. 5)
                h = h + g
            residuals.append(
                ZeroConv(h.shape[-1], 1, dtype=cfg.dtype,
                         name=f"zero_{bi}")(h))
        for li, spec in enumerate(plan.middle_block):
            layer = _make_layer(cfg, spec, name=f"middle_{li}")
            h = UNet._apply(layer, spec, h, emb, train)
        mid = ZeroConv(h.shape[-1], 1, dtype=cfg.dtype, name="zero_middle")(h)
        return tuple(residuals), mid


def init_from_base(ctrl_params: Any, base_params: Any) -> Tuple[Any, int]:
    """Copy the frozen base UNet's encoder weights into a fresh ControlNet
    param tree (paper: the trainable copy STARTS as the trained encoder).

    Matches top-level module names (``input_*``, ``middle_*``,
    ``time_embed_*``, ``label_emb``); hint/zero-conv leaves keep their
    fresh (zero) init. Leaves whose shapes disagree (e.g. a base stem that
    consumed concat cond channels the adapter does not) stay fresh too.
    Returns (params, number of copied leaves).
    """
    base = base_params["params"]
    out = dict(ctrl_params["params"])
    copied = 0
    for name, sub in out.items():
        if name not in base:
            continue
        src = base[name]
        src_flat = jax.tree_util.tree_leaves_with_path(src)
        dst_flat = {jax.tree_util.keystr(p): l
                    for p, l in jax.tree_util.tree_leaves_with_path(sub)}
        ok = all(jax.tree_util.keystr(p) in dst_flat
                 and tuple(dst_flat[jax.tree_util.keystr(p)].shape)
                 == tuple(l.shape)
                 for p, l in src_flat)
        if ok and src_flat:
            out[name] = jax.tree.map(jnp.asarray, src)
            copied += len(src_flat)
    return {"params": out}, copied


def controlled_apply_fn(model: UNet, base_params: Any,
                        cnet: "ControlNet", ctrl_params: Any):
    """Denoiser ``fn(x, t, hint, y)`` running the frozen base UNet under
    the adapter's residuals. ``hint`` rides the sampler/train-loss ``cond``
    slot; the base UNet itself sees ``cond=None`` (its weights never grew
    a concat stem). Gradients flow into ``ctrl_params`` only if the caller
    differentiates w.r.t. them (base_params are simply not a tracer)."""

    def fn(x, t, hint, y=None):
        control = cnet.apply(ctrl_params, x, t, hint, y=y)
        return model.apply(base_params, x, t, y=y, control=control)

    return fn


def control_param_count(ctrl_params: Any) -> int:
    import numpy as np

    return sum(int(np.prod(p.shape))
               for p in jax.tree.leaves(ctrl_params))


def save_controlnet(outdir: str, ctrl_params: Any, meta: dict) -> None:
    """Portable flat ``controlnet.npz`` (keys = flattened tree paths) +
    ``controlnet.json`` metadata, the same packaging as the LoRA adapters
    (cli/finetune.py) so adapters of either family ship identically."""
    import json
    import os

    import numpy as np

    flat = {jax.tree_util.keystr(p): np.asarray(l)
            for p, l in jax.tree_util.tree_leaves_with_path(ctrl_params)}
    os.makedirs(outdir, exist_ok=True)
    np.savez(os.path.join(outdir, "controlnet.npz"), **flat)
    with open(os.path.join(outdir, "controlnet.json"), "w") as f:
        json.dump(meta, f, indent=2)


def load_controlnet(path: str, template: Any) -> Tuple[Any, dict]:
    """Restore adapter params into ``template``'s tree structure.
    ``path``: the --dir of a finetune run (or a direct .npz path)."""
    import json
    import os

    import numpy as np

    npz = path if path.endswith(".npz") else os.path.join(path, "controlnet.npz")
    data = np.load(npz)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for p, tmpl in flat:
        k = jax.tree_util.keystr(p)
        assert k in data.files, f"missing leaf in {npz}: {k}"
        arr = jnp.asarray(data[k])
        assert arr.shape == tmpl.shape, (k, arr.shape, tmpl.shape)
        leaves.append(arr)
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    meta_path = os.path.join(os.path.dirname(npz), "controlnet.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return params, meta
