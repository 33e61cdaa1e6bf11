"""Convert reference PyTorch UNet checkpoints to Flax param pytrees.

Handles the published ``clouds_best.pt``-style checkpoints
(reference README.md:11, train.py:137-138: ``{"model": sd, "model_ema": sd}``)
including every key-munging variant the reference accumulates:

* ``model.`` prefixes from the EODiffusion wrapper (inference.py:82-86);
* ``module.`` prefixes from past DDP runs (data.py:373-375);
* ``state_dict`` nesting (data.py:377-387);
* schedule buffers (betas/alphas/...) -- skipped, we rebuild them;
* the dead ``nout/act/conv_out`` head params (unet_openai.py:744) -- skipped.

Weight-layout transposes (torch -> flax):

* Conv2d   [O, I, kh, kw] -> HWIO [kh, kw, I, O]
* Conv1d   [O, I, 1]      -> Dense [I, O]   (attention qkv / proj_out)
* Linear   [O, I]         -> Dense [I, O]
* GroupNorm weight/bias   -> scale/bias (unchanged)
* Embedding               -> unchanged

Block-name mapping is derived from the same :func:`build_unet_plan` the
model itself uses, so torch ``input_blocks.N.M.*`` indices line up with our
``input_N_M`` modules by construction.

CLI: ``python -m eo_diffusion_tpu.tools.convert_ckpt in.pt out_dir --preset clouds64-attn``
"""

from __future__ import annotations

import argparse
from typing import Dict, Mapping

import numpy as np

from eo_diffusion_tpu.models.unet import LayerSpec, UNetConfig, build_unet_plan

__all__ = [
    "fix_legacy_dict",
    "convert_state_dict",
    "load_torch_checkpoint",
    "params_to_state_dict",
]


def fix_legacy_dict(d: Mapping) -> Dict[str, np.ndarray]:
    """Normalize the reference's checkpoint-dict variants to a flat
    name->array mapping (torch-free re-design of data.py:373-387 +
    inference.py:82-86)."""
    if "model" in d and isinstance(d["model"], Mapping):
        d = d["model"]
    if "state_dict" in d and isinstance(d.get("state_dict"), Mapping):
        d = d["state_dict"]
    out = {}
    for k, v in d.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if k.startswith("model."):
            k = k[len("model."):]
        out[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
    return out


_SCHEDULE_BUFFERS = {
    "betas", "alphas", "alphas_cumprod", "sqrt_alphas_cumprod",
    "sqrt_one_minus_alphas_cumprod",
}
_DEAD_PREFIXES = ("nout.", "conv_out.", "act.")


def _conv(sd, prefix):
    w = sd[f"{prefix}.weight"]
    return {"kernel": w.transpose(2, 3, 1, 0), "bias": sd[f"{prefix}.bias"]}


def _dense_from_linear(sd, prefix):
    return {"kernel": sd[f"{prefix}.weight"].T, "bias": sd[f"{prefix}.bias"]}


def _dense_from_conv1d(sd, prefix):
    w = sd[f"{prefix}.weight"]  # [O, I, 1]
    return {"kernel": w[:, :, 0].T, "bias": sd[f"{prefix}.bias"]}


def _gn(sd, prefix):
    return {"GroupNorm_0": {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}}


def _res_block(sd, prefix) -> Dict:
    out = {
        "in_norm": _gn(sd, f"{prefix}.in_layers.0"),
        "in_conv": _conv(sd, f"{prefix}.in_layers.2"),
        "emb_proj": _dense_from_linear(sd, f"{prefix}.emb_layers.1"),
        "out_norm": _gn(sd, f"{prefix}.out_layers.0"),
        "out_conv": _conv(sd, f"{prefix}.out_layers.3"),
    }
    if f"{prefix}.skip_connection.weight" in sd:
        out["skip_conv"] = _conv(sd, f"{prefix}.skip_connection")
    return out


def _attn_block(sd, prefix) -> Dict:
    return {
        "norm": _gn(sd, f"{prefix}.norm"),
        "qkv": _dense_from_conv1d(sd, f"{prefix}.qkv"),
        "proj_out": _dense_from_conv1d(sd, f"{prefix}.proj_out"),
    }


def _layer(sd, spec: LayerSpec, prefix: str) -> Dict:
    if spec.kind == "conv":
        return _conv(sd, prefix)
    if spec.kind == "res":
        return _res_block(sd, prefix)
    if spec.kind == "attn":
        return _attn_block(sd, prefix)
    if spec.kind == "down":
        return {"conv": _conv(sd, f"{prefix}.op")}
    if spec.kind == "up":
        return {"conv": _conv(sd, f"{prefix}.conv")}
    raise ValueError(spec.kind)


def convert_state_dict(sd: Dict[str, np.ndarray], cfg: UNetConfig) -> Dict:
    """torch state dict -> flax ``{"params": {...}}`` for ``UNet(cfg)``."""
    plan = build_unet_plan(cfg)
    p: Dict[str, Dict] = {}
    p["time_embed_0"] = _dense_from_linear(sd, "time_embed.0")
    p["time_embed_2"] = _dense_from_linear(sd, "time_embed.2")
    if cfg.num_classes is not None:
        p["label_emb"] = {"embedding": sd["label_emb.weight"]}

    for bi, block in enumerate(plan.input_blocks):
        for li, spec in enumerate(block):
            p[f"input_{bi}_{li}"] = _layer(sd, spec, f"input_blocks.{bi}.{li}")
    for li, spec in enumerate(plan.middle_block):
        p[f"middle_{li}"] = _layer(sd, spec, f"middle_block.{li}")
    for bi, block in enumerate(plan.output_blocks):
        for li, spec in enumerate(block):
            p[f"output_{bi}_{li}"] = _layer(sd, spec, f"output_blocks.{bi}.{li}")

    p["out_norm"] = _gn(sd, "out.0")
    p["out_conv"] = _conv(sd, "out.2")

    # consistency audit: every checkpoint param must have been consumed
    consumed = _expected_keys(cfg, plan)
    leftover = {
        k for k in sd
        if k not in consumed
        and k not in _SCHEDULE_BUFFERS
        and not k.startswith(_DEAD_PREFIXES)
        and not k.startswith("n_averaged")  # EMA bookkeeping scalar
    }
    if leftover:
        raise ValueError(f"unconsumed checkpoint keys: {sorted(leftover)[:8]} ...")

    return {"params": _to_f32(p)}


def _to_f32(tree):
    if isinstance(tree, dict):
        return {k: _to_f32(v) for k, v in tree.items()}
    return np.asarray(tree, np.float32)


def _expected_keys(cfg, plan):
    keys = set()

    def add(prefix, names):
        for n in names:
            keys.add(f"{prefix}.{n}.weight")
            keys.add(f"{prefix}.{n}.bias")

    keys.update({"time_embed.0.weight", "time_embed.0.bias",
                 "time_embed.2.weight", "time_embed.2.bias",
                 "out.0.weight", "out.0.bias", "out.2.weight", "out.2.bias"})
    if cfg.num_classes is not None:
        keys.add("label_emb.weight")

    def layer_keys(spec, prefix):
        if spec.kind == "conv":
            keys.update({f"{prefix}.weight", f"{prefix}.bias"})
        elif spec.kind == "res":
            add(prefix, ["in_layers.0", "in_layers.2", "emb_layers.1",
                         "out_layers.0", "out_layers.3"])
            keys.update({f"{prefix}.skip_connection.weight", f"{prefix}.skip_connection.bias"})
        elif spec.kind == "attn":
            add(prefix, ["norm", "qkv", "proj_out"])
        elif spec.kind == "down":
            keys.update({f"{prefix}.op.weight", f"{prefix}.op.bias"})
        elif spec.kind == "up":
            keys.update({f"{prefix}.conv.weight", f"{prefix}.conv.bias"})

    for bi, block in enumerate(plan.input_blocks):
        for li, spec in enumerate(block):
            layer_keys(spec, f"input_blocks.{bi}.{li}")
    for li, spec in enumerate(plan.middle_block):
        layer_keys(spec, f"middle_block.{li}")
    for bi, block in enumerate(plan.output_blocks):
        for li, spec in enumerate(block):
            layer_keys(spec, f"output_blocks.{bi}.{li}")
    return keys


def load_torch_checkpoint(path: str, cfg: UNetConfig, use_ema: bool = True) -> Dict:
    """Load a reference .pt checkpoint file into flax params.

    Prefers the EMA weights (``model_ema``) like the reference's sampling
    path (train.py:148-149); falls back to ``model``.
    """
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(raw, Mapping) and use_ema and "model_ema" in raw:
        sd = fix_legacy_dict({"model": raw["model_ema"]})
    else:
        sd = fix_legacy_dict(raw)
    return convert_state_dict(sd, cfg)


def params_to_state_dict(params: Dict, cfg: UNetConfig) -> Dict[str, np.ndarray]:
    """Inverse conversion (flax -> torch layout), for exporting trained
    models back to reference-consumable checkpoints."""
    plan = build_unet_plan(cfg)
    p = params["params"]
    sd: Dict[str, np.ndarray] = {}

    def put_dense(prefix, d):
        sd[f"{prefix}.weight"] = np.asarray(d["kernel"]).T
        sd[f"{prefix}.bias"] = np.asarray(d["bias"])

    def put_conv(prefix, d):
        sd[f"{prefix}.weight"] = np.asarray(d["kernel"]).transpose(3, 2, 0, 1)
        sd[f"{prefix}.bias"] = np.asarray(d["bias"])

    def put_conv1d(prefix, d):
        sd[f"{prefix}.weight"] = np.asarray(d["kernel"]).T[:, :, None]
        sd[f"{prefix}.bias"] = np.asarray(d["bias"])

    def put_gn(prefix, d):
        sd[f"{prefix}.weight"] = np.asarray(d["GroupNorm_0"]["scale"])
        sd[f"{prefix}.bias"] = np.asarray(d["GroupNorm_0"]["bias"])

    def put_layer(spec, flax_name, prefix):
        d = p[flax_name]
        if spec.kind == "conv":
            put_conv(prefix, d)
        elif spec.kind == "res":
            put_gn(f"{prefix}.in_layers.0", d["in_norm"])
            put_conv(f"{prefix}.in_layers.2", d["in_conv"])
            put_dense(f"{prefix}.emb_layers.1", d["emb_proj"])
            put_gn(f"{prefix}.out_layers.0", d["out_norm"])
            put_conv(f"{prefix}.out_layers.3", d["out_conv"])
            if "skip_conv" in d:
                put_conv(f"{prefix}.skip_connection", d["skip_conv"])
        elif spec.kind == "attn":
            put_gn(f"{prefix}.norm", d["norm"])
            put_conv1d(f"{prefix}.qkv", d["qkv"])
            put_conv1d(f"{prefix}.proj_out", d["proj_out"])
        elif spec.kind == "down":
            put_conv(f"{prefix}.op", d["conv"])
        elif spec.kind == "up":
            put_conv(f"{prefix}.conv", d["conv"])

    put_dense("time_embed.0", p["time_embed_0"])
    put_dense("time_embed.2", p["time_embed_2"])
    if cfg.num_classes is not None:
        sd["label_emb.weight"] = np.asarray(p["label_emb"]["embedding"])
    for bi, block in enumerate(plan.input_blocks):
        for li, spec in enumerate(block):
            put_layer(spec, f"input_{bi}_{li}", f"input_blocks.{bi}.{li}")
    for li, spec in enumerate(plan.middle_block):
        put_layer(spec, f"middle_{li}", f"middle_block.{li}")
    for bi, block in enumerate(plan.output_blocks):
        for li, spec in enumerate(block):
            put_layer(spec, f"output_{bi}_{li}", f"output_blocks.{bi}.{li}")
    put_gn("out.0", p["out_norm"])
    put_conv("out.2", p["out_conv"])
    return sd


def main():
    ap = argparse.ArgumentParser(description="Convert torch EO_Diffusion checkpoint to Orbax")
    ap.add_argument("input", help=".pt checkpoint")
    ap.add_argument("output", help="output Orbax directory")
    ap.add_argument("--preset", default="clouds64-attn")
    ap.add_argument("--no_ema", action="store_true")
    args = ap.parse_args()

    from eo_diffusion_tpu.cli.presets import get_preset
    from eo_diffusion_tpu.train.checkpoint import save_checkpoint

    cfg = get_preset(args.preset).unet_config(bf16=False)
    params = load_torch_checkpoint(args.input, cfg, use_ema=not args.no_ema)
    import os

    out_dir, name = os.path.split(os.path.abspath(args.output))
    save_checkpoint(out_dir, params, name=name)
    print(f"converted {args.input} -> {args.output}")


if __name__ == "__main__":
    main()
