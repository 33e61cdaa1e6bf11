"""Adapter fine-tuning CLI: LoRA deltas or a ControlNet branch.

``python -m eo_diffusion_tpu.cli.finetune --preset eurosat64 \\
      --ckpt logs/run/best --dataset clouds --lora_rank 8 --steps 2000``

``--method lora`` (default) trains low-rank deltas on the kernel leaves
(train/lora.py); serve with ``cli/inference.py --lora <dir>`` which
merges them at load time. ``--method controlnet`` trains a zero-init
encoder-copy branch (models/controlnet.py, arXiv:2302.05543) that adds a
NEW conditioning modality — the hint image — to a frozen unconditional
checkpoint; serve with ``cli/inference.py --controlnet <dir>``. Both
train ONLY the adapter (fraction of base printed), leave the base
checkpoint untouched, and save portable flat ``.npz`` + ``.json`` pairs.
The canonical EO uses: adapt to a new sensor/region (LoRA), or bolt a
late-arriving paired modality (SAR, DEM, a cloudy view) onto a shipped
model (ControlNet). The reference's only adaptation story is
full-weights resume (reference train.py:94-98).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="adapter fine-tuning")
    p.add_argument("--method", type=str, default="lora",
                   choices=["lora", "controlnet"],
                   help="lora = low-rank weight deltas; controlnet = "
                        "zero-init encoder-copy branch adding a NEW "
                        "conditioning modality (the hint image) to a "
                        "frozen checkpoint")
    p.add_argument("--hint_source", type=str, default="auto",
                   choices=["auto", "cond_image", "gray"],
                   help="controlnet hint per batch: the dataset's paired "
                        "cond_image view, or a derived grayscale of the "
                        "target (auto = cond_image when present)")
    p.add_argument("--preset", type=str, default="eurosat64")
    p.add_argument("--ckpt", type=str, required=True,
                   help="base TrainState checkpoint directory")
    p.add_argument("--dataset", type=str, default=None,
                   help="target-domain dataset (default: the preset's)")
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--lora_rank", type=int, default=8)
    p.add_argument("--lora_alpha", type=float, default=8.0)
    p.add_argument("--targets", type=str, nargs="*", default=None,
                   help="path substrings selecting which kernels get "
                        "adapters (default: all 2-D/4-D kernels)")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--lr", type=float, default=1e-3,
                   help="adapter LR (adapters tolerate ~10x the full-"
                        "weights LR)")
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--dir", type=str, default="results/lora")
    p.add_argument("--image_size", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no_bf16", action="store_true")
    p.add_argument("--use_raw_params", action="store_true")
    p.add_argument("--cpu", action="store_true")
    return p.parse_args(argv)


def save_lora(outdir: str, lora, meta: dict) -> None:
    import numpy as np

    flat = {}
    for path, ab in lora.items():
        flat[path + "::a"] = np.asarray(ab["a"])
        flat[path + "::b"] = np.asarray(ab["b"])
    os.makedirs(outdir, exist_ok=True)
    np.savez(os.path.join(outdir, "lora.npz"), **flat)
    with open(os.path.join(outdir, "lora.json"), "w") as f:
        json.dump(meta, f, indent=2)


def load_lora(path: str):
    """Returns (lora tree, meta dict). ``path`` is the --dir of a
    finetune run (or a direct lora.npz path)."""
    import numpy as np

    npz = path if path.endswith(".npz") else os.path.join(path, "lora.npz")
    meta_path = os.path.join(os.path.dirname(npz), "lora.json")
    data = np.load(npz)
    lora = {}
    for k in data.files:
        p, part = k.rsplit("::", 1)
        lora.setdefault(p, {})[part] = data[k]
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return lora, meta


def _batch_hint(batch, source: str):
    """Per-batch hint image for the ControlNet branch (numpy, NHWC)."""
    import numpy as np

    if source in ("auto", "cond_image") and "cond_image" in batch:
        return np.asarray(batch["cond_image"], np.float32)
    assert source != "cond_image", (
        "--hint_source cond_image: the dataset supplies no paired view")
    img = np.asarray(batch["image"], np.float32)
    return img.mean(axis=-1, keepdims=True)


def main_controlnet(args):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from eo_diffusion_tpu.cli.presets import build_denoiser, build_process, get_preset
    from eo_diffusion_tpu.data.factories import DATASET_FACTORIES
    from eo_diffusion_tpu.models.controlnet import (
        ControlNet,
        control_param_count,
        init_from_base,
        save_controlnet,
    )
    from eo_diffusion_tpu.train.checkpoint import restore_params

    preset = get_preset(args.preset)
    assert preset.backbone == "unet" and not preset.is_latent, (
        "ControlNet adapters are wired for pixel-space UNet presets")
    if args.image_size:
        preset.image_size = args.image_size
    batch_size = args.batch_size or preset.batch_size
    dataset = args.dataset or preset.dataset

    diffusion = build_process(preset, preset.timesteps, preset.image_size,
                              cond_type=None)
    mcfg = preset.model_config(bf16=not args.no_bf16)
    model = build_denoiser(mcfg)

    fkw = dict(batch_size=batch_size)
    if args.data_root:
        fkw["root"] = args.data_root
    if dataset == "synthetic":
        fkw["image_size"] = preset.image_size
        fkw["channels"] = preset.in_channels
        if args.hint_source in ("auto", "cond_image"):
            fkw["with_cond_image"] = True
    train_loader, _ = DATASET_FACTORIES[dataset](**fkw)

    x0 = jnp.zeros((1, preset.image_size, preset.image_size,
                    preset.in_channels), jnp.float32)
    t0 = jnp.zeros((1,), jnp.int32)
    template = jax.jit(model.init)(jax.random.PRNGKey(0), x0, t0)
    raw, ema = restore_params(args.ckpt, template)
    base = jax.tree.map(jnp.asarray, raw if args.use_raw_params else ema)
    n_base = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(base))

    it = iter(train_loader)
    first = next(it)
    hint0 = _batch_hint(first, args.hint_source)
    hint_ch = hint0.shape[-1]

    cnet = ControlNet(mcfg, hint_channels=hint_ch)
    cparams = jax.jit(cnet.init)(
        jax.random.PRNGKey(args.seed), x0, t0,
        jnp.zeros((1, preset.image_size, preset.image_size, hint_ch)))
    cparams, n_copied = init_from_base(cparams, base)
    n_ctrl = control_param_count(cparams)
    print(f"ControlNet: {n_copied} encoder leaves copied from base, "
          f"{n_ctrl/1e6:.2f}M adapter params "
          f"({100.0*n_ctrl/n_base:.1f}% of {n_base/1e6:.2f}M base), "
          f"hint_channels={hint_ch}")

    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, max(args.steps // 20, 1), args.steps, args.lr * 0.01)
    tx = optax.adamw(sched)
    opt = tx.init(cparams)

    @jax.jit
    def jstep(cparams, opt, base, rng, img, hint):
        def loss_fn(cp):
            def fn(x, t, c, y=None):
                control = cnet.apply(cp, x, t, c, y=y)
                return model.apply(base, x, t, y=y, control=control)
            return diffusion.train_loss(fn, rng, img, cond=hint)

        loss, grads = jax.value_and_grad(loss_fn)(cparams)
        up, opt = tx.update(grads, opt, cparams)
        return optax.apply_updates(cparams, up), opt, loss

    rng = jax.random.PRNGKey(args.seed)
    t0s = time.time()
    loss0 = loss = None
    batch = first
    for i in range(args.steps):
        img = jnp.asarray(np.asarray(batch["image"], np.float32))
        hint = jnp.asarray(_batch_hint(batch, args.hint_source))
        rng, srng = jax.random.split(rng)
        cparams, opt, l = jstep(cparams, opt, base, srng, img, hint)
        if i == 0:
            loss0 = float(l)
        if (i + 1) % max(args.steps // 10, 1) == 0:
            loss = float(l)
            print(f"step {i+1}/{args.steps} loss={loss:.5f} "
                  f"({(time.time()-t0s)/(i+1)*1e3:.0f} ms/step)")
        try:
            batch = next(it)
        except StopIteration:
            it = iter(train_loader)
            batch = next(it)
    print(f"fine-tuned: loss {loss0:.5f} -> {loss:.5f}")

    save_controlnet(args.dir, jax.device_get(cparams), {
        "preset": args.preset, "hint_channels": hint_ch,
        "hint_source": args.hint_source,
        "base_ckpt": os.path.abspath(args.ckpt),
        "dataset": dataset, "steps": args.steps,
        "n_ctrl_params": n_ctrl, "n_base_params": n_base,
        "loss_first": loss0, "loss_last": loss,
    })
    print(f"adapter saved to {args.dir} (controlnet.npz + controlnet.json)")
    return {"loss_first": loss0, "loss_last": loss, "n_ctrl": n_ctrl}


def main(args):
    if args.method == "controlnet":
        return main_controlnet(args)
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from eo_diffusion_tpu.cli.presets import build_denoiser, build_process, get_preset
    from eo_diffusion_tpu.data.factories import DATASET_FACTORIES
    from eo_diffusion_tpu.train.checkpoint import restore_params
    from eo_diffusion_tpu.train.lora import (
        lora_init,
        lora_merge,
        lora_param_count,
    )

    preset = get_preset(args.preset)
    assert not preset.is_latent, (
        "LoRA fine-tuning is wired for pixel-space presets (adapt the "
        "denoiser; the first stage is frozen anyway)")
    if args.image_size:
        preset.image_size = args.image_size
    batch_size = args.batch_size or preset.batch_size
    dataset = args.dataset or preset.dataset

    diffusion = build_process(preset, preset.timesteps, preset.image_size,
                              cond_type=None)
    mcfg = preset.model_config(bf16=not args.no_bf16)
    model = build_denoiser(mcfg)

    fkw = dict(batch_size=batch_size)
    if args.data_root:
        fkw["root"] = args.data_root
    if dataset == "synthetic":
        fkw["image_size"] = preset.image_size
        fkw["channels"] = preset.in_channels
    train_loader, _ = DATASET_FACTORIES[dataset](**fkw)

    x0 = jnp.zeros((1, preset.image_size, preset.image_size,
                    preset.in_channels), jnp.float32)
    template = jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                                   jnp.zeros((1,), jnp.int32))
    raw, ema = restore_params(args.ckpt, template)
    base = jax.tree.map(jnp.asarray, raw if args.use_raw_params else ema)
    n_base = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(base))

    rng = jax.random.PRNGKey(args.seed)
    lora = lora_init(rng, base, rank=args.lora_rank, match=args.targets)
    n_lora = lora_param_count(lora)
    print(f"LoRA: {len(lora)} adapted kernels, {n_lora/1e3:.1f}k adapter "
          f"params ({100.0*n_lora/n_base:.2f}% of {n_base/1e6:.2f}M base)")

    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, max(args.steps // 20, 1), args.steps, args.lr * 0.01)
    tx = optax.adamw(sched)
    opt = tx.init(lora)

    @jax.jit
    def jstep(lora, opt, base, rng, batch):
        def loss_fn(lr_tree):
            merged = lora_merge(base, lr_tree, alpha=args.lora_alpha)
            fn = lambda x, t, cond=None, y=None: model.apply(
                merged, x, t, cond=cond, y=y)
            return diffusion.train_loss(fn, rng, batch)

        loss, grads = jax.value_and_grad(loss_fn)(lora)
        up, opt = tx.update(grads, opt, lora)
        return optax.apply_updates(lora, up), opt, loss

    it = iter(train_loader)
    t0 = time.time()
    loss0 = loss = None
    for i in range(args.steps):
        try:
            batch = next(it)
        except StopIteration:
            it = iter(train_loader)
            batch = next(it)
        rng, srng = jax.random.split(rng)
        lora, opt, l = jstep(lora, opt, base, srng,
                             jnp.asarray(np.asarray(batch["image"],
                                                    np.float32)))
        if i == 0:
            loss0 = float(l)
        if (i + 1) % max(args.steps // 10, 1) == 0:
            loss = float(l)
            print(f"step {i+1}/{args.steps} loss={loss:.5f} "
                  f"({(time.time()-t0)/(i+1)*1e3:.0f} ms/step)")
    print(f"fine-tuned: loss {loss0:.5f} -> {loss:.5f}")

    save_lora(args.dir, jax.device_get(lora), {
        "preset": args.preset, "rank": args.lora_rank,
        "alpha": args.lora_alpha, "targets": args.targets,
        "base_ckpt": os.path.abspath(args.ckpt),
        "dataset": dataset, "steps": args.steps,
        "n_lora_params": n_lora, "n_base_params": n_base,
        "loss_first": loss0, "loss_last": loss,
    })
    print(f"adapter saved to {args.dir} (lora.npz + lora.json)")
    return {"loss_first": loss0, "loss_last": loss, "n_lora": n_lora}


if __name__ == "__main__":
    args = parse_args()
    if args.cpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    main(args)
