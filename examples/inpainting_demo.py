"""Urban-replanning inpainting demo (the third reference use-case,
README.md:29-36): RePaint-regenerate a random rectangular region of a scene
with an unconditional model -- "replan" a city block.

Usage:
    python examples/inpainting_demo.py --ckpt logs/inria/best --image scene.png
    python examples/inpainting_demo.py --synthetic --timesteps 50   # data-free smoke
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--image", type=str, default=None)
    ap.add_argument("--out", type=str, default="results/inpaint")
    ap.add_argument("--timesteps", type=int, default=1000)
    ap.add_argument("--sampler", choices=["ddpm", "ddim"], default="ddpm")
    ap.add_argument("--ddim_steps", type=int, default=100)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny model + 16px scenes (CPU-runnable CI smoke)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from eo_diffusion_tpu.data.transforms import random_rect_mask
    from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from eo_diffusion_tpu.models.unet import UNet, UNetConfig, unet_clouds
    from eo_diffusion_tpu.utils.images import save_image_grid

    if args.smoke:
        size = 16
        args.timesteps = min(args.timesteps, 20)
        args.ddim_steps = min(args.ddim_steps, 5)
        cfg = UNetConfig(image_size=size, in_channels=3, model_channels=16,
                         out_channels=3, num_res_blocks=1,
                         attention_resolutions=(), channel_mult=(1, 2),
                         dtype=jnp.bfloat16)
    else:
        size = 64
        cfg = unet_clouds(size, dtype=jnp.bfloat16)
    model = UNet(cfg)
    diffusion = GaussianDiffusion.create(timesteps=args.timesteps, image_size=size,
                                         in_channels=3, cond_type="sum")
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3), jnp.bfloat16),
        jnp.zeros((1,), jnp.int32),
    )
    if args.ckpt:
        if os.path.isdir(args.ckpt):
            from eo_diffusion_tpu.train.checkpoint import restore_params

            _, params = restore_params(args.ckpt, params)
        else:
            from eo_diffusion_tpu.tools.convert_ckpt import load_torch_checkpoint

            params = load_torch_checkpoint(args.ckpt, cfg)

    if args.synthetic or args.image is None:
        from eo_diffusion_tpu.data.datasets import SyntheticEO

        ds = SyntheticEO(size=size, length=4, with_mask=False)
        scenes = np.stack([ds[i]["image"] for i in range(4)])
    else:
        from PIL import Image

        scenes = np.asarray(
            Image.open(args.image).convert("RGB").resize((size, size)), np.float32
        )[None] / 255.0

    # "replan" region = random rectangle (reference make_label,
    # script_utils/utils.py:17-37, via inference.py --random_label)
    rng = np.random.default_rng(args.seed)
    lo, hi = max(size // 6, 2), max(size * 40 // 64, 4)
    rect = np.stack([random_rect_mask((size, size), lo, lo, hi, hi, rng)
                     for _ in range(scenes.shape[0])])
    known = 1.0 - rect  # regenerate inside the rectangle

    model_fn = lambda x, t, c, y: model.apply(params, x, t, cond=c, y=y)
    if args.sampler == "ddpm":
        cond = np.concatenate([scenes, known], -1)
        out = diffusion.ddpm_sample(model_fn, jax.random.PRNGKey(args.seed),
                                    scenes.shape[0], cond=jnp.asarray(cond), clip=True)
    else:
        out = diffusion.ddim_sample(model_fn, jax.random.PRNGKey(args.seed),
                                    scenes.shape[0], num_steps=args.ddim_steps,
                                    mask=jnp.asarray(known), x0=jnp.asarray(scenes),
                                    clip=True)
    replanned = np.asarray(out.x, np.float32)

    os.makedirs(args.out, exist_ok=True)
    save_image_grid(scenes, os.path.join(args.out, "original.png"), nrow=2)
    save_image_grid(np.repeat(rect, 3, -1), os.path.join(args.out, "replan_region.png"), nrow=2)
    save_image_grid(np.clip(replanned, 0, 1), os.path.join(args.out, "replanned.png"), nrow=2)
    print(f"wrote original/region/replanned grids to {args.out}/")


if __name__ == "__main__":
    main()
