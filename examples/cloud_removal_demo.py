"""Cloud-removal demo -- the reference notebook recipe (``EO_Diffusion.ipynb``)
as a script.

Reference recipe (notebook cells 6-13): clouds config UNet (base_dim=128,
dim_mults=[1,2,3,4], attention at ds 4/8, num_res_blocks=2, num_heads=8,
64x64), checkpoint ``results/clouds_best.pt``, RePaint-"sum" sampling on
(cloudy RGB | inverted cloud mask) conditioning.

Usage:
    # with the published torch checkpoint:
    python examples/cloud_removal_demo.py --ckpt clouds_best.pt \
        --image cloudy.png --mask cloudmask.png --out results/demo
    # data-free smoke demo (synthetic scene + random-init model):
    python examples/cloud_removal_demo.py --synthetic --timesteps 50
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=str, default=None, help=".pt or Orbax checkpoint")
    ap.add_argument("--image", type=str, default=None, help="cloudy RGB input")
    ap.add_argument("--mask", type=str, default=None, help="cloud mask (white=cloud)")
    ap.add_argument("--out", type=str, default="results/demo")
    ap.add_argument("--timesteps", type=int, default=1000)
    ap.add_argument("--ddim", type=int, default=0, help="use DDIM with this many steps")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny model + 16px scenes (CPU-runnable CI smoke)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from eo_diffusion_tpu.models.unet import UNet, UNetConfig, unet_clouds
    from eo_diffusion_tpu.utils.images import save_image_grid

    if args.smoke:
        size = 16
        args.timesteps = min(args.timesteps, 20)
        cfg = UNetConfig(image_size=size, in_channels=3, model_channels=16,
                         out_channels=3, num_res_blocks=1,
                         attention_resolutions=(), channel_mult=(1, 2),
                         dtype=jnp.bfloat16)
    else:
        size = 64
        cfg = unet_clouds(size, dtype=jnp.bfloat16)
    model = UNet(cfg)
    diffusion = GaussianDiffusion.create(
        timesteps=args.timesteps, image_size=size, in_channels=3, cond_type="sum"
    )

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
        print(f"loaded {args.ckpt}")

    if args.synthetic or args.image is None:
        from eo_diffusion_tpu.data.datasets import SyntheticEO

        ds = SyntheticEO(size=size, length=4, with_mask=True)
        items = [ds[i] for i in range(4)]
        image = np.stack([it["image"] for it in items])
        mask = np.stack([it["segmentation"] for it in items])
        print("using synthetic cloudy scenes")
    else:
        from PIL import Image

        img = np.asarray(Image.open(args.image).convert("RGB").resize((size, size)),
                         np.float32)[None] / 255.0
        m = np.asarray(Image.open(args.mask).convert("L").resize((size, size)),
                       np.float32)[None, :, :, None] / 255.0
        image, mask = img, (m > 0.5).astype(np.float32)

    # known region = NOT cloud (reference inference.py:101 inverts the mask)
    cond = np.concatenate([image, 1.0 - mask], axis=-1)
    model_fn = lambda x, t, c, y: model.apply(params, x, t, cond=c, y=y)

    rng = jax.random.PRNGKey(0)
    if args.ddim:
        out = diffusion.ddim_sample(
            model_fn, rng, image.shape[0], num_steps=args.ddim,
            mask=jnp.asarray(1.0 - mask), x0=jnp.asarray(image), clip=True,
        )
    else:
        out = diffusion.ddpm_sample(model_fn, rng, image.shape[0], cond=jnp.asarray(cond))
    samples = np.asarray(out.x, np.float32)

    os.makedirs(args.out, exist_ok=True)
    save_image_grid(image, os.path.join(args.out, "input_cloudy.png"), nrow=2)
    save_image_grid(np.repeat(mask, 3, -1), os.path.join(args.out, "cloud_mask.png"), nrow=2)
    save_image_grid(samples, os.path.join(args.out, "cloud_removed.png"), nrow=2)
    print(f"wrote input/mask/result grids to {args.out}/")


if __name__ == "__main__":
    main()
