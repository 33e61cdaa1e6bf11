"""Synthetic change-pair generation demo (the OSCD use-case, README.md:21-28).

Generates the "after" image of a change pair conditioned on the "before"
image via channel-concat conditioning: a model trained as p(t2 | t1) on OSCD
pairs (or here, a smoke run on synthetic scene pairs where the 'change' is a
brightness/cover shift).

Usage:
    python examples/change_pair_demo.py --ckpt logs/oscd/best --data /data/OSCD_64_32/test
    python examples/change_pair_demo.py --synthetic --timesteps 50   # data-free smoke
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", type=str, default=None)
    ap.add_argument("--data", type=str, default=None, help="OSCD patch dir")
    ap.add_argument("--out", type=str, default="results/change_pairs")
    ap.add_argument("--timesteps", type=int, default=1000)
    ap.add_argument("--ddim", type=int, default=50)
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
        args.ddim = min(args.ddim, 5)
        cfg = UNetConfig(image_size=size, in_channels=3 + 3, model_channels=16,
                         out_channels=3, num_res_blocks=1,
                         attention_resolutions=(), channel_mult=(1, 2),
                         dtype=jnp.bfloat16)
    else:
        size = 64
        cfg = unet_clouds(size, in_channels=3 + 3, dtype=jnp.bfloat16)  # x | t1 cond
    model = UNet(cfg)
    diffusion = GaussianDiffusion.create(timesteps=args.timesteps, image_size=size,
                                         in_channels=3, cond_type="concat")
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3), jnp.bfloat16),
        jnp.zeros((1,), jnp.int32), cond=jnp.zeros((1, size, size, 3), jnp.bfloat16),
    )
    if args.ckpt:
        from eo_diffusion_tpu.train.checkpoint import restore_params

        _, params = restore_params(args.ckpt, params)

    if args.synthetic or args.data is None:
        from eo_diffusion_tpu.data.datasets import SyntheticEO

        ds = SyntheticEO(size=size, length=4)
        before = np.stack([ds[i]["image"] for i in range(4)])
        print("using synthetic 'before' scenes")
    else:
        from eo_diffusion_tpu.data.datasets import OSCDDataset

        ds = OSCDDataset(args.data, return_pair=True)
        before = np.stack([ds[i]["image2"][:size, :size] for i in range(4)])

    model_fn = lambda x, t, c, y: model.apply(params, x, t, cond=c, y=y)
    out = diffusion.ddim_sample(
        model_fn, jax.random.PRNGKey(0), before.shape[0],
        num_steps=args.ddim, cond=jnp.asarray(before), clip=True,
    )
    after = np.asarray(out.x, np.float32)

    os.makedirs(args.out, exist_ok=True)
    save_image_grid(before, os.path.join(args.out, "before.png"), nrow=2)
    save_image_grid(np.clip(after, 0, 1), os.path.join(args.out, "after_generated.png"), nrow=2)
    print(f"wrote before/after grids to {args.out}/")


if __name__ == "__main__":
    main()
