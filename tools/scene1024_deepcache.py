"""1024x1024 tiled scene sampling with DeepCache (VERDICT r2 #6 target:
<=30 s/scene from the r2 42 s at unchanged seam quality).

The r3 tiled_ddim_sample threads model_state, so the two flagship
accelerations compose: 961 overlapping 64px tiles, DDIM-50, the deep UNet
branch recomputed every k steps. Saves gallery/scene1024_dc{k}.png and a
timing/quality JSON.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/scene1024_deepcache.py
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(ROOT, "logs", "capstone_r2", "final")
GALLERY = os.path.join(ROOT, "gallery")
SIZE, SCENE, STEPS, TILE_BATCH = 64, 1024, 50, 128


def main():
    from eo_diffusion_tpu.diffusion.deepcache import deepcache_model_fn
    from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from eo_diffusion_tpu.diffusion.tiled import make_tile_grid, tiled_ddim_sample
    from eo_diffusion_tpu.models.unet import UNet, unet_clouds
    from eo_diffusion_tpu.train.checkpoint import restore_params
    from eo_diffusion_tpu.utils.images import save_image_grid

    cfg = unet_clouds(SIZE, dtype=jnp.bfloat16)
    model = UNet(cfg)
    diffusion = GaussianDiffusion.create(timesteps=1000, image_size=SIZE, in_channels=3)
    x0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32))
    params, _ = restore_params(CKPT, params)
    params = jax.tree.map(jnp.asarray, params)

    grid = make_tile_grid(SCENE, SCENE, SIZE, overlap=0.5)
    print(f"{grid.num_tiles} tiles, tile_batch {TILE_BATCH}", flush=True)

    def seam_metric(img):
        """Mean |gradient| on tile-boundary columns/rows vs everywhere: a
        seam shows up as boundary gradients exceeding the field's."""
        g_all = np.mean(np.abs(np.diff(img, axis=2)))
        bounds = np.arange(SIZE // 2, SCENE, SIZE // 2)[:-1]
        g_b = np.mean(np.abs(img[:, :, bounds] - img[:, :, bounds - 1]))
        return float(g_b / max(g_all, 1e-9))

    results = {}

    def run(label, refresh_every):
        def sample(p, rng):
            if refresh_every > 1:
                fn, st0 = deepcache_model_fn(
                    model, p, jnp.zeros((TILE_BATCH, SIZE, SIZE, 3), jnp.bfloat16),
                    refresh_every=refresh_every,
                )
            else:
                fn = lambda x, t, c, y: model.apply(p, x, t, cond=c, y=y)
                st0 = None
            out = tiled_ddim_sample(
                diffusion, fn, rng, 1, SCENE, SCENE, num_steps=STEPS,
                tile_batch=TILE_BATCH, dtype=jnp.bfloat16, model_state=st0,
            )
            return out.x.astype(jnp.float32)

        j = jax.jit(sample)
        x = np.asarray(j(params, jax.random.PRNGKey(7)))  # compile + warm
        t0 = time.time()
        x = np.asarray(j(params, jax.random.PRNGKey(8)))
        dt = time.time() - t0
        seam = seam_metric(x)
        results[label] = {"s_per_scene": dt, "seam_ratio": seam}
        print(f"{label}: {dt:.1f} s/scene, seam ratio {seam:.3f}", flush=True)
        save_image_grid(np.clip((x[0] + 1) / 2, 0, 1),
                        os.path.join(GALLERY, f"scene1024_{label}.png"))

    run("ddim50", 0)
    run("ddim50_dc2", 2)
    run("ddim50_dc3", 3)

    with open(os.path.join(GALLERY, "scene1024_dc_metrics.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
