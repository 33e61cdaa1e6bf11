"""1024x1024 scene sampling on the flow stack (tiled_flow_sample).

The trained flow64 UNet (tools/capstone_dit_flow.py checkpoint) samples a
961-tile scene with Heun/Euler ODE integration: ~15 stitched evaluations
instead of DDIM-50's 50, targeting a large multiple over the 29.7 s/scene
DeepCache-DDIM record (gallery/scene1024_dc_metrics.json) at comparable
seam quality. Saves gallery/scene1024_flow_*.png + metrics JSON.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/scene1024_flow.py
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
CKPT = os.path.join(ROOT, "logs", "capstone_dit_flow", "flow64")
GALLERY = os.path.join(ROOT, "gallery")
SIZE, SCENE, TILE_BATCH = 64, 1024, 128


def main():
    from eo_diffusion_tpu.diffusion.flow import FlowMatching
    from eo_diffusion_tpu.diffusion.tiled import make_tile_grid, tiled_flow_sample
    from eo_diffusion_tpu.models.unet import UNet, UNetConfig
    from eo_diffusion_tpu.train.checkpoint import restore_params
    from eo_diffusion_tpu.utils.images import save_image_grid

    # same architecture as tools/capstone_dit_flow.build_flow_unet
    cfg = UNetConfig(image_size=SIZE, in_channels=3, model_channels=64,
                     out_channels=3, num_res_blocks=1,
                     attention_resolutions=(4, 8), channel_mult=(1, 2, 3, 4),
                     num_heads=4, dtype=jnp.bfloat16)
    model = UNet(cfg)
    fm = FlowMatching.create(image_size=SIZE, in_channels=3)
    x0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                                 jnp.zeros((1,), jnp.int32))
    _, ema = restore_params(CKPT, params)
    ema = jax.tree.map(jnp.asarray, ema)

    grid = make_tile_grid(SCENE, SCENE, SIZE, overlap=0.5)
    print(f"{grid.num_tiles} tiles, tile_batch {TILE_BATCH}", flush=True)

    def seam_metric(img):
        g_all = np.mean(np.abs(np.diff(img, axis=2)))
        bounds = np.arange(SIZE // 2, SCENE, SIZE // 2)[:-1]
        g_b = np.mean(np.abs(img[:, :, bounds] - img[:, :, bounds - 1]))
        return float(g_b / max(g_all, 1e-9))

    results = {}

    def run(label, steps, method):
        def sample(p, rng):
            fn = lambda x, t, c, y: model.apply(p, x, t, cond=c, y=y)
            out = tiled_flow_sample(
                fm, fn, rng, 1, SCENE, SCENE, num_steps=steps, method=method,
                tile_batch=TILE_BATCH, dtype=jnp.bfloat16,
            )
            return out.x.astype(jnp.float32)

        j = jax.jit(sample)
        x = np.asarray(j(ema, jax.random.PRNGKey(7)))  # compile + warm
        t0 = time.time()
        x = np.asarray(j(ema, jax.random.PRNGKey(8)))
        dt = time.time() - t0
        seam = seam_metric(x)
        grad = float(np.mean(np.abs(np.diff(x, axis=1))))
        results[label] = {"s_per_scene": dt, "seam_ratio": seam, "grad": grad}
        print(f"{label}: {dt:.1f} s/scene, seam ratio {seam:.3f}, "
              f"grad {grad:.4f}", flush=True)
        save_image_grid(np.clip((x[0] + 1) / 2, 0, 1),
                        os.path.join(GALLERY, f"scene1024_flow_{label}.png"))

    run("heun8", 8, "heun")
    run("euler16", 16, "euler")
    run("heun16", 16, "heun")

    with open(os.path.join(GALLERY, "scene1024_flow_metrics.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
