"""Weight-only int8 serving bench: raw-engine throughput bf16 vs int8.

Measures the SamplerEngine at the 256px DDIM-50 headline protocol (clouds
UNet) with and without --int8 packing (utils/quantize.py), on the real
chip. Weight-only int8 halves the per-step weight-read bytes; at serving
batch sizes the weights are the non-amortized stream, so any gain shows
here (and any dequant overhead too — honest either way).

Writes gallery/int8_bench.json.
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


def main():
    from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from eo_diffusion_tpu.models.unet import UNet, unet_clouds
    from eo_diffusion_tpu.serving.engine import SamplerEngine, ServingConfig

    size, batch, steps = 256, 8, 50
    cfg = unet_clouds(size, dtype=jnp.bfloat16)
    model = UNet(cfg)
    diffusion = GaussianDiffusion.create(timesteps=1000, image_size=size,
                                         in_channels=3)
    x0 = jnp.zeros((1, size, size, 3), jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                                 jnp.zeros((1,), jnp.int32))

    out = {"size": size, "batch": batch, "steps": steps}
    for tag, i8 in [("bf16", False), ("int8", True)]:
        eng = SamplerEngine(model, params, diffusion, size, 3,
                            ServingConfig(batch_size=batch, sampler="ddim",
                                          steps=steps, int8=i8))
        warm = eng.warmup()
        t0 = time.time()
        for i in range(3):
            x = eng.generate(jax.random.PRNGKey(i), None, None)
        dt = (time.time() - t0) / 3
        out[tag] = {"img_s": round(batch / dt, 4), "warmup_s": round(warm, 1),
                    "finite": bool(np.isfinite(x).all())}
        print(f"{tag}: {out[tag]}", flush=True)
    out["speedup"] = round(out["int8"]["img_s"] / out["bf16"]["img_s"], 3)
    path = os.path.join(ROOT, "gallery", "int8_bench.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
