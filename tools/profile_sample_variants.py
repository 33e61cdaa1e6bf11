"""Headline-sampling variant probe: f32 params vs bf16-cast params.

Params are stored f32 (convention); inside the DDIM scan every conv/dense
re-casts its weight to bf16 each step unless XLA hoists the converts out of
the while loop. Casting the whole tree to bf16 once, outside the scan,
halves the per-step weight HBM traffic if hoisting is NOT happening
(88M params f32 = 352 MB/step read+convert vs 176 MB).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_sample_variants.py
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

IMAGE = 256
BATCH = 8
STEPS = 50
ITERS = 3


def main():
    from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from eo_diffusion_tpu.models.unet import UNet, unet_clouds

    cfg = unet_clouds(IMAGE, dtype=jnp.bfloat16)
    model = UNet(cfg)
    diffusion = GaussianDiffusion.create(timesteps=1000, image_size=IMAGE, in_channels=3)

    x0 = jnp.zeros((1, IMAGE, IMAGE, 3), jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32))

    def sample(params, rng):
        model_fn = lambda x, t, c, y: model.apply(params, x, t, cond=c, y=y)
        out = diffusion.ddim_sample(
            model_fn, rng, BATCH, num_steps=STEPS, dtype=jnp.bfloat16
        )
        return jnp.float32(jnp.sum(out.x))

    def bench(p, label):
        f = jax.jit(sample)
        float(f(p, jax.random.PRNGKey(0)))  # compile+warm
        t0 = time.time()
        for i in range(ITERS):
            float(f(p, jax.random.PRNGKey(i)))
        dt = (time.time() - t0) / ITERS
        print(f"{label}: {dt*1e3:.0f} ms/batch, {BATCH/dt:.3f} img/s")
        return BATCH / dt

    bench(params, "f32 params (shipped)")

    bf16_params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )
    bench(bf16_params, "bf16-cast params")

    # DeepCache: recompute the deep branch every k steps
    from eo_diffusion_tpu.diffusion.deepcache import deepcache_model_fn

    for k in (2, 3, 5):
        fn, st0 = deepcache_model_fn(
            model, params, jnp.zeros((BATCH, IMAGE, IMAGE, 3), jnp.bfloat16),
            refresh_every=k,
        )

        def sample_dc(params_unused, rng, fn=fn, st0=st0):
            out = diffusion.ddim_sample(
                fn, rng, BATCH, num_steps=STEPS, dtype=jnp.bfloat16,
                model_state=st0,
            )
            return jnp.float32(jnp.sum(out.x))

        f = jax.jit(sample_dc)
        float(f(None, jax.random.PRNGKey(0)))
        t0 = time.time()
        for i in range(ITERS):
            float(f(None, jax.random.PRNGKey(i)))
        dt = (time.time() - t0) / ITERS
        print(f"deepcache k={k}: {dt*1e3:.0f} ms/batch, {BATCH/dt:.3f} img/s")


if __name__ == "__main__":
    main()
