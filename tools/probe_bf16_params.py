"""Does casting params to bf16 speed up sampling? (round-3 probe)

Policy so far: params float32, activations bf16 (CLAUDE.md conventions).
During *sampling* the params are read-only, so a bf16 copy halves the
weight bytes streamed from HBM per step. Whether that matters depends on
which layers are bandwidth-bound: the big convs at 256px are MXU-bound,
but the 1x1 projections and emb MLPs stream weights per call.

Measures the headline protocol (clouds UNet, 256px DDIM-50 b8) and the
DiT-B/8 rider with f32 vs bf16 param trees, plus the numeric delta of one
forward. Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_bf16_params.py
"""

import json
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

IMAGE_SIZE, BATCH, STEPS, ITERS = 256, 8, 50, 3


def bench_one(tag, model, params, diffusion, results):
    def sample(params, rng):
        fn = lambda x, t, c, y: model.apply(params, x, t, cond=c, y=y)
        out = diffusion.ddim_sample(fn, rng, BATCH, num_steps=STEPS,
                                    dtype=jnp.bfloat16)
        return jnp.float32(jnp.sum(out.x))

    f = jax.jit(sample)
    for variant, p in (("f32", params),
                       ("bf16", jax.tree.map(
                           lambda x: x.astype(jnp.bfloat16)
                           if x.dtype == jnp.float32 else x, params))):
        float(f(p, jax.random.PRNGKey(0)))
        t0 = time.time()
        for i in range(ITERS):
            float(f(p, jax.random.PRNGKey(i)))
        dt = (time.time() - t0) / ITERS
        results[f"{tag}_{variant}_img_s"] = round(BATCH / dt, 3)

    # numeric delta of one forward (bf16 weights vs f32 weights)
    x = jax.random.normal(jax.random.PRNGKey(7),
                          (2, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.bfloat16)
    t = jnp.full((2,), 500, jnp.int32)
    fwd = jax.jit(lambda p: model.apply(p, x, t).astype(jnp.float32))
    a = fwd(params)
    b = fwd(jax.tree.map(lambda x: x.astype(jnp.bfloat16)
                         if x.dtype == jnp.float32 else x, params))
    results[f"{tag}_fwd_max_abs_delta"] = round(float(jnp.abs(a - b).max()), 5)
    results[f"{tag}_fwd_rms"] = round(float(jnp.sqrt(jnp.mean(a * a))), 5)


def main():
    from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from eo_diffusion_tpu.models.dit import DiT, dit_b
    from eo_diffusion_tpu.models.unet import UNet, unet_clouds

    diffusion = GaussianDiffusion.create(timesteps=1000, image_size=IMAGE_SIZE,
                                         in_channels=3)
    results = {}
    x0 = jnp.zeros((1, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.bfloat16)
    t0 = jnp.zeros((1,), jnp.int32)

    ucfg = unet_clouds(IMAGE_SIZE, dtype=jnp.bfloat16)
    unet = UNet(ucfg)
    uparams = jax.jit(unet.init)(jax.random.PRNGKey(0), x0, t0)
    bench_one("unet", unet, uparams, diffusion, results)
    print(json.dumps(results))

    dit = DiT(dit_b(IMAGE_SIZE, dtype=jnp.bfloat16))
    dparams = jax.jit(dit.init)(jax.random.PRNGKey(0), x0, t0)
    bench_one("dit_b8", dit, dparams, diffusion, results)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
