"""Block-size sweep for the zero-copy fused-qkv attention inside the full
256px DDIM-50 sample (the headline program).

The folded kernel capped block_q at 512 (1024 blew scoped VMEM composed with
the surrounding ops); the zero-copy kernel skips the lane-pad copies so
larger tiles may fit now.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_attn_blocks.py
"""

from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

IMAGE, BATCH, STEPS, ITERS = 256, 8, 50, 3


def main():
    import eo_diffusion_tpu.ops.attention as A
    from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from eo_diffusion_tpu.models.unet import UNet, unet_clouds

    cfg = unet_clouds(IMAGE, dtype=jnp.bfloat16)
    model = UNet(cfg)
    diffusion = GaussianDiffusion.create(timesteps=1000, image_size=IMAGE, in_channels=3)
    x0 = jnp.zeros((1, IMAGE, IMAGE, 3), jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32))

    orig = A.attention_from_qkv

    def bench(bq, bk):
        A.attention_from_qkv = functools.partial(orig, block_q=bq, block_k=bk)

        def sample(params, rng):
            fn = lambda x, t, c, y: model.apply(params, x, t, cond=c, y=y)
            out = diffusion.ddim_sample(fn, rng, BATCH, num_steps=STEPS,
                                        dtype=jnp.bfloat16)
            return jnp.float32(jnp.sum(out.x))

        try:
            f = jax.jit(sample)
            float(f(params, jax.random.PRNGKey(0)))
            t0 = time.time()
            for i in range(ITERS):
                float(f(params, jax.random.PRNGKey(i)))
            dt = (time.time() - t0) / ITERS
            print(f"bq={bq} bk={bk}: {dt*1e3:.0f} ms/batch, {BATCH/dt:.3f} img/s",
                  flush=True)
        except Exception as e:
            print(f"bq={bq} bk={bk}: FAIL {type(e).__name__}: {str(e)[:90]}",
                  flush=True)
        finally:
            A.attention_from_qkv = orig

    for bq, bk in ((512, 2048), (1024, 2048), (1024, 1024), (2048, 1024),
                   (512, 4096), (1024, 4096)):
        bench(bq, bk)


if __name__ == "__main__":
    main()
