"""256px concat-preset train-step probe: Pallas flash backward vs the old
XLA-recompute backward.

The sen12mscr256 preset trains the clouds UNet at 256px (attention at
T=4096/1024). The old vjp recomputed attention with XLA einsums, whose
backward materializes the [B,H,T,T] probability matrix in HBM
(B8/H8/T4096 f32 = 4.3 GB per attention block) -- the micro-batch had to
shrink to fit. The Pallas backward keeps everything tile-resident.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_train256.py
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import optax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

PEAK_BF16 = 197e12
IMAGE = 256
REPS = 10


def run(batch: int, xla_bwd: bool):
    import eo_diffusion_tpu.ops.attention as A
    from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from eo_diffusion_tpu.models.unet import UNet, unet_clouds
    from eo_diffusion_tpu.train.trainer import TrainState, make_train_step
    from eo_diffusion_tpu.utils.profiling import flops_of

    orig = A._flash_bwd_impl
    if xla_bwd:
        # the round-1 behavior: recompute attention with XLA einsums
        def _xla_recompute(q, k, v, o, lse, g, block_q, block_k=None):
            _, vjp = jax.vjp(A.xla_attention, q, k, v)
            return vjp(g)

        A._flash_bwd_impl = _xla_recompute

    try:
        # concat conditioning: in_channels 3 + 3-channel cloudy cond
        cfg = unet_clouds(IMAGE, in_channels=6, out_channels=3, dtype=jnp.bfloat16)
        model = UNet(cfg)
        diffusion = GaussianDiffusion.create(
            timesteps=1000, image_size=IMAGE, in_channels=3
        )
        tx = optax.adamw(1e-4)

        x = jnp.zeros((batch, IMAGE, IMAGE, 3), jnp.float32)
        cond = jnp.zeros((batch, IMAGE, IMAGE, 3), jnp.float32)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), x[:1], jnp.zeros((1,), jnp.int32), cond=cond[:1]
        )
        state = TrainState.create(params, tx)
        apply_fn = (
            lambda p, xx, tt, cond=None, y=None, train=False, dropout_rng=None:
            model.apply(
                p, xx, tt, cond=cond, y=y, train=train,
                rngs=None if dropout_rng is None else {"dropout": dropout_rng},
            )
        )
        step_fn = make_train_step(
            diffusion, apply_fn, tx, ema_decay=0.995, ema_every=10, use_cond=True
        )
        jstep = jax.jit(step_fn, donate_argnums=(0,))
        b = {"image": x, "cond": cond}

        s, m = jstep(state, b, jax.random.PRNGKey(0))
        float(m["loss"])
        t0 = time.perf_counter()
        for i in range(REPS):
            s, m = jstep(s, b, jax.random.PRNGKey(i))
        float(m["loss"])
        dt = (time.perf_counter() - t0) / REPS
        fl = flops_of(step_fn, state, b, jax.random.PRNGKey(0))
        label = "xla-recompute-bwd" if xla_bwd else "pallas-flash-bwd"
        print(f"batch={batch:3d} {label}: {dt*1e3:7.1f} ms/step, "
              f"{batch/dt:6.1f} img/s, {fl/dt/1e12:6.1f} TF/s "
              f"({fl/dt/PEAK_BF16*100:4.1f}% MFU)")
    except Exception as e:  # noqa: BLE001 -- OOM reporting is the point
        label = "xla-recompute-bwd" if xla_bwd else "pallas-flash-bwd"
        msg = str(e).splitlines()[0][:160]
        print(f"batch={batch:3d} {label}: FAILED ({type(e).__name__}: {msg})")
    finally:
        A._flash_bwd_impl = orig


def main():
    print(f"devices: {jax.devices()}")
    for batch in (4, 8, 16):
        for xla_bwd in (True, False):
            run(batch, xla_bwd)


if __name__ == "__main__":
    main()
