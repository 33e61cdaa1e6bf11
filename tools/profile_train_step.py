"""Train-step MFU profiling (VERDICT round-1 item #10).

Measures the clouds-config training step (loss + grad + AdamW + fused EMA,
reference train.py:107-123 equivalent) on the real chip across:

* batch 128 vs 256,
* forward-only vs full train step (isolates backward MFU),
* remat (``use_checkpoint=True``, flax ResBlock remat) on/off,
* optimizer-only cost (AdamW+EMA on precomputed grads).

Timing: chained steps with one scalar host fetch at the end (axon-safe; see
PERF.md methodology note -- per-call fetches carry ~29 ms tunnel bias).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_train_step.py
"""

from __future__ import annotations

import functools
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

PEAK_BF16 = 197e12  # v5e
IMAGE = 64
REPS = 20


def build(batch: int, use_checkpoint: bool):
    from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from eo_diffusion_tpu.models.unet import UNet, unet_clouds
    from eo_diffusion_tpu.train.trainer import TrainState, make_train_step

    import dataclasses

    cfg = unet_clouds(IMAGE, dtype=jnp.bfloat16)
    if use_checkpoint:
        cfg = dataclasses.replace(cfg, use_checkpoint=True)
    model = UNet(cfg)
    diffusion = GaussianDiffusion.create(timesteps=1000, image_size=IMAGE, in_channels=3)
    tx = optax.adamw(1e-4)

    x = jnp.zeros((batch, IMAGE, IMAGE, 3), jnp.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), x[:1], jnp.zeros((1,), jnp.int32)
    )
    state = TrainState.create(params, tx)

    apply_fn = (
        lambda p, xx, tt, cond=None, y=None, train=False, dropout_rng=None:
        model.apply(
            p, xx, tt, cond=cond, y=y, train=train,
            rngs=None if dropout_rng is None else {"dropout": dropout_rng},
        )
    )
    step_fn = make_train_step(diffusion, apply_fn, tx, ema_decay=0.995, ema_every=10)
    return model, diffusion, state, step_fn, x


def time_chain(fn, state, batch, reps=REPS):
    """fori-style chain: run `reps` dependent steps inside one dispatch window,
    then one scalar fetch."""
    rngs = [jax.random.PRNGKey(i) for i in range(reps)]
    # warmup / compile
    s, m = fn(state, batch, rngs[0])
    float(m["loss"])
    t0 = time.perf_counter()
    for r in rngs:
        s, m = fn(s, batch, r)
    float(m["loss"])  # one sync at the end
    dt = (time.perf_counter() - t0) / reps
    return dt


def main():
    print(f"devices: {jax.devices()}")
    from eo_diffusion_tpu.utils.profiling import flops_of

    results = []
    for batch in (128, 256):
        for remat in (False, True):
            model, diffusion, state, step_fn, x = build(batch, remat)
            jstep = jax.jit(step_fn, donate_argnums=(0,))
            batch_d = {"image": x}
            dt = time_chain(jstep, state, batch_d)
            fl = flops_of(step_fn, state, batch_d, jax.random.PRNGKey(0))
            tf = fl / dt / 1e12
            mfu = tf * 1e12 / PEAK_BF16
            row = dict(batch=batch, remat=remat, ms=dt * 1e3,
                       img_s=batch / dt, tf_s=tf, mfu=mfu)
            results.append(row)
            print(f"batch={batch} remat={remat}: {dt*1e3:.1f} ms/step, "
                  f"{batch/dt:.0f} img/s, {tf:.1f} TF/s ({mfu*100:.1f}% MFU)")
            del state, jstep

    # forward-only (loss, no grad) at batch 128 for backward attribution
    model, diffusion, state, step_fn, x = build(128, False)

    def fwd_only(params, batch, rng):
        model_fn = lambda xx, tt, c, yy: model.apply(params, xx, tt, cond=c, y=yy)
        return diffusion.train_loss(model_fn, rng, batch["image"])

    jf = jax.jit(fwd_only)
    rngs = [jax.random.PRNGKey(i) for i in range(REPS)]
    acc = jf(state.params, {"image": x}, rngs[0])
    float(acc)
    t0 = time.perf_counter()
    for r in rngs:
        acc = acc * 0 + jf(state.params, {"image": x}, r)
    float(acc)
    dt_f = (time.perf_counter() - t0) / REPS
    fl_f = flops_of(fwd_only, state.params, {"image": x}, jax.random.PRNGKey(0))
    print(f"forward-only batch=128: {dt_f*1e3:.1f} ms, "
          f"{fl_f/dt_f/1e12:.1f} TF/s ({fl_f/dt_f/PEAK_BF16*100:.1f}% MFU)")

    # optimizer-only: AdamW update + EMA on fixed grads
    grads = jax.tree.map(jnp.zeros_like, state.params)
    tx = optax.adamw(1e-4)

    def opt_only(state, grads):
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = jax.tree.map(lambda e, p: e * 0.995 + p * 0.005, state.ema_params, params)
        return state.replace(params=params, ema_params=ema,
                             opt_state=opt_state, step=state.step + 1)

    jo = jax.jit(opt_only, donate_argnums=(0,))
    s = jo(state, grads)
    float(s.step)
    t0 = time.perf_counter()
    for _ in range(REPS):
        s = jo(s, grads)
    float(s.step)
    dt_o = (time.perf_counter() - t0) / REPS
    print(f"optimizer+EMA only: {dt_o*1e3:.2f} ms")


if __name__ == "__main__":
    main()
