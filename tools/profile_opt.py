"""Optimizer/EMA cost attribution (train-step MFU push, round 2).

The standalone-timed AdamW+EMA pass read ~38 ms/step at batch-independent
cost -- ~9x off the HBM roof for the ~3.5 GB it moves. Suspects:

* per-leaf kernel launches (the 88M-param UNet has ~400 leaves),
* the `jnp.where`-gated EMA paying full read/write bandwidth on every step,
* per-call dispatch overhead of the axon tunnel polluting the standalone
  measurement itself.

All variants here chain REPS iterations inside ONE jitted ``lax.fori_loop``
(on-device chaining, PERF.md methodology), so tunnel overhead is amortized
to noise.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/profile_opt.py
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

REPS = 50


def params_tree():
    from eo_diffusion_tpu.models.unet import UNet, unet_clouds

    cfg = unet_clouds(64, dtype=jnp.bfloat16)
    model = UNet(cfg)
    x = jnp.zeros((1, 64, 64, 3), jnp.bfloat16)
    return jax.jit(model.init)(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32))


def time_loop(fn, *args, label=""):
    j = jax.jit(fn, donate_argnums=(0,))
    out = j(*args)
    leaf = jax.tree.leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)).ravel()[0])
    # donated input is gone; rebuild by running once more on the output
    t0 = time.perf_counter()
    out2 = j(out, *args[1:])
    leaf = jax.tree.leaves(out2)[0]
    float(jnp.sum(leaf.astype(jnp.float32)).ravel()[0])
    dt = (time.perf_counter() - t0) / REPS
    print(f"{label}: {dt*1e3:.2f} ms/step")
    return out2


def main():
    print(f"devices: {jax.devices()}")
    # keep the master copy on host: every variant donates its device inputs
    params_host = jax.device_get(params_tree())
    n_leaves = len(jax.tree.leaves(params_host))
    n_params = sum(x.size for x in jax.tree.leaves(params_host))
    print(f"params: {n_params/1e6:.1f}M in {n_leaves} leaves")

    def fresh():
        return jax.tree.map(jnp.asarray, params_host)

    tx = optax.adamw(1e-4)
    grads = jax.tree.map(lambda x: jnp.full_like(x, 1e-4), fresh())

    # 1) tree AdamW alone
    def loop_adamw(carry, grads):
        p, o = carry

        def body(i, c):
            p, o = c
            u, o = tx.update(grads, o, p)
            return (optax.apply_updates(p, u), o)

        return jax.lax.fori_loop(0, REPS, body, (p, o))

    p = fresh()
    time_loop(loop_adamw, (p, tx.init(p)), grads, label="tree AdamW")

    # 2) tree AdamW + where-gated EMA (current trainer path)
    from eo_diffusion_tpu.train.ema import ema_update_every

    def loop_adamw_ema_where(carry, grads):
        p, o, e = carry

        def body(i, c):
            p, o, e = c
            u, o = tx.update(grads, o, p)
            p = optax.apply_updates(p, u)
            e = ema_update_every(e, p, jnp.float32(0.995), i, 10)
            return (p, o, e)

        return jax.lax.fori_loop(0, REPS, body, (p, o, e))

    p = fresh()
    time_loop(loop_adamw_ema_where, (p, tx.init(p), fresh()), grads,
              label="tree AdamW + where-EMA")

    # 3) tree AdamW + cond-gated EMA (skip the tree_map 9 of 10 steps)
    def loop_adamw_ema_cond(carry, grads):
        p, o, e = carry

        def body(i, c):
            p, o, e = c
            u, o = tx.update(grads, o, p)
            p = optax.apply_updates(p, u)
            e = jax.lax.cond(
                (i % 10) == 0,
                lambda pe: jax.tree.map(
                    lambda ee, pp: 0.995 * ee + 0.005 * pp, pe[1], pe[0]
                ),
                lambda pe: pe[1],
                (p, e),
            )
            return (p, o, e)

        return jax.lax.fori_loop(0, REPS, body, (p, o, e))

    p = fresh()
    time_loop(loop_adamw_ema_cond, (p, tx.init(p), fresh()), grads,
              label="tree AdamW + cond-EMA")

    # 4) flat-vector AdamW (single fused elementwise pass)
    flat, unravel = ravel_pytree(fresh())
    gflat, _ = ravel_pytree(grads)

    def loop_adamw_flat(carry, gflat):
        p, o = carry

        def body(i, c):
            p, o = c
            u, o = tx.update(gflat, o, p)
            return (p + u, o)

        return jax.lax.fori_loop(0, REPS, body, (p, o))

    time_loop(loop_adamw_flat, (flat + 0.0, tx.init(flat)), gflat, label="flat AdamW")

    # 5) flat AdamW + flat cond-EMA
    def loop_flat_full(carry, gflat):
        p, o, e = carry

        def body(i, c):
            p, o, e = c
            u, o = tx.update(gflat, o, p)
            p = p + u
            e = jax.lax.cond((i % 10) == 0,
                             lambda pe: 0.995 * pe[1] + 0.005 * pe[0],
                             lambda pe: pe[1], (p, e))
            return (p, o, e)

        return jax.lax.fori_loop(0, REPS, body, (p, o, e))

    time_loop(loop_flat_full, (flat, tx.init(flat), flat + 0.0), gflat,
              label="flat AdamW + cond-EMA")


if __name__ == "__main__":
    main()
