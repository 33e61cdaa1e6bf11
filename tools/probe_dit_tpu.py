"""DiT sampling/training throughput on the real chip (PERF.md evidence).

Measures the beyond-reference DiT family end-to-end on one v5e chip:
DiT-B/8 @256px DDIM-50 sampling (same protocol as bench.py: one jitted
scan, scalar-fetch sync) and one fwd+bwd train step, with self-grounded
TF/s (XLA cost analysis + analytic attention-core flops).

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_dit_tpu.py
"""

import json
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

IMAGE_SIZE = 256
BATCH = 8
DDIM_STEPS = 50
ITERS = 3
V5E_PEAK_TF = 197.0


def main():
    from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from eo_diffusion_tpu.models.dit import DiT, dit_b
    from eo_diffusion_tpu.utils.profiling import flops_of

    cfg = dit_b(IMAGE_SIZE, dtype=jnp.bfloat16)
    model = DiT(cfg)
    diffusion = GaussianDiffusion.create(timesteps=1000, image_size=IMAGE_SIZE,
                                         in_channels=3)
    x0 = jnp.zeros((1, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                                 jnp.zeros((1,), jnp.int32))
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"DiT-B/8 {n_params/1e6:.1f}M params, tokens={cfg.tokens}, "
          f"head_dim={cfg.hidden_size // cfg.num_heads}")

    def sample(params, rng):
        fn = lambda x, t, c, y: model.apply(params, x, t, cond=c, y=y)
        out = diffusion.ddim_sample(fn, rng, BATCH, num_steps=DDIM_STEPS,
                                    dtype=jnp.bfloat16)
        return jnp.float32(jnp.sum(out.x))

    f = jax.jit(sample)
    float(f(params, jax.random.PRNGKey(0)))  # compile
    t0 = time.time()
    for i in range(ITERS):
        float(f(params, jax.random.PRNGKey(i)))
    dt = (time.time() - t0) / ITERS
    img_s = BATCH / dt

    # self-grounded: cost-analysis flops of one forward + analytic
    # attention core (pallas reports 0): 4*T^2*D_model per block per sample
    xb = jnp.zeros((BATCH, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.bfloat16)
    tb = jnp.zeros((BATCH,), jnp.int32)
    attn_core = 4.0 * cfg.tokens**2 * cfg.hidden_size * cfg.depth * BATCH
    per_step_tf = (flops_of(lambda p, x, t: model.apply(p, x, t), params, xb, tb)
                   + attn_core) / 1e12
    tf_s = per_step_tf * DDIM_STEPS / dt

    # train step: loss + grad + adamw, micro-batch 16
    import optax
    tx = optax.adamw(1e-4)
    opt = jax.jit(tx.init)(params)
    TB = 16
    xt = jnp.zeros((TB, IMAGE_SIZE, IMAGE_SIZE, 3), jnp.float32)

    def train_step(params, opt, rng):
        def loss_fn(p):
            fn = lambda x, t, c, y: model.apply(p, x, t, cond=c, y=y)
            return diffusion.train_loss(fn, rng, xt)
        loss, g = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt, loss

    def chain(params, opt, rng, n=10):
        def body(i, carry):
            p, o, _ = carry
            p, o, l = train_step(p, o, jax.random.fold_in(rng, i))
            return (p, o, l)
        p, o, l = jax.lax.fori_loop(0, n, body, (params, opt, jnp.float32(0)))
        return p, o, l

    ch = jax.jit(chain, donate_argnums=(0, 1))
    params, opt, l = ch(params, opt, jax.random.PRNGKey(0))
    float(l)
    t0 = time.time()
    params, opt, l = ch(params, opt, jax.random.PRNGKey(1))
    float(l)
    step_ms = (time.time() - t0) / 10 * 1e3
    train_img_s = TB / (step_ms / 1e3)

    fwd_tf = per_step_tf / BATCH * TB  # same per-image cost basis
    train_tf_s = 3.0 * fwd_tf / (step_ms / 1e3)  # fwd+bwd ~ 3x fwd flops

    print(json.dumps({
        "sample_img_s": round(img_s, 3),
        "sample_tf_s": round(tf_s, 1),
        "sample_mfu": round(tf_s / V5E_PEAK_TF, 3),
        "train_step_ms_mb16": round(step_ms, 1),
        "train_img_s": round(train_img_s, 1),
        "train_tf_s_est": round(train_tf_s, 1),
        "train_mfu_est": round(train_tf_s / V5E_PEAK_TF, 3),
    }))


if __name__ == "__main__":
    main()
