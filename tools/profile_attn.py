"""Attention micro-benchmark on the real TPU chip (round-2 kernel work).

Times the ds=4 attention configuration of the 256px clouds UNet
(B=8, T=4096, H=8, D=48) across implementations, plus the full-forward
composition. Timing: on-device fori_loop chaining + scalar host fetch
(axon's block_until_ready does not block through the tunnel -- CLAUDE.md).
"""

import argparse
import functools
import json
import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def timeit(fn, *args, iters=20, warmup=2):
    f = jax.jit(fn)
    for _ in range(warmup):
        float(f(*args))
    t0 = time.time()
    for _ in range(iters):
        float(f(*args))
    return (time.time() - t0) / iters


def chain(fn, n):
    """Run fn n times back-to-back on device (per-call overhead amortized)."""

    def run(x):
        def body(i, c):
            return fn(c)
        return jax.lax.fori_loop(0, n, body, x)

    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--t", type=int, default=4096)
    ap.add_argument("--heads", type=int, default=8)
    ap.add_argument("--d", type=int, default=48)
    ap.add_argument("--reps", type=int, default=10, help="on-device chain length")
    args = ap.parse_args()

    from eo_diffusion_tpu.ops import attention as A

    b, t, h, d = args.b, args.t, args.heads, args.d
    c = h * d
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (b, t, h, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (b, t, h, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (b, t, h, d), jnp.bfloat16)

    # useful + padded-SoL flop accounting
    useful_tf = 4 * b * h * t * t * d / 1e12
    padded_tf = 4 * b * h * t * t * 128 / 1e12
    print(f"attn core: useful {useful_tf:.2f} TF, lane-padded {padded_tf:.2f} TF "
          f"(SoL @197TF/s: {padded_tf/197*1e3:.2f} ms)")

    def bench_attn(name, fn):
        g = chain(lambda x: fn(x, k, v).astype(jnp.bfloat16), args.reps)
        dt = timeit(lambda x: jnp.float32(jnp.sum(g(x))), q, iters=5) / args.reps
        print(f"{name:34s} {dt*1e3:8.2f} ms  {useful_tf/dt:7.1f} useful-TF/s  "
              f"{padded_tf/dt:7.1f} padded-TF/s")
        return dt

    bench_attn("xla_attention", A.xla_attention)
    bench_attn("flash single-pass (shipped)", lambda q_, k_, v_: A.flash_attention(q_, k_, v_))
    bench_attn("flash tiled bq512/bk512",
               lambda q_, k_, v_: A.flash_attention(q_, k_, v_, 512, 512))
    for bq in (256, 1024, 2048):
        bench_attn(f"flash single-pass bq{bq}",
                   functools.partial(lambda q_, k_, v_, bq=bq: A.flash_attention(q_, k_, v_, bq)))

    # full attention BLOCK cost (norm + qkv + core + proj), bf16
    import flax.linen as nn
    from eo_diffusion_tpu.models.unet import AttentionBlock

    x = jax.random.normal(rng, (b, 64, 64, c), jnp.bfloat16)
    for impl in ("xla", "pallas"):
        blk = AttentionBlock(num_heads=h, dtype=jnp.bfloat16, attn_impl=impl)
        params = jax.jit(blk.init)(jax.random.PRNGKey(0), x)
        g = chain(lambda xx: blk.apply(params, xx).astype(jnp.bfloat16), args.reps)
        dt = timeit(lambda xx: jnp.float32(jnp.sum(g(xx))), x, iters=5) / args.reps
        print(f"attention BLOCK [{impl:6s}]            {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
