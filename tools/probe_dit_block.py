"""DiT-B/8 block component breakdown on the chip (where does the 39% go?).

Times each piece of one DiT block at the 256px protocol shape
([8, 1024, 768] tokens) with on-device chaining and explicit tunnel-bias
correction (an empty chain measures the fixed ~29 ms/call dispatch+fetch
cost; CLAUDE.md timing rules), plus a block-size sweep of the attention
kernel at this shape.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_dit_block.py
"""

import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

B, T, D, H = 8, 1024, 768, 12
REPS = 100

_BIAS_MS = None  # per-call dispatch+fetch bias, measured once


def chain(fn, x, reps=REPS):
    """Bias-corrected per-application ms for reps sequential applications."""
    global _BIAS_MS

    def run(reps_):
        def body(carry, _):
            out = fn(carry)
            return carry + (1e-12 * jnp.sum(out)).astype(carry.dtype), None
        f = jax.jit(lambda x: jnp.float32(jnp.sum(
            jax.lax.scan(body, x, None, length=reps_)[0])))
        float(f(x))  # compile
        t0 = time.time()
        float(f(x))
        return (time.time() - t0) * 1e3

    if _BIAS_MS is None:
        ident = jax.jit(lambda x: jnp.float32(jnp.sum(x)))
        float(ident(x))
        t0 = time.time()
        for _ in range(5):
            float(ident(x))
        _BIAS_MS = (time.time() - t0) / 5 * 1e3
        print(f"(per-call tunnel bias: {_BIAS_MS:.1f} ms)")
    return (run(reps) - _BIAS_MS) / reps


def main():
    from eo_diffusion_tpu.models.dit import _modulated_ln
    from eo_diffusion_tpu.ops.attention import attention_from_qkv

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, T, D), jnp.bfloat16)
    w_qkv = (jax.random.normal(key, (D, 3 * D)) * 0.02).astype(jnp.bfloat16)
    w_o = (jax.random.normal(key, (D, D)) * 0.02).astype(jnp.bfloat16)
    w_m1 = (jax.random.normal(key, (D, 4 * D)) * 0.02).astype(jnp.bfloat16)
    w_m2 = (jax.random.normal(key, (4 * D, D)) * 0.02).astype(jnp.bfloat16)
    shift = jnp.zeros((B, D), jnp.float32)
    scale = jnp.zeros((B, D), jnp.float32)

    flops = {
        "qkv matmul [D,3D]": 2 * B * T * D * 3 * D,
        "proj matmul [D,D]": 2 * B * T * D * D,
        "mlp matmuls [D,4D]+[4D,D]": 2 * 2 * B * T * D * 4 * D,
        "modulated LN (f32 stats)": 0,
        "attention core (T=1024,d=64)": 4 * B * T * T * D,
    }
    results = {}
    results["qkv matmul [D,3D]"] = chain(lambda h: h @ w_qkv, x)
    results["proj matmul [D,D]"] = chain(lambda h: h @ w_o, x)
    results["mlp matmuls [D,4D]+[4D,D]"] = chain(
        lambda h: jax.nn.gelu(h @ w_m1) @ w_m2, x)
    results["modulated LN (f32 stats)"] = chain(
        lambda h: _modulated_ln(h, shift, scale), x)
    qkv = jax.random.normal(key, (B, T, 3 * D), jnp.bfloat16)
    results["attention core (T=1024,d=64)"] = chain(
        lambda q: attention_from_qkv(q, H, new_order=True), qkv)

    total = 0.0
    for k, ms in results.items():
        tf_s = flops[k] / (ms / 1e3) / 1e12 if flops[k] else 0.0
        print(f"{k:36s} {ms:7.3f} ms  {tf_s:6.1f} TF/s")
        total += ms
    print(f"{'sum (1 block)':36s} {total:7.3f} ms -> x12 blocks = "
          f"{total*12:.2f} ms/fwd")

    print("\nattention block-size sweep (bq, bk) at T=1024 d=64:")
    for bq, bk in [(256, 1024), (512, 512), (512, 1024), (1024, 1024),
                   (128, 1024), (256, 512)]:
        ms = chain(lambda q: attention_from_qkv(
            q, H, new_order=True, block_q=bq, block_k=bk), qkv)
        tf = flops["attention core (T=1024,d=64)"] / (ms / 1e3) / 1e12
        print(f"  bq={bq:5d} bk={bk:5d}  {ms:7.3f} ms  {tf:6.1f} TF/s")


if __name__ == "__main__":
    main()
