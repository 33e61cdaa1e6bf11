"""Flash-attention BACKWARD block sweep at the DiT-B/8 shape (T=1024, d=64).

The forward's whole-T q-block auto-default (attention_from_qkv, +9% core)
tied the backward to the same block_q via the custom-vjp nondiff args —
but the backward kernel's VMEM economy differs (scores tile + dk/dv
accumulators resident, three D-wide matmuls per chunk), so its optimum
need not match. This probe times `_flash_bwd_impl` directly over
(block_q, block_k) at [8, 1024, 12, 64] with the standard tunnel-bias
correction, plus the joint fwd+bwd grad at the shipped defaults.

Run (chip must be free): PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_attn_bwd.py
"""

import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

B, T, H, D = 8, 1024, 12, 64
REPS = 50
# fwd+bwd of softmax(QK^T)V: fwd 4BT^2D, bwd ~2.5x fwd (dq/dk/dv + recomputed
# scores): standard 2.5 multiplier for flash backward FLOP accounting
BWD_FLOPS = 2.5 * 4 * B * H * T * T * D

_BIAS_MS = None


def bias(x):
    global _BIAS_MS
    if _BIAS_MS is None:
        ident = jax.jit(lambda x: jnp.float32(jnp.sum(x)))
        float(ident(x))
        t0 = time.time()
        for _ in range(5):
            float(ident(x))
        _BIAS_MS = (time.time() - t0) / 5 * 1e3
        print(f"(per-call tunnel bias: {_BIAS_MS:.1f} ms)")
    return _BIAS_MS


def chain_bwd(bq, bk, args):
    """Bias-corrected ms per backward application, REPS chained on device."""
    from eo_diffusion_tpu.ops.attention import _flash_bwd_impl

    q, k, v, o, lse, g = args

    def body(carry, _):
        dq, dk, dv = _flash_bwd_impl(q + carry * 1e-12, k, v, o, lse, g,
                                     bq, block_k=bk)
        return (jnp.sum(dq) + jnp.sum(dk) + jnp.sum(dv)).astype(q.dtype), None

    f = jax.jit(lambda z: jnp.float32(
        jax.lax.scan(body, z, None, length=REPS)[0]))
    z = jnp.zeros((), q.dtype)
    float(f(z))  # compile
    t0 = time.time()
    float(f(z))
    return ((time.time() - t0) * 1e3 - bias(q)) / REPS


def main():
    from eo_diffusion_tpu.ops.attention import (_flash_fwd_impl,
                                                attention_from_qkv)

    key = jax.random.PRNGKey(0)
    mk = lambda i: jax.random.normal(jax.random.fold_in(key, i),
                                     (B, T, H, D), jnp.bfloat16)
    q, k, v, g = mk(0), mk(1), mk(2), mk(3)
    bias(q)

    results = {}
    for bq in (1024, 512, 256, 128):
        # forward saves lse padded with ITS block_q; at T=1024 every bq
        # divides T so the layout is identical — reuse one fwd
        o, lse = jax.jit(lambda q, k, v: _flash_fwd_impl(
            q, k, v, bq, 2048, return_lse=True))(q, k, v)
        lse = lse  # [B*H, T, 128]
        for bk in (1024, 512, 256):
            try:
                ms = chain_bwd(bq, bk, (q, k, v, o, lse, g))
            except Exception as e:  # VMEM OOM etc.
                print(f"  bq={bq:5d} bk={bk:5d}  FAILED: {str(e)[:80]}")
                continue
            tf = BWD_FLOPS / (ms / 1e3) / 1e12
            results[(bq, bk)] = ms
            print(f"  bq={bq:5d} bk={bk:5d}  {ms:7.3f} ms  {tf:6.1f} TF/s")

    best = min(results, key=results.get)
    print(f"best: bq={best[0]} bk={best[1]}  {results[best]:.3f} ms "
          f"(shipped default: bq=fwd's 1024, bk=512 -> "
          f"{results.get((1024, 512), float('nan')):.3f} ms)")

    # end-to-end grad through the public entry at the shipped defaults
    qkv = jax.random.normal(key, (B, T, 3 * H * D), jnp.bfloat16)

    def loss(qkv):
        return jnp.sum(attention_from_qkv(qkv, H, new_order=True)
                       .astype(jnp.float32))

    gf = jax.grad(loss)

    def body(carry, _):
        d = gf(qkv + carry * 1e-12)
        return jnp.sum(d).astype(qkv.dtype)[None][0], None

    f = jax.jit(lambda z: jnp.float32(
        jax.lax.scan(body, z, None, length=REPS)[0]))
    z = jnp.zeros((), qkv.dtype)
    float(f(z))
    t0 = time.time()
    float(f(z))
    ms = ((time.time() - t0) * 1e3 - _BIAS_MS) / REPS
    print(f"grad(attention_from_qkv) shipped path: {ms:.3f} ms/fwd+bwd")


if __name__ == "__main__":
    main()
