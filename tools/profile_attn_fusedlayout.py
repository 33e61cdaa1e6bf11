"""Prototype: attention kernel reading q/k/v straight from the fused
[B, T, 3, H, D] qkv tensor via BlockSpec index maps -- no transposes, no
lane-padding copies, output written back in [B, T, H, D] layout.

If Mosaic handles the D=48 lane dimension well this removes ~6 HBM copies
per attention block. Compared against the shipped path at the ds=4 clouds
shape (B8 T4096 H8 D48).
"""

import functools
import os
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from eo_diffusion_tpu.ops.attention import _compiler_params, _scale, flash_attention

B, T, H, D = 8, 4096, 8, 48
REPS = 50


def kern(q_ref, k_ref, v_ref, o_ref, *, block_k: int, scale: float):
    q = q_ref[0, 0, 0] * scale          # [block_q, D]
    m = l = acc = None
    t_pad = k_ref.shape[3]
    for j in range(t_pad // block_k):
        k = k_ref[0, 0, 0, j * block_k:(j + 1) * block_k] * scale
        v = v_ref[0, 0, 0, j * block_k:(j + 1) * block_k]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m_c = jnp.max(s, axis=1, keepdims=True)
        if m is None:
            m_n = m_c
            p = jnp.exp(s - m_n)
            l = jnp.sum(p, axis=1, keepdims=True)
            acc = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        else:
            m_n = jnp.maximum(m, m_c)
            alpha = jnp.exp(m - m_n)
            p = jnp.exp(s - m_n)
            l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc = acc * alpha + jax.lax.dot(p.astype(v.dtype), v,
                                            preferred_element_type=jnp.float32)
        m = m_n
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)


def fused_layout_attn(qkv, block_q=512, block_k=2048):
    # qkv arrives [B, T, 3, H, D]; lay it out [B, 3, H, T, D] so the block
    # trailing dims are (T, D) -- one transpose replaces the 6 fold/pad copies
    b, t, three, h, d = qkv.shape
    qkv5 = qkv.transpose(0, 2, 3, 1, 4)
    scale = _scale(d)
    nq = t // block_q
    out = pl.pallas_call(
        functools.partial(kern, block_k=block_k, scale=scale),
        grid=(b, h, nq),
        in_specs=[
            pl.BlockSpec((1, 1, 1, block_q, d), lambda bi, hi, iq: (bi, 0, hi, iq, 0)),
            pl.BlockSpec((1, 1, 1, t, d), lambda bi, hi, iq: (bi, 1, hi, 0, 0)),
            pl.BlockSpec((1, 1, 1, t, d), lambda bi, hi, iq: (bi, 2, hi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, iq: (bi, hi, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, t, d), qkv.dtype),
        compiler_params=_compiler_params(),
    )(qkv5, qkv5, qkv5)
    return out.transpose(0, 2, 1, 3)


def main():
    rng = jax.random.PRNGKey(0)
    qkv = jax.random.normal(rng, (B, T, 3, H, D), jnp.bfloat16)

    # correctness vs shipped
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    ref = jax.jit(flash_attention)(q, k, v)
    out = jax.jit(fused_layout_attn)(qkv)
    import numpy as np
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - out.astype(jnp.float32))))
    print(f"max abs diff vs shipped: {err:.5f}")

    def t_chained(fn, x0, iters=3):
        def chained(x):
            def body(i, c):
                o = fn(c)
                # fold the output back into the carry's q slot (keeps chain honest)
                return c.at[:, :, 0].set(o.astype(c.dtype))
            return jnp.float32(jnp.sum(jax.lax.fori_loop(0, REPS, body, x)))
        g = jax.jit(chained)
        float(g(x0))
        t0 = time.time()
        for _ in range(iters):
            float(g(x0))
        return (time.time() - t0) / iters / REPS

    padded = 4 * B * H * T * T * 128 / 1e12
    dt = t_chained(fused_layout_attn, qkv)
    print(f"fused-layout kernel: {dt*1e3:6.2f} ms  {padded/dt:6.1f} padded-TF/s")

    def shipped(qkv_):
        q, k, v = qkv_[:, :, 0], qkv_[:, :, 1], qkv_[:, :, 2]
        return flash_attention(q, k, v)

    def t_chained2(fn, x0, iters=3):
        def chained(x):
            def body(i, c):
                o = fn(c)
                return c.at[:, :, 0].set(o.astype(c.dtype))
            return jnp.float32(jnp.sum(jax.lax.fori_loop(0, REPS, body, x)))
        g = jax.jit(chained)
        float(g(x0))
        t0 = time.time()
        for _ in range(iters):
            float(g(x0))
        return (time.time() - t0) / iters / REPS

    dt = t_chained2(shipped, qkv)
    print(f"shipped (slice+fold): {dt*1e3:6.2f} ms  {padded/dt:6.1f} padded-TF/s")


if __name__ == "__main__":
    main()
