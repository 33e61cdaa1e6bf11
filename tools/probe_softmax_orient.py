"""Decompose the fully-transposed attention kernel's regression: is the
sublane-orientation softmax the cost, and would a lane-softmax + in-kernel
p-transpose hybrid win?

Variants at the headline chunk shape (bq=512, bk=2048, grid sized like the
real kernel: 64 cells x 8 q-tiles x 2 chunks):

  A. lane softmax:    max/sum over axis=1 of s[512, 2048] f32 + exp
  B. sublane softmax: max/sum over axis=0 of sT[2048, 512] f32 + exp
  C. bf16 transpose:  p[512, 2048] -> [2048, 512]
  D. hybrid kernel:   normal QK + lane softmax + bf16 p-transpose +
                      transposed PV (full attention, numerics-checked)

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_softmax_orient.py
"""

from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from eo_diffusion_tpu.ops.attention import (  # noqa: E402
    _compiler_params,
    _qkv5_flash,
    _qkv5_ref_attention,
    _scale,
)

B, T, H, D = 8, 4096, 8, 48
BQ, BK = 512, 2048
BH, NQ, NK = B * H, T // BQ, T // BK
REPS = 50


def _time(g, *args, iters=3):
    float(g(*args))
    t0 = time.time()
    for _ in range(iters):
        float(g(*args))
    return (time.time() - t0) / iters / REPS


def _cellwise(body, a_shape, out_shape):
    return pl.pallas_call(
        body,
        grid=(BH, NQ),
        in_specs=[pl.BlockSpec((1,) + a_shape, lambda bi, iq: (bi, 0, 0))],
        out_specs=pl.BlockSpec((1,) + out_shape, lambda bi, iq: (bi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((BH,) + out_shape, jnp.float32),
        compiler_params=_compiler_params(two_d=True),
    )


def bench_reduce(name, axis, shape):
    def body(s_ref, o_ref):
        acc = None
        for _ in range(NK):
            s = s_ref[0]
            m = jnp.max(s, axis=axis, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=axis, keepdims=True)
            r = m + l
            acc = r if acc is None else acc + r
        o_ref[0] = acc

    out_shape = (shape[0], 1) if axis == 1 else (1, shape[1])
    f = _cellwise(body, shape, out_shape)
    a = jax.random.normal(jax.random.PRNGKey(0), (BH,) + shape, jnp.float32)

    def chained(a):
        def it(i, c):
            return f(a + 0.0 * jnp.sum(c))
        return jnp.float32(jnp.sum(jax.lax.fori_loop(0, REPS, it, f(a))))

    dt = _time(jax.jit(chained), a)
    print(f"{name:46s} {dt*1e3:7.3f} ms")
    return dt


def bench_transpose():
    def body(p_ref, o_ref):
        acc = None
        for _ in range(NK):
            pt = p_ref[0].T  # [bk, bq]
            acc = pt if acc is None else acc + pt
        o_ref[0] = acc.astype(jnp.float32)

    f = pl.pallas_call(
        body,
        grid=(BH, NQ),
        in_specs=[pl.BlockSpec((1, BQ, BK), lambda bi, iq: (bi, 0, 0))],
        out_specs=pl.BlockSpec((1, BK, BQ), lambda bi, iq: (bi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, BK, BQ), jnp.float32),
        compiler_params=_compiler_params(two_d=True),
    )
    a = jax.random.normal(jax.random.PRNGKey(0), (BH, BQ, BK), jnp.bfloat16)

    def chained(a):
        def it(i, c):
            return f(a + 0.0 * c[:, :1, :1].astype(a.dtype))
        return jnp.float32(jnp.sum(jax.lax.fori_loop(0, REPS, it, f(a))))

    dt = _time(jax.jit(chained), a)
    print(f"{'bf16 transpose p[512,2048]->[2048,512]':46s} {dt*1e3:7.3f} ms")
    return dt


def kern_hybrid(q_ref, k_ref, v_ref, o_ref, *, block_k: int, scale: float):
    """Normal QK + lane softmax (fast orientation) + bf16 p-transpose +
    transposed PV (M=48 row stream). Output [D, bq]."""
    q = q_ref[0, 0, 0] * scale
    t_pad = k_ref.shape[3]
    m = l = accT = None
    for j in range(t_pad // block_k):
        k = k_ref[0, 0, 0, j * block_k:(j + 1) * block_k] * scale
        v = v_ref[0, 0, 0, j * block_k:(j + 1) * block_k]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]
        m_c = jnp.max(s, axis=1, keepdims=True)  # lane reduce
        if m is None:
            m_n = m_c
            p = jnp.exp(s - m_n)
            l = jnp.sum(p, axis=1, keepdims=True)
            pT = p.astype(v.dtype).T  # [bk, bq]
            accT = jax.lax.dot_general(
                v, pT, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [D, bq]
        else:
            m_n = jnp.maximum(m, m_c)
            alpha = jnp.exp(m - m_n)
            p = jnp.exp(s - m_n)
            l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            pT = p.astype(v.dtype).T
            accT = accT * alpha.T + jax.lax.dot_general(
                v, pT, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        m = m_n
    o_ref[0, 0] = (accT / l.T).astype(o_ref.dtype)  # [D, bq]


def hybrid_attn(qkv5, block_q=BQ, block_k=BK):
    b, three, h, t, d = qkv5.shape
    out = pl.pallas_call(
        functools.partial(kern_hybrid, block_k=block_k, scale=_scale(d)),
        grid=(b, h, t // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, 1, block_q, d), lambda bi, hi, iq: (bi, 0, hi, iq, 0)),
            pl.BlockSpec((1, 1, 1, t, d), lambda bi, hi, iq: (bi, 1, hi, 0, 0)),
            pl.BlockSpec((1, 1, 1, t, d), lambda bi, hi, iq: (bi, 2, hi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, d, block_q), lambda bi, hi, iq: (bi, hi, 0, iq)),
        out_shape=jax.ShapeDtypeStruct((b, h, d, t), qkv5.dtype),
        compiler_params=_compiler_params(),
    )(qkv5, qkv5, qkv5)
    return out  # [B, H, D, T]


def t_chained(fn, x0, iters=3):
    def chained(x):
        def body(i, c):
            o = fn(c)
            if o.shape[-1] != c.shape[-1]:
                o = o.transpose(0, 1, 3, 2)
            return c.at[:, 0].set(o.astype(c.dtype))
        return jnp.float32(jnp.sum(jax.lax.fori_loop(0, REPS, body, x)))

    g = jax.jit(chained)
    return _time(g, x0)


def main():
    bench_reduce("lane softmax stats   s[512,2048] axis=1", 1, (BQ, BK))
    bench_reduce("sublane softmax stats sT[2048,512] axis=0", 0, (BK, BQ))
    bench_transpose()

    qkv5 = jax.random.normal(jax.random.PRNGKey(0), (B, 3, H, T, D), jnp.bfloat16)
    ref = jax.jit(_qkv5_ref_attention)(qkv5)
    out = jax.jit(hybrid_attn)(qkv5).transpose(0, 1, 3, 2)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - out.astype(jnp.float32))))
    print(f"hybrid kernel max abs err vs XLA ref: {err:.5f}")

    dt = t_chained(lambda x: _qkv5_flash(x, BQ, BK), qkv5)
    print(f"{'shipped zero-copy':46s} {dt*1e3:7.3f} ms")
    dt_h = t_chained(hybrid_attn, qkv5)
    print(f"{'hybrid (lane softmax + pT + transposed PV)':46s} {dt_h*1e3:7.3f} ms")
    print(f"speedup: {dt/dt_h:.3f}x")


if __name__ == "__main__":
    main()


def kern_hybrid2(q_ref, k_ref, v_ref, o_ref, *, block_k: int, scale: float):
    """Like kern_hybrid but contracts p's dim 1 directly (no explicit .T)."""
    q = q_ref[0, 0, 0] * scale
    t_pad = k_ref.shape[3]
    m = l = accT = None
    for j in range(t_pad // block_k):
        k = k_ref[0, 0, 0, j * block_k:(j + 1) * block_k] * scale
        v = v_ref[0, 0, 0, j * block_k:(j + 1) * block_k]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_c = jnp.max(s, axis=1, keepdims=True)
        if m is None:
            m_n = m_c
            p = jnp.exp(s - m_n)
            l = jnp.sum(p, axis=1, keepdims=True)
            accT = jax.lax.dot_general(
                v, p.astype(v.dtype), (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        else:
            m_n = jnp.maximum(m, m_c)
            alpha = jnp.exp(m - m_n)
            p = jnp.exp(s - m_n)
            l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            accT = accT * alpha.T + jax.lax.dot_general(
                v, p.astype(v.dtype), (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        m = m_n
    o_ref[0, 0] = (accT / l.T).astype(o_ref.dtype)


def hybrid2_attn(qkv5, block_q=BQ, block_k=BK):
    b, three, h, t, d = qkv5.shape
    return pl.pallas_call(
        functools.partial(kern_hybrid2, block_k=block_k, scale=_scale(d)),
        grid=(b, h, t // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, 1, block_q, d), lambda bi, hi, iq: (bi, 0, hi, iq, 0)),
            pl.BlockSpec((1, 1, 1, t, d), lambda bi, hi, iq: (bi, 1, hi, 0, 0)),
            pl.BlockSpec((1, 1, 1, t, d), lambda bi, hi, iq: (bi, 2, hi, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, d, block_q), lambda bi, hi, iq: (bi, hi, 0, iq)),
        out_shape=jax.ShapeDtypeStruct((b, h, d, t), qkv5.dtype),
        compiler_params=_compiler_params(),
    )(qkv5, qkv5, qkv5)


def extra():
    qkv5 = jax.random.normal(jax.random.PRNGKey(0), (B, 3, H, T, D), jnp.bfloat16)
    ref = jax.jit(_qkv5_ref_attention)(qkv5)
    out = jax.jit(hybrid2_attn)(qkv5).transpose(0, 1, 3, 2)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - out.astype(jnp.float32))))
    print(f"hybrid2 (no .T) err: {err:.5f}")
    dt = t_chained(hybrid2_attn, qkv5)
    print(f"{'hybrid2 (contract dim1, no .T)':46s} {dt*1e3:7.3f} ms")
    dt = t_chained(lambda x: hybrid_attn(x, block_k=1024), qkv5)
    print(f"{'hybrid bk=1024':46s} {dt*1e3:7.3f} ms")
    dt = t_chained(lambda x: hybrid_attn(x, block_k=4096), qkv5)
    print(f"{'hybrid bk=4096 (single chunk)':46s} {dt*1e3:7.3f} ms")


if __name__ == "__main__":
    import sys
    if "--extra" in sys.argv:
        extra()
