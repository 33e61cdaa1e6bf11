"""Measure the VERDICT-r2 "head-packing" lever at the 256px headline shape.

Analysis first: cross-head lane packing does NOT work for either matmul --
QK^T contracts over D per head (packing two heads on the contraction dim sums
their scores; block-diagonal packing doubles the output passes and nets
exactly zero), and PV's probability operand differs per head. What CAN
remove the PV lane waste is a *transposed formulation*:

    shipped : acc[bq, D]  = p[bq, bk] @ v[bk, D]      N=D=48 padded to 128
                                                       -> 2.67x pass waste
    probe   : accT[D, bq] = v^T contracted with p^T    M=D=48 (sublane-
                                                       granular row stream,
                                                       multiple of 8 -> no pad)

computed with ZERO in-kernel transposes by producing the scores transposed
from the start (s_T = k q^T, softmax over sublanes) and writing the output
[B, H, D, T]; the XLA epilogue's existing [B,H,T,D]->[B,T,H,D] permute
becomes a [B,H,D,T]->[B,T,H,D] permute of the same cost class.

QK^T's contraction-dim waste at D=48 is intrinsic (measured here as the
floor both variants share).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_packed_pv.py
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
REPS = 50


def kern_transposed(q_ref, k_ref, v_ref, o_ref, *, block_k: int, scale: float):
    """Fully-transposed resident kernel: scores [bk, bq], softmax over
    sublanes, PV with D on the row-stream dim, output block [D, bq]."""
    q = q_ref[0, 0, 0] * scale  # [bq, D]
    t_pad = k_ref.shape[3]
    m = l = accT = None
    for j in range(t_pad // block_k):
        k = k_ref[0, 0, 0, j * block_k:(j + 1) * block_k] * scale  # [bk, D]
        v = v_ref[0, 0, 0, j * block_k:(j + 1) * block_k]          # [bk, D]
        sT = jax.lax.dot_general(
            k, q, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bk, bq]
        m_c = jnp.max(sT, axis=0, keepdims=True)  # [1, bq] sublane reduce
        if m is None:
            m_n = m_c
            pT = jnp.exp(sT - m_n)
            l = jnp.sum(pT, axis=0, keepdims=True)
            accT = jax.lax.dot_general(
                v, pT.astype(v.dtype), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [D, bq]
        else:
            m_n = jnp.maximum(m, m_c)
            alpha = jnp.exp(m - m_n)  # [1, bq]
            pT = jnp.exp(sT - m_n)
            l = l * alpha + jnp.sum(pT, axis=0, keepdims=True)
            accT = accT * alpha + jax.lax.dot_general(
                v, pT.astype(v.dtype), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        m = m_n
    o_ref[0, 0] = (accT / l).astype(o_ref.dtype)  # [D, bq]


def transposed_attn(qkv5, block_q=BQ, block_k=BK):
    b, three, h, t, d = qkv5.shape
    out = pl.pallas_call(
        functools.partial(kern_transposed, block_k=block_k, scale=_scale(d)),
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


def t_chained(fn, x0, iters=3, reps=REPS):
    def chained(x):
        def body(i, c):
            o = fn(c)
            # fold output back into the q plane (keeps the chain honest);
            # o may be [B,H,T,D] or [B,H,D,T] -- normalize to [B,H,T,D]
            if o.shape[-1] != c.shape[-1]:
                o = o.transpose(0, 1, 3, 2)
            return c.at[:, 0].set(o.astype(c.dtype))
        return jnp.float32(jnp.sum(jax.lax.fori_loop(0, reps, body, x)))

    g = jax.jit(chained)
    float(g(x0))
    t0 = time.time()
    for _ in range(iters):
        float(g(x0))
    return (time.time() - t0) / iters / reps


def main():
    import numpy as np

    qkv5 = jax.random.normal(jax.random.PRNGKey(0), (B, 3, H, T, D), jnp.bfloat16)

    ref = jax.jit(_qkv5_ref_attention)(qkv5)  # [B,H,T,D]
    out_t = jax.jit(transposed_attn)(qkv5).transpose(0, 1, 3, 2)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - out_t.astype(jnp.float32))))
    print(f"transposed kernel max abs err vs XLA ref: {err:.5f}")
    assert err < 0.05, "numerics broken"

    useful = 4 * B * H * T * T * D / 1e12   # TF per call, no padding
    padded = 4 * B * H * T * T * 128 / 1e12

    dt = t_chained(lambda x: _qkv5_flash(x, BQ, BK), qkv5)
    print(f"shipped zero-copy : {dt*1e3:6.2f} ms  "
          f"{useful/dt:6.1f} useful-TF/s  {padded/dt:6.1f} padded-TF/s")

    dt_t = t_chained(transposed_attn, qkv5)
    print(f"transposed-PV     : {dt_t*1e3:6.2f} ms  "
          f"{useful/dt_t:6.1f} useful-TF/s")
    print(f"speedup: {dt/dt_t:.3f}x")


if __name__ == "__main__":
    main()
