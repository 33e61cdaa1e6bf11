"""Round 2 of attention kernel experiments: larger q-blocks via KV chunking.

Hypothesis from round 1 (profile_attn_variants.py): the 2 matmuls run at
~42% MXU because M=512 rows under-amortize weight-tile loads. Larger block_q
needs the f32 scores tile chunked over KV to stay within VMEM:
scores [bq, bk] f32 with (bq, bk) in {(1024,2048), (2048,1024), (1024,4096)}.
Unrolled python loop over KV chunks with an online-softmax carry.
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

from eo_diffusion_tpu.ops.attention import _compiler_params, _pad_to, _scale

B, T, H, D = 8, 4096, 8, 48
REPS = 10


def kern_chunked(q_ref, k_ref, v_ref, o_ref, *, bk: int):
    t = k_ref.shape[1]
    nk = t // bk
    q = q_ref[0]
    bq = q.shape[0]
    m = jnp.full((bq, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, q.shape[1]), jnp.float32)
    for j in range(nk):  # static unroll
        k = k_ref[0, j * bk:(j + 1) * bk]
        v = v_ref[0, j * bk:(j + 1) * bk]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot(p.astype(v.dtype), v,
                                        preferred_element_type=jnp.float32)
        m = m_new
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def run(bq, bk):
    def f(q, k, v):
        b, t, h, d = q.shape
        s = jnp.asarray(_scale(d), q.dtype)
        fold = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, t, d)
        qf, kf, vf = fold(q * s), fold(k * s), fold(v)
        d_pad = 128
        qf = _pad_to(qf, d_pad, 2)
        kf = _pad_to(kf, d_pad, 2)
        vf = _pad_to(vf, d_pad, 2)
        nq = t // bq
        out = pl.pallas_call(
            functools.partial(kern_chunked, bk=bk),
            grid=(b * h, nq),
            in_specs=[
                pl.BlockSpec((1, bq, d_pad), lambda bi, iq: (bi, iq, 0)),
                pl.BlockSpec((1, t, d_pad), lambda bi, iq: (bi, 0, 0)),
                pl.BlockSpec((1, t, d_pad), lambda bi, iq: (bi, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, bq, d_pad), lambda bi, iq: (bi, iq, 0)),
            out_shape=jax.ShapeDtypeStruct((b * h, t, d_pad), q.dtype),
            compiler_params=_compiler_params(two_d=True),
        )(qf, kf, vf)
        return out[:, :, :d].reshape(b, h, t, d).transpose(0, 2, 1, 3)

    def chained(x, k, v):
        def body(i, c):
            return f(c, k, v).astype(jnp.bfloat16)
        return jnp.float32(jnp.sum(jax.lax.fori_loop(0, REPS, body, x)))

    q = jax.random.normal(jax.random.PRNGKey(0), (B, T, H, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, T, H, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, T, H, D), jnp.bfloat16)
    g = jax.jit(chained)
    float(g(q, k, v))
    t0 = time.time()
    for _ in range(5):
        float(g(q, k, v))
    return (time.time() - t0) / 5 / REPS


if __name__ == "__main__":
    padded_tf = 4 * B * H * T * T * 128 / 1e12
    for bq, bk in [(512, 4096), (1024, 2048), (1024, 1024), (2048, 1024),
                   (2048, 512), (4096, 512), (4096, 256)]:
        try:
            dt = run(bq, bk)
            print(f"bq={bq:5d} bk={bk:5d}  {dt*1e3:7.2f} ms  {padded_tf/dt:6.1f} padded-TF/s")
        except Exception as e:
            print(f"bq={bq:5d} bk={bk:5d}  FAILED: {str(e)[:100]}")
