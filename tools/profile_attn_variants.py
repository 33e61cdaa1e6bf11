"""Kernel-variant experiments for the single-pass attention (scratch tool).

Variants of _single_kernel timed at the ds=4 clouds shape (B8 T4096 H8 D48):
  A: shipped (divide scores by l, then PV)
  B: defer-normalize (PV on unnormalized p, scale output by 1/l)
  C: no-exp probe (p = s; WRONG math, isolates exp cost)
  D: B + no-max probe (exp(s); WRONG for large scores, isolates max cost)
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


def kern_A(q_ref, k_ref, v_ref, o_ref):
    s = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o_ref[0] = jax.lax.dot((p / l).astype(v_ref.dtype), v_ref[0],
                           preferred_element_type=jnp.float32).astype(o_ref.dtype)


def kern_B(q_ref, k_ref, v_ref, o_ref):
    s = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    acc = jax.lax.dot(p.astype(v_ref.dtype), v_ref[0],
                      preferred_element_type=jnp.float32)
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def kern_C(q_ref, k_ref, v_ref, o_ref):
    s = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0] = jax.lax.dot(s.astype(v_ref.dtype), v_ref[0],
                           preferred_element_type=jnp.float32).astype(o_ref.dtype)


def kern_D(q_ref, k_ref, v_ref, o_ref):
    s = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = jnp.exp(s)
    l = jnp.sum(p, axis=1, keepdims=True)
    acc = jax.lax.dot(p.astype(v_ref.dtype), v_ref[0],
                      preferred_element_type=jnp.float32)
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def run(kernel, block_q=512):
    def f(q, k, v):
        b, t, h, d = q.shape
        s = jnp.asarray(_scale(d), q.dtype)
        fold = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, t, d)
        qf, kf, vf = fold(q * s), fold(k * s), fold(v)
        d_pad = 128
        qf = _pad_to(qf, d_pad, 2)
        kf = _pad_to(kf, d_pad, 2)
        vf = _pad_to(vf, d_pad, 2)
        nq = t // block_q
        out = pl.pallas_call(
            kernel,
            grid=(b * h, nq),
            in_specs=[
                pl.BlockSpec((1, block_q, d_pad), lambda bi, iq: (bi, iq, 0)),
                pl.BlockSpec((1, t, d_pad), lambda bi, iq: (bi, 0, 0)),
                pl.BlockSpec((1, t, d_pad), lambda bi, iq: (bi, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d_pad), lambda bi, iq: (bi, iq, 0)),
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
    for name, kern, bq in [("A shipped div-then-PV", kern_A, 512),
                           ("B defer-normalize", kern_B, 512),
                           ("B defer-normalize bq1024", kern_B, 1024),
                           ("C no-exp probe", kern_C, 512),
                           ("D no-max probe", kern_D, 512)]:
        try:
            dt = run(kern, bq)
            print(f"{name:28s} {dt*1e3:7.2f} ms  {padded_tf/dt:6.1f} padded-TF/s")
        except Exception as e:
            print(f"{name:28s} FAILED: {str(e)[:120]}")
