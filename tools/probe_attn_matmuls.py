"""Isolated MXU microbenchmarks of the attention-core matmuls at the 256px
headline shape (T=4096, D=48, bq=512, bk=2048) -- decides where the D=48
lane-padding cost actually lands and whether any reformulation can beat it.

Each kernel runs ONE matmul shape per grid cell over a grid sized like the
real kernel's work (B*H=64 cells x nq=8 q-tiles x 2 k-chunks worth of
flops), so cell counts and VMEM residency match the production kernel.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_attn_matmuls.py
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

from eo_diffusion_tpu.ops.attention import _compiler_params  # noqa: E402

BH, NQ, NK = 64, 8, 2
BQ, BK, D = 512, 2048, 48
REPS = 50


def _bench(name, kernel, out_shape_last, a_shape, b_shape, flops):
    """Grid (BH, NQ): each cell runs the matmul NK times (static unroll)."""
    a = jax.random.normal(jax.random.PRNGKey(0), (BH,) + a_shape, jnp.bfloat16)
    b = jax.random.normal(jax.random.PRNGKey(1), (BH,) + b_shape, jnp.bfloat16)

    def body(a_ref, b_ref, o_ref):
        acc = None
        for _ in range(NK):
            r = kernel(a_ref[0], b_ref[0])
            acc = r if acc is None else acc + r
        o_ref[0] = acc.astype(o_ref.dtype)

    f = pl.pallas_call(
        body,
        grid=(BH, NQ),
        in_specs=[
            pl.BlockSpec((1,) + a_shape, lambda bi, iq: (bi,) + (0,) * len(a_shape)),
            pl.BlockSpec((1,) + b_shape, lambda bi, iq: (bi,) + (0,) * len(b_shape)),
        ],
        out_specs=pl.BlockSpec((1,) + out_shape_last,
                               lambda bi, iq: (bi,) + (0,) * len(out_shape_last)),
        out_shape=jax.ShapeDtypeStruct((BH,) + out_shape_last, jnp.float32),
        compiler_params=_compiler_params(two_d=True),
    )

    def chained(a, b):
        def it(i, c):
            o = f(a + 0.0 * c[:, :1, :1].astype(a.dtype), b)
            return o
        return jnp.float32(jnp.sum(jax.lax.fori_loop(0, REPS, it, f(a, b))))

    g = jax.jit(chained)
    float(g(a, b))
    t0 = time.time()
    for _ in range(3):
        float(g(a, b))
    dt = (time.time() - t0) / 3 / REPS
    total = flops * BH * NQ * NK / 1e12
    print(f"{name:42s} {dt*1e3:7.3f} ms  {total/dt:6.1f} TF/s")
    return dt


def main():
    mm = lambda contract: (lambda x, y: jax.lax.dot_general(
        x, y, (contract, ((), ())), preferred_element_type=jnp.float32))

    useful_qk = 2 * BQ * BK * D
    useful_pv = 2 * BQ * BK * D

    # QK^T as shipped: q[bq,D] x k[bk,D] contract D -> [bq,bk]
    _bench("QK^T  q[512,48] . k[2048,48]^T", mm((((1,), (1,)))),
           (BQ, BK), (BQ, D), (BK, D), useful_qk)
    # QK^T with D padded to 128 by hand (what full padding would cost)
    _bench("QK^T  D pre-padded to 128", mm((((1,), (1,)))),
           (BQ, BK), (BQ, 128), (BK, 128), 2 * BQ * BK * 128)
    # QK^T transposed output: k[bk,D] . q[bq,D]^T -> [bk,bq]
    _bench("QK^T  transposed out [2048,512]", mm((((1,), (1,)))),
           (BK, BQ), (BK, D), (BQ, D), useful_qk)

    # PV as shipped: p[bq,bk] . v[bk,D] -> [bq,D]  (N=48)
    _bench("PV    p[512,2048] . v[2048,48]", mm((((1,), (0,)))),
           (BQ, D), (BQ, BK), (BK, D), useful_pv)
    # PV with v pre-padded to D=128
    _bench("PV    v pre-padded to 128", mm((((1,), (0,)))),
           (BQ, 128), (BQ, BK), (BK, 128), 2 * BQ * BK * 128)
    # PV transposed: v[bk,D] contract p[bk,bq] (dim0) -> [D,bq]  (M=48)
    _bench("PV    transposed [48,512] out", mm((((0,), (0,)))),
           (D, BQ), (BK, D), (BK, BQ), useful_pv)
    # PV packed 2-head on N: p . v2[bk,96] -> [bq,96] (shared p, math-wrong
    # for real attention -- pure MXU cost probe of the 96-lane shape)
    _bench("PV    v[2048,96] (2-head lane pack)", mm((((1,), (0,)))),
           (BQ, 96), (BQ, BK), (BK, 96), 2 * BQ * BK * 96)


if __name__ == "__main__":
    main()
