"""Pallas 3x3 conv weight-grad prototype (VERDICT r2 #5).

tools/probe_conv_bwd.py measured XLA's weight-grad at ~81 TF/s on the
dominant 256px shapes vs the 169 TF/s matmul roof. Formulated as 9
tap-matmuls dW[ky,kx] = x_shift^T dy (contract batch*space), the MXU shape
is M=C, K=B*H*W, N=C -- fully efficient -- and a fused kernel reads x/dy
from HBM once for all 9 taps (XLA's lowering re-streams per tap).

Kernel: grid (B, H/rows) sequential; per cell, x arrives as 3 ky-shifted
row-blocks [rows, W+2, C] (pre-shifted in XLA -- 3 cheap HBM copies), dy as
[rows, W, C]; the 9 tap products accumulate in the f32 [9, C, C] output
block, which keeps the same block index every cell so it stays VMEM-resident
until the final flush (the dk/dv trick from the attention backward).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/prototype_wgrad_kernel.py
"""

from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from eo_diffusion_tpu.ops.attention import _compiler_params  # noqa: E402

B, H, W, C = 8, 256, 256, 128
ROWS = 8
REPS = 30


def _wgrad_kernel(x_ref, dy_ref, dw_ref, *, rows: int, w: int, c: int):
    bi = pl.program_id(0)
    ri = pl.program_id(1)

    @pl.when((bi == 0) & (ri == 0))
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    dy = dy_ref[0].reshape(rows * w, dy_ref.shape[-1])  # [rows*W, Cout]
    for ky in range(3):
        xk = x_ref[0, ky]  # [rows, W+2, C]
        for kx in range(3):
            x_tap = xk[:, kx:kx + w, :].reshape(rows * w, c)
            dw_ref[0, 3 * ky + kx] += jax.lax.dot_general(
                x_tap, dy, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [C, Cout]


def pallas_wgrad(x, dy, rows=ROWS):
    b, h, w, c = x.shape
    co = dy.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # 3 ky-shifted views stacked: [B, 3, H, W+2, C]
    xs = jnp.stack([xp[:, ky:ky + h] for ky in range(3)], axis=1)
    dw = pl.pallas_call(
        functools.partial(_wgrad_kernel, rows=rows, w=w, c=c),
        grid=(b, h // rows),
        in_specs=[
            pl.BlockSpec((1, 3, rows, w + 2, c), lambda bi, ri: (bi, 0, ri, 0, 0)),
            pl.BlockSpec((1, rows, w, co), lambda bi, ri: (bi, ri, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 9, c, co), lambda bi, ri: (0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, 9, c, co), jnp.float32),
        compiler_params=_compiler_params(two_d=True),
    )(xs, dy)
    return dw[0].reshape(3, 3, c, co)


def xla_wgrad(x, dy):
    def conv(x_, w_):
        return jax.lax.conv_general_dilated(
            x_, w_, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    w0 = jnp.zeros((3, 3, x.shape[-1], dy.shape[-1]), x.dtype)
    return jax.vjp(lambda w_: conv(x, w_), w0)[1](dy)[0]


def timed(f, *args):
    g = jax.jit(f)
    float(jnp.sum(g(*args)))
    def chained(*a):
        def body(i, c):
            o = g(a[0] + 0.0 * c[0, 0, 0, 0].astype(a[0].dtype), a[1])
            return o.astype(jnp.float32) if o.dtype != jnp.float32 else o
        return jnp.float32(jnp.sum(jax.lax.fori_loop(
            0, REPS, body, g(*a).astype(jnp.float32))))
    gg = jax.jit(chained)
    float(gg(*args))
    t0 = time.time()
    for _ in range(3):
        float(gg(*args))
    return (time.time() - t0) / 3 / REPS


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, H, W, C), jnp.bfloat16)
    dy = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, C), jnp.bfloat16)
    tf = 2 * B * H * W * 9 * C * C / 1e12

    ref = np.asarray(xla_wgrad(x, dy), np.float32)
    out = np.asarray(pallas_wgrad(x, dy))
    rel = np.max(np.abs(out - ref)) / max(np.max(np.abs(ref)), 1e-9)
    print(f"rel max err vs XLA wgrad: {rel:.5f}")

    dt_x = timed(xla_wgrad, x, dy)
    print(f"XLA    wgrad: {dt_x*1e3:6.2f} ms  {tf/dt_x:6.1f} TF/s")
    for rows in (4, 8):
        dt_p = timed(lambda a, b: pallas_wgrad(a, b, rows=rows), x, dy)
        print(f"pallas wgrad (rows={rows:2d}): {dt_p*1e3:6.2f} ms  "
              f"{tf/dt_p:6.1f} TF/s  ({dt_x/dt_p:.2f}x)")


if __name__ == "__main__":
    main()
