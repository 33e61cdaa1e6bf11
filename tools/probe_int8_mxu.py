"""Probe: does int8 MXU compute beat bf16 on this chip's hot shapes?

VERDICT r4 item 4 (W8A8): the v5e MXU advertises ~2x bf16 peak for
int8 x int8 -> int32. PERF.md's "exhausted levers" list excludes quantized
COMPUTE (utils/quantize.py is weight-only W8A16). Before building a model
path, measure the primitive: bf16 vs int8 `dot_general`/`conv_general_
dilated` at (a) peak-probing square GEMMs and (b) the clouds-UNet 256px
sampler's actual conv shapes, with and without the dynamic activation
quantization overhead a real W8A8 layer pays.

Methodology (CLAUDE.md): each timing chains >=20 dependent iterations in a
`lax.fori_loop` inside one jit, then one scalar host fetch; per-call
timings through the axon tunnel carry ~29 ms bias, the chained form does
not. Writes gallery/int8_mxu_probe.json.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_int8_mxu.py
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)

ITERS = 30
GALLERY = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "gallery")


def _time(fn, *args, iters=ITERS):
    """Chained-iteration timing: compile+warm the SAME n, then time it
    (a different static n would recompile inside the timed region)."""
    j = jax.jit(fn, static_argnames=("n",))
    out = j(*args, n=iters)  # compile + warm
    _ = float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.time()
    out = j(*args, n=iters)
    _ = float(jnp.sum(out.astype(jnp.float32)))
    return (time.time() - t0) / iters


def gemm_bf16(a, b, n):
    def body(i, x):
        # data-dependent chain (x feeds back) so iterations can't overlap
        y = jax.lax.dot_general(x, b, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (y * 1e-3).astype(jnp.bfloat16)[:, :a.shape[1]]

    return jax.lax.fori_loop(0, n, body, a)


def gemm_int8(a8, b8, n):
    def body(i, x):
        y = jax.lax.dot_general(x, b8, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        return (y & 0x7f).astype(jnp.int8)[:, :a8.shape[1]]

    return jax.lax.fori_loop(0, n, body, a8)


def gemm_w8a8_dynamic(a, b8, bscale, n):
    """The REAL W8A8 layer cost: bf16 activations quantized per-tensor on
    the fly, int8 MXU matmul, rescale back to bf16."""
    def body(i, x):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        sx = jnp.maximum(amax, 1e-12) / 127.0
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127,
                     127).astype(jnp.int8)
        y = jax.lax.dot_general(q, b8, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (sx * bscale)
        return (y * 1e-3).astype(jnp.bfloat16)[:, :a.shape[1]]

    return jax.lax.fori_loop(0, n, body, a)


def rect_bf16(a, b, n):
    """Rectangular GEMM chain: output feeds a cheap reduction back into the
    next iteration's input (keeps iterations dependent without shape games)."""
    def body(i, x):
        y = jax.lax.dot_general(x, b, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        fb = jnp.mean(y) * 1e-6
        return (a + fb.astype(a.dtype)).astype(jnp.bfloat16)

    return jax.lax.fori_loop(0, n, body, a)


def rect_w8a8_dynamic(a, b8, bscale, n):
    def body(i, x):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        sx = jnp.maximum(amax, 1e-12) / 127.0
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / sx), -127,
                     127).astype(jnp.int8)
        y = jax.lax.dot_general(q, b8, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.int32)
        fb = jnp.mean(y.astype(jnp.float32) * (sx * bscale)) * 1e-6
        return (a + fb.astype(a.dtype)).astype(jnp.bfloat16)

    return jax.lax.fori_loop(0, n, body, a)


def conv_bf16(x, w, n):
    def body(i, h):
        y = jax.lax.conv_general_dilated(
            h, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return (y * 1e-2).astype(jnp.bfloat16)[..., :x.shape[-1]]

    return jax.lax.fori_loop(0, n, body, x)


def conv_int8(x8, w8, n):
    def body(i, h):
        y = jax.lax.conv_general_dilated(
            h, w8, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return (y & 0x7f).astype(jnp.int8)[..., :x8.shape[-1]]

    return jax.lax.fori_loop(0, n, body, x8)


def conv_w8a8_dynamic(x, w8, wscale, n):
    def body(i, h):
        amax = jnp.max(jnp.abs(h.astype(jnp.float32)))
        sx = jnp.maximum(amax, 1e-12) / 127.0
        q = jnp.clip(jnp.round(h.astype(jnp.float32) / sx), -127,
                     127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            q, w8, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = y.astype(jnp.float32) * (sx * wscale)
        return (y * 1e-2).astype(jnp.bfloat16)[..., :x.shape[-1]]

    return jax.lax.fori_loop(0, n, body, x)


def main():
    rng = np.random.default_rng(0)
    results = {"iters": ITERS, "device": str(jax.devices()[0])}

    # --- square GEMM peaks ---------------------------------------------------
    for m in (2048, 4096):
        a = jnp.asarray(rng.normal(size=(m, m)), jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(m, m)), jnp.bfloat16)
        a8 = jnp.asarray(rng.integers(-127, 128, (m, m)), jnp.int8)
        b8 = jnp.asarray(rng.integers(-127, 128, (m, m)), jnp.int8)
        bs = jnp.asarray(rng.uniform(0.005, 0.02, (1, m)), jnp.float32)
        flops = 2 * m * m * m
        t_bf = _time(gemm_bf16, a, b)
        t_i8 = _time(gemm_int8, a8, b8)
        t_dyn = _time(gemm_w8a8_dynamic, a, b8, bs)
        results[f"gemm{m}"] = {
            "bf16_tf_s": flops / t_bf / 1e12,
            "int8_tops": flops / t_i8 / 1e12,
            "w8a8_dyn_tf_s": flops / t_dyn / 1e12,
            "int8_speedup": t_bf / t_i8,
            "w8a8_dyn_speedup": t_bf / t_dyn,
        }
        print(f"gemm{m}: {json.dumps(results[f'gemm{m}'], default=float)}",
              flush=True)

    # --- DiT-B's dominant GEMMs (batch 32 x 256 latent tokens = M 8192) ----
    for (m, k, n_out, tag) in ((8192, 768, 3072, "dit_mlp_up"),
                               (8192, 3072, 768, "dit_mlp_down"),
                               (8192, 768, 768, "dit_proj")):
        a = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
        b = jnp.asarray(rng.normal(size=(k, n_out)), jnp.bfloat16)
        a8 = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
        b8 = jnp.asarray(rng.integers(-127, 128, (k, n_out)), jnp.int8)
        bsc = jnp.asarray(rng.uniform(0.005, 0.02, (1, n_out)), jnp.float32)
        flops = 2 * m * k * n_out
        t_bf = _time(rect_bf16, a, b)
        t_dyn = _time(rect_w8a8_dynamic, a, b8, bsc)
        results[tag] = {
            "bf16_tf_s": flops / t_bf / 1e12,
            "w8a8_dyn_tf_s": flops / t_dyn / 1e12,
            "w8a8_dyn_speedup": t_bf / t_dyn,
        }
        print(f"{tag}: {json.dumps(results[tag], default=float)}", flush=True)

    # --- the 256px sampler's dominant conv shapes (clouds UNet, PERF.md) ----
    # (batch 8 as in the headline protocol; channels x resolution ladder)
    conv_shapes = [
        (8, 64, 64, 256, 256),   # ds=4 trunk conv
        (8, 32, 32, 384, 384),   # ds=8
        (8, 128, 128, 128, 128), # ds=2
    ]
    for (n_, h_, w_, cin, cout) in conv_shapes:
        x = jnp.asarray(rng.normal(size=(n_, h_, w_, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.02, jnp.bfloat16)
        x8 = jnp.asarray(rng.integers(-127, 128, (n_, h_, w_, cin)), jnp.int8)
        w8 = jnp.asarray(rng.integers(-127, 128, (3, 3, cin, cout)), jnp.int8)
        ws = jnp.asarray(rng.uniform(0.005, 0.02, (1, 1, 1, cout)), jnp.float32)
        flops = 2 * n_ * h_ * w_ * 9 * cin * cout
        tag = f"conv{h_}x{w_}x{cin}"
        try:
            t_bf = _time(conv_bf16, x, w)
            t_i8 = _time(conv_int8, x8, w8)
            t_dyn = _time(conv_w8a8_dynamic, x, w8, ws)
            results[tag] = {
                "bf16_tf_s": flops / t_bf / 1e12,
                "int8_tops": flops / t_i8 / 1e12,
                "w8a8_dyn_tf_s": flops / t_dyn / 1e12,
                "int8_speedup": t_bf / t_i8,
                "w8a8_dyn_speedup": t_bf / t_dyn,
            }
        except Exception as e:  # int8 conv may be unsupported on this path
            results[tag] = {"error": str(e)[:500]}
        print(f"{tag}: {json.dumps(results[tag], default=float)}", flush=True)

    out = os.path.join(GALLERY, "int8_mxu_probe.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2, default=float)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
