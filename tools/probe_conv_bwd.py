"""Where do the 256px backward-conv FLOPs go? (VERDICT r2 #5 groundwork)

PERF.md round-2 inferred "backward convs at ~101 TF/s implied" from the
aggregate step time. This probe measures forward, input-grad, and
weight-grad of a single 3x3 conv SEPARATELY at the clouds-UNet level shapes,
so the Pallas-kernel decision targets the actual slow op instead of an
aggregate inference.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_conv_bwd.py
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

B = 8
REPS = 30
SHAPES = [  # (H, Cin, Cout): clouds UNet levels at 256px
    (256, 128, 128),
    (128, 256, 256),
    (64, 384, 384),
    (32, 512, 512),
]


def conv(x, w):
    # plain bf16 conv, matching what flax Conv(dtype=bf16) emits in the UNet
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def timed(g, *args):
    float(g(*args))
    t0 = time.time()
    for _ in range(3):
        float(g(*args))
    return (time.time() - t0) / 3 / REPS


def chain(f, x, w, g):
    """Chain REPS calls of f(x, w, g) -> same-shape-as-first-output tensor."""
    def run(x, w, g):
        def body(i, c):
            o = f(x + 0.0 * jnp.sum(c), w, g)
            return o
        return jnp.float32(jnp.sum(jax.lax.fori_loop(0, REPS, body, f(x, w, g))))
    return timed(jax.jit(run), x, w, g)


def main():
    for hh, ci, co in SHAPES:
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (B, hh, hh, ci), jnp.bfloat16)
        w = jax.random.normal(key, (3, 3, ci, co), jnp.bfloat16)
        gy = jax.random.normal(key, (B, hh, hh, co), jnp.bfloat16)
        tf = 2 * B * hh * hh * 9 * ci * co / 1e12

        dt_f = chain(lambda x, w, g: conv(x, w), x, w, gy)

        def igrad(x, w, g):
            return jax.vjp(lambda x_: conv(x_, w), x)[1](g)[0]

        dt_i = chain(igrad, x, w, gy)

        def wgrad(x, w, g):
            return jax.vjp(lambda w_: conv(x, w_), w)[1](g)[0]

        # weight-grad output is [3,3,ci,co]; chain via x perturbation
        def run_w(x, w, g):
            def body(i, c):
                return wgrad(x + 0.0 * jnp.sum(c), w, g)
            return jnp.float32(jnp.sum(jax.lax.fori_loop(0, REPS, body, wgrad(x, w, g))))

        dt_w = timed(jax.jit(run_w), x, w, gy)

        print(f"[{hh}x{hh}x{ci}->{co}] {tf*1e3:6.1f} GF : "
              f"fwd {dt_f*1e3:6.2f} ms {tf/dt_f:6.1f} TF/s | "
              f"igrad {dt_i*1e3:6.2f} ms {tf/dt_i:6.1f} TF/s | "
              f"wgrad {dt_w*1e3:6.2f} ms {tf/dt_w:6.1f} TF/s")


if __name__ == "__main__":
    main()
