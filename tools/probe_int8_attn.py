"""W8A8 attention probe (VERDICT r4 next-round item 4).

The r4 int8 program stopped at Dense (trace-time ``int8_dense_compute``);
the builder's queue named "int8 QK^T/PV in the Pallas kernel" as the last
single-chip lever. Before building that into the product path, this probe
measures the two facts that decide it, on chip:

  1. **Amdahl share**: how much of one latent256 DiT-B/4 model call the
     attention CORE (QK^T + softmax + PV) actually is. At the latent grid
     the core is ~4*T^2*d*heads = 6.4 GFLOP/call vs ~1.4 TFLOP of
     projections/MLP — arithmetic says <1%; the probe measures it.
  2. **Local kernel speedup**: an int8 QK^T+PV Pallas kernel (per-tensor
     activation scales, f32 softmax, post-softmax p quantized at the exact
     127 scale) vs the bf16 XLA core and the bf16 Pallas resident kernel
     at the same [B*H, T, d] shapes.

Decision rule (recorded in gallery/int8_attn_probe.json): integrate only
if share x (1 - 1/speedup) clears ~2% end-to-end; otherwise the item
closes as a measured refutation (PERF.md), like head-packing in r2.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_int8_attn.py
"""

from __future__ import annotations

import functools
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "gallery", "int8_attn_probe.json")

# latent256 DiT-B/4 attention shapes: batch 32, 12 heads, 256 tokens, d 64
B, H, T, D = 32, 12, 256, 64
CHAIN = 50  # on-device chained iterations per timing (tunnel bias, CLAUDE.md)


def _time(fn, *args):
    """Median-of-3 of a CHAIN-times on-device loop, one scalar fetch."""

    @jax.jit
    def chained(*a):
        def body(i, x):
            return fn(*((x,) + a[1:])).astype(a[0].dtype)

        return jnp.sum(jax.lax.fori_loop(0, CHAIN, body, a[0]).astype(
            jnp.float32))

    float(chained(*args))  # compile
    ts = []
    for _ in range(3):
        t0 = time.time()
        float(chained(*args))
        ts.append((time.time() - t0) / CHAIN)
    return float(np.median(ts))


# ---------------------------------------------------------------------------
# cores
# ---------------------------------------------------------------------------


def core_xla_bf16(q, k, v):
    s = jnp.einsum("btd,bsd->bts", q, k,
                   preferred_element_type=jnp.float32) * (D ** -0.5)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bts,bsd->btd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def _int8_kernel(q_ref, k_ref, v_ref, o_ref):
    """Whole-[T,D]-resident int8 attention core for one (batch*head) cell.

    Per-tensor activation scales computed in-kernel (part of the honest
    cost): q/k/v symmetric int8; scores dequantized to f32 for the
    softmax; p requantized at the exact 127 scale (p in (0,1] after the
    online max subtraction) for the int8 PV matmul.
    """
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    sq = jnp.max(jnp.abs(q)) / 127.0 + 1e-12
    sk = jnp.max(jnp.abs(k)) / 127.0 + 1e-12
    sv = jnp.max(jnp.abs(v)) / 127.0 + 1e-12
    qi = jnp.round(q / sq).astype(jnp.int8)
    ki = jnp.round(k / sk).astype(jnp.int8)
    vi = jnp.round(v / sv).astype(jnp.int8)
    s = jax.lax.dot_general(qi, ki, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.int32)
    sf = s.astype(jnp.float32) * (sq * sk * (D ** -0.5))
    m = jnp.max(sf, axis=1, keepdims=True)
    p = jnp.exp(sf - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    pi = jnp.round(p * 127.0).astype(jnp.int8)
    acc = jax.lax.dot(pi, vi, preferred_element_type=jnp.int32)
    o = acc.astype(jnp.float32) * (sv / 127.0) / l
    o_ref[0] = o.astype(o_ref.dtype)


def core_int8_pallas(q, k, v):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh = q.shape[0]
    spec = pl.BlockSpec((1, T, D), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _int8_kernel,
        grid=(bh,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=os.environ.get("EO_PALLAS_INTERPRET", "0") == "1",
    )(q, k, v)


def main():
    results = {"shapes": {"B": B, "H": H, "T": T, "D": D}}
    rng = np.random.default_rng(0)
    qkv = [jnp.asarray(rng.normal(0, 1, (B * H, T, D)), jnp.bfloat16)
           for _ in range(3)]

    # -- numerics: int8 core vs f32 reference --------------------------------
    ref = np.asarray(core_xla_bf16(*[x.astype(jnp.float32) for x in qkv]))
    got = np.asarray(jax.jit(core_int8_pallas)(*qkv)).astype(np.float32)
    rel = float(np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9))
    results["int8_core_max_rel_err"] = rel
    print(f"int8 core max rel err vs f32: {rel:.4f}", flush=True)

    # -- core timings --------------------------------------------------------
    t_xla = _time(jax.jit(core_xla_bf16), *qkv)
    results["core_xla_bf16_ms"] = t_xla * 1e3
    print(f"core bf16 XLA:     {t_xla*1e3:.3f} ms", flush=True)

    from eo_diffusion_tpu.ops.attention import flash_attention

    def pallas_bf16(q, k, v):
        # kernel API is [B, T, H, D]
        qb = q.reshape(B, H, T, D).transpose(0, 2, 1, 3)
        kb = k.reshape(B, H, T, D).transpose(0, 2, 1, 3)
        vb = v.reshape(B, H, T, D).transpose(0, 2, 1, 3)
        o = flash_attention(qb, kb, vb, block_q=T, block_k=T)
        return o.transpose(0, 2, 1, 3).reshape(B * H, T, D)

    try:
        t_pal = _time(jax.jit(pallas_bf16), *qkv)
        results["core_pallas_bf16_ms"] = t_pal * 1e3
        print(f"core bf16 Pallas:  {t_pal*1e3:.3f} ms", flush=True)
    except Exception as e:  # pragma: no cover
        results["core_pallas_bf16_ms"] = None
        print(f"bf16 pallas failed: {e}", flush=True)

    try:
        t_i8 = _time(jax.jit(core_int8_pallas), *qkv)
        results["core_int8_pallas_ms"] = t_i8 * 1e3
        results["int8_core_speedup_vs_xla"] = t_xla / t_i8
        print(f"core int8 Pallas:  {t_i8*1e3:.3f} ms "
              f"({t_xla/t_i8:.2f}x vs XLA bf16)", flush=True)
    except Exception as e:  # pragma: no cover
        results["core_int8_pallas_ms"] = None
        print(f"int8 pallas failed: {e}", flush=True)

    # -- Amdahl: one latent DiT-B/4 model call -------------------------------
    from eo_diffusion_tpu.models.dit import DiT, DiTConfig

    cfg = DiTConfig(image_size=64, in_channels=4, out_channels=4,
                    patch_size=4, hidden_size=768, depth=12, num_heads=12,
                    dtype=jnp.bfloat16)
    model = DiT(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 64, 64, 4)),
                                 jnp.zeros((1,), jnp.int32))
    x0 = jnp.asarray(rng.normal(0, 1, (B, 64, 64, 4)), jnp.float32)
    tt = jnp.full((B,), 0.5, jnp.float32)

    def call(x, p):
        return model.apply(p, x, tt)

    t_call = _time(jax.jit(call), x0, params)
    results["dit_call_ms"] = t_call * 1e3
    core_per_call = t_xla * cfg.depth
    share = core_per_call / t_call
    results["attn_core_share"] = share
    sp = results.get("int8_core_speedup_vs_xla") or 1.0
    results["e2e_ceiling_pct"] = 100.0 * share * (1.0 - 1.0 / max(sp, 1e-6))
    print(f"DiT-B/4 call: {t_call*1e3:.2f} ms; attn core x{cfg.depth} = "
          f"{core_per_call*1e3:.3f} ms -> share {share*100:.2f}%; "
          f"e2e ceiling at measured int8 speedup: "
          f"{results['e2e_ceiling_pct']:.2f}%", flush=True)

    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
