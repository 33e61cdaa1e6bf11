"""W8A8 rider: measured throughput + quality of int8 compute on a trained
latent-DiT sampler (VERDICT r4 item 4 "BENCH rider + quality curve").

Loads the capstone_latent256 artifacts (f4 AE + DiT-B/4 flow on the 64px
latent grid) and runs the heun-8 / euler-2 samplers with and without
``nn.primitives.int8_dense_compute``: img/s through the tunnel-safe chained
protocol, KID under the 256px trained extractor, and the per-step program
delta. Writes gallery/w8a8_rider.json.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/rider_w8a8.py
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
CKPT = os.path.join(ROOT, "logs", "capstone_latent256")
GALLERY = os.path.join(ROOT, "gallery")


def main():
    from eo_diffusion_tpu.data.datasets import SyntheticEOHard
    from eo_diffusion_tpu.diffusion.flow import FlowMatching
    from eo_diffusion_tpu.models.dit import DiT, DiTConfig
    from eo_diffusion_tpu.models.feature_cnn import (FeatureCNNConfig,
                                                     load_params,
                                                     make_extractor)
    from eo_diffusion_tpu.nn.primitives import int8_dense_compute
    from eo_diffusion_tpu.train.ae_trainer import load_ae
    from eo_diffusion_tpu.train.checkpoint import restore_params
    from eo_diffusion_tpu.utils import metrics as M

    SIZE, LAT, ZC, BS, N_EVAL = 256, 64, 4, 32, 256
    ae_model, ae_params, scale = load_ae(os.path.join(CKPT, "ae"))
    ae_params = jax.tree.map(jnp.asarray, ae_params)
    dcfg = DiTConfig(image_size=LAT, in_channels=ZC, out_channels=ZC,
                     patch_size=4, hidden_size=768, depth=12, num_heads=12,
                     dtype=jnp.bfloat16)
    model = DiT(dcfg)
    flow = FlowMatching.create(image_size=LAT, in_channels=ZC)
    params0 = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, LAT, LAT, ZC)),
        jnp.zeros((1,), jnp.int32))
    _, ema = restore_params(os.path.join(CKPT, "final"), params0)
    ema = jax.tree.map(jnp.asarray, ema)

    eparams, emeta = load_params(os.path.join(GALLERY, "eval_extractor256.npz"))
    fcfg = FeatureCNNConfig(
        in_channels=3, widths=tuple(int(w) for w in emeta["widths"]),
        num_classes=int(emeta["num_classes"]))
    extract = make_extractor(eparams, fcfg, batch=64)

    ds = SyntheticEOHard(size=SIZE, length=1024, data_range=(-1.0, 1.0),
                         seed=0)
    imgs = np.stack([ds[i]["image"] for i in range(1024)])
    real = np.asarray(extract(jnp.asarray(imgs)))

    def run(p, ap, r, num_steps, method):
        z = flow.sample(
            lambda x, t, c, y: model.apply(p, x, t, cond=c, y=y), r, BS,
            num_steps=num_steps, method=method, dtype=jnp.bfloat16).x
        return ae_model.apply(ap, z / scale, method="decode").astype(jnp.float32)

    results = {}
    for method, n in (("heun", 8), ("euler", 2)):
        for int8c in (False, True):
            tag = f"{method}{n}_{'w8a8' if int8c else 'bf16'}"
            f = functools.partial(run, num_steps=n, method=method)
            if int8c:
                with int8_dense_compute():
                    j = jax.jit(f)
                    j.lower(ema, ae_params,
                            jax.random.PRNGKey(0)).compile()
            else:
                j = jax.jit(f)
            xs, t_draw = [], 0.0
            for i in range(N_EVAL // BS):
                t1 = time.time()
                x = j(ema, ae_params, jax.random.PRNGKey(900 + i))
                _ = float(jnp.sum(x))
                if i > 0:
                    t_draw += time.time() - t1
                xs.append(np.asarray(x))
            x = np.concatenate(xs)
            k, ks = M.kid(real, np.asarray(extract(
                jnp.asarray(np.clip(x, -1, 1)))), subset_size=100)
            nb = N_EVAL // BS - 1
            results[tag] = {"kid": float(k), "kid_std": float(ks),
                            "img_s": nb * BS / t_draw if t_draw else None}
            print(f"{tag}: kid={k:.4g} {results[tag]['img_s'] or 0:.1f} img/s",
                  flush=True)

    for method, n in (("heun", 8), ("euler", 2)):
        bf = results[f"{method}{n}_bf16"]
        q = results[f"{method}{n}_w8a8"]
        results[f"{method}{n}_speedup"] = (q["img_s"] or 0) / (bf["img_s"] or 1)
    out = os.path.join(GALLERY, "w8a8_rider.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
