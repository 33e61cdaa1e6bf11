"""Sampler step-economy sweep on the round-2 capstone model.

KID (+ pixel-gradient sharpness) vs training data for DDPM-1000, DDIM-S,
DPM++(2M)-S, and DeepCache variants -- all through the f32-carry samplers.
Updates the r1 PERF.md table, whose numbers carried the bf16-carry bias.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/sampler_economy.py
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
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from capstone_r2 import CKPT, SIZE, build, data_iter  # noqa: E402

N_EVAL = 256
BS = 64


def main():
    from eo_diffusion_tpu.diffusion.dpm_solver import dpm_solver_sample
    from eo_diffusion_tpu.train.checkpoint import restore_params
    from eo_diffusion_tpu.utils import metrics as M

    model, diffusion = build()
    x0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32))
    params, _ = restore_params(os.path.join(CKPT, "final"), params)
    params = jax.tree.map(jnp.asarray, params)

    extractor = M.tiny_feature_extractor()
    it = data_iter(BS, seed=7)
    real = np.concatenate([np.asarray(next(it)["image"]) for _ in range(4)])
    real_feats = np.asarray(extractor(jnp.asarray(real)))
    data_grad = float(np.abs(np.diff(real, axis=1)).mean()
                      + np.abs(np.diff(real, axis=2)).mean()) / 2

    results = {"data_grad": data_grad}

    def evaluate(label, sample_fn):
        j = jax.jit(sample_fn)
        feats, imgs = [], []
        for i in range(N_EVAL // BS):
            x = np.asarray(j(params, jax.random.PRNGKey(100 + i)))
            imgs.append(x)
            feats.append(np.asarray(extractor(jnp.asarray(x))))
        k, _ = M.kid(real_feats, np.concatenate(feats))
        arr = np.concatenate(imgs)
        g = float(np.abs(np.diff(arr, axis=1)).mean()
                  + np.abs(np.diff(arr, axis=2)).mean()) / 2
        results[label] = {"kid": round(k, 4), "grad": round(g, 4)}
        print(f"{label}: KID={k:.4f} grad={g:.4f}", flush=True)

    def mf(p):
        return lambda x, t, c, y: model.apply(p, x, t, cond=c, y=y)

    evaluate("ddpm1000", lambda p, r: diffusion.ddpm_sample(
        mf(p), r, BS, dtype=jnp.bfloat16).x.astype(jnp.float32))
    for s in (25, 50, 100):
        evaluate(f"ddim{s}", lambda p, r, s=s: diffusion.ddim_sample(
            mf(p), r, BS, num_steps=s, dtype=jnp.bfloat16).x.astype(jnp.float32))
    for s in (10, 20, 30):
        evaluate(f"dpm{s}", lambda p, r, s=s: dpm_solver_sample(
            diffusion, mf(p), r, BS, num_steps=s,
            dtype=jnp.bfloat16).x.astype(jnp.float32))

    with open(os.path.join(os.path.dirname(CKPT), "..", "gallery",
                           "sampler_economy_r2.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
