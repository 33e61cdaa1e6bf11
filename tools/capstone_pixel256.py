"""Pixel-space DiT-B/8 baseline on the hard 256px fixture — the
apples-to-apples comparison row for capstone_latent256 (VERDICT r4 item 2:
"expect >> pixel-space img/s at matched KID under the new extractor").

Same data (SyntheticEOHard-256, seed 0), same training budget (8000 steps),
same eval harness (the tiled extractor from capstone_latent256,
gallery/eval_extractor256.npz) — only the denoiser changes: DiT-B/8 on
pixels (1024 tokens/call) vs the latent stack's DiT-B/4 on the f4 grid
(256 tokens + decode). Appends a "pixel_baseline" block to
gallery/latent256_metrics.json.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/capstone_pixel256.py
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
CKPT = os.path.join(ROOT, "logs", "capstone_pixel256")
GALLERY = os.path.join(ROOT, "gallery")
METRICS = os.path.join(GALLERY, "latent256_metrics.json")

SIZE, N_DATA, BATCH, N_EVAL, BS, STEPS = 256, 2048, 16, 256, 32, 8000


def main():
    import optax

    from eo_diffusion_tpu.data.datasets import SyntheticEOHard
    from eo_diffusion_tpu.data.device_cache import DeviceDataCache, gather_batch
    from eo_diffusion_tpu.diffusion.flow import FlowMatching
    from eo_diffusion_tpu.models.dit import DiT, DiTConfig
    from eo_diffusion_tpu.models.feature_cnn import (FeatureCNNConfig,
                                                     load_params,
                                                     make_extractor)
    from eo_diffusion_tpu.train.checkpoint import restore_params, save_checkpoint
    from eo_diffusion_tpu.train.trainer import TrainState, make_train_step
    from eo_diffusion_tpu.utils import metrics as M

    ds = SyntheticEOHard(size=SIZE, length=N_DATA, data_range=(-1.0, 1.0),
                         seed=0)
    imgs = np.stack([ds[i]["image"] for i in range(N_DATA)])

    # tiled extractor (same as capstone_latent256.Ctx.extractor)
    params_e, meta = load_params(os.path.join(GALLERY,
                                              "eval_extractor256.npz"))
    fcfg = FeatureCNNConfig(
        in_channels=3, widths=tuple(int(w) for w in meta["widths"]),
        num_classes=int(meta["num_classes"]))
    tile = int(meta["tile"])
    base = make_extractor(params_e, fcfg, batch=256)

    def extract(x):
        x = np.asarray(np.clip(x, -1, 1), np.float32)
        n, h, w, c = x.shape
        gh, gw = h // tile, w // tile
        tiles = (x.reshape(n, gh, tile, gw, tile, c)
                 .transpose(0, 1, 3, 2, 4, 5).reshape(-1, tile, tile, c))
        return base(tiles).reshape(n, gh * gw, -1).mean(axis=1)

    real = extract(imgs[:N_DATA // 2])

    cfg = DiTConfig(image_size=SIZE, in_channels=3, out_channels=3,
                    patch_size=8, hidden_size=768, depth=12, num_heads=12,
                    dtype=jnp.bfloat16)
    model = DiT(cfg)
    flow = FlowMatching.create(image_size=SIZE, in_channels=3)
    params0 = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)),
        jnp.zeros((1,), jnp.int32))
    print(f"pixel DiT-B/8: "
          f"{sum(p.size for p in jax.tree.leaves(params0))/1e6:.1f} M "
          f"params ({(SIZE//8)**2} tokens/call)", flush=True)

    if not os.path.exists(os.path.join(CKPT, "final")):
        sched = optax.warmup_cosine_decay_schedule(0.0, 1e-3, 500, STEPS,
                                                   1e-5)
        tx = optax.adamw(sched)
        state = TrainState.create(jax.tree.map(jnp.copy, params0), tx)
        step_fn = make_train_step(
            flow, lambda p, x, t, cond=None, y=None, train=False,
            dropout_rng=None: model.apply(p, x, t, cond=cond, y=y),
            tx, ema_decay=0.999, ema_every=10)
        cache = DeviceDataCache({"image": imgs})

        @functools.partial(jax.jit, donate_argnums=(0,))
        def jstep(state, tensors, rng):
            d_rng, s_rng = jax.random.split(rng)
            mb = gather_batch(tensors, d_rng, BATCH)
            return step_fn(state, mb, s_rng)

        rng = jax.random.PRNGKey(5)
        t0 = time.time()
        for i in range(STEPS):
            rng, srng = jax.random.split(rng)
            state, m = jstep(state, cache.tensors, srng)
            if i == 0:
                t0 = time.time()
            if (i + 1) % 1000 == 0:
                print(f"pixel dit {i+1}/{STEPS} "
                      f"loss={float(m['loss']):.4f} "
                      f"({(time.time()-t0)/max(i,1)*1e3:.0f} ms/step)",
                      flush=True)
        save_checkpoint(CKPT, jax.device_get(state), name="final")
    _, ema = restore_params(os.path.join(CKPT, "final"), params0)
    ema = jax.tree.map(jnp.asarray, ema)

    out = {}
    for method, n in (("euler", 4), ("heun", 8), ("heun", 16)):
        def run(p, r, _n=n, _m=method):
            return flow.sample(
                lambda x, t, c, y: model.apply(p, x, t, cond=c, y=y), r, BS,
                num_steps=_n, method=_m, dtype=jnp.bfloat16
            ).x.astype(jnp.float32)

        j = jax.jit(run)
        xs, t_draw = [], 0.0
        for i in range(N_EVAL // BS):
            t1 = time.time()
            x = j(ema, jax.random.PRNGKey(700 + i))
            _ = float(jnp.sum(x))
            if i > 0:
                t_draw += time.time() - t1
            xs.append(np.asarray(x))
        x = np.concatenate(xs)
        k, ks = M.kid(real, extract(x), subset_size=100)
        nb = N_EVAL // BS - 1
        out[f"{method}{n}"] = {"kid": float(k), "kid_std": float(ks),
                               "grad": float(np.mean(np.abs(np.diff(x, axis=1)))),
                               "img_s": nb * BS / t_draw if t_draw else None}
        print(f"pixel {method}{n}: kid={k:.4g} "
              f"{out[f'{method}{n}']['img_s'] or 0:.1f} img/s", flush=True)

    with open(METRICS) as f:
        results = json.load(f)
    results["pixel_baseline"] = {"steps": STEPS, **out}
    with open(METRICS, "w") as f:
        json.dump(results, f, indent=2)
    print(f"appended pixel_baseline to {METRICS}")


if __name__ == "__main__":
    main()
