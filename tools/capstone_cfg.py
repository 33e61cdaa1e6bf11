"""Classifier-free-guidance capstone: trained, quantitative CFG evidence.

Trains a class-conditional UNet with CFG label dropout on the
class-correlated synthetic fixture (each class has a distinct per-channel
gain signature), then samples per class at guidance scales 1/2/4 and
measures **class accuracy** (nearest class prototype by channel-mean
signature) and KID. The expected CFG behavior — accuracy rising with scale
as samples commit harder to the conditioned class — becomes a measured
curve instead of a liveness test.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/capstone_cfg.py \
           [--steps 5000] [--skip_train]
"""

from __future__ import annotations

import argparse
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
CKPT = os.path.join(ROOT, "logs", "capstone_cfg")
GALLERY = os.path.join(ROOT, "gallery")
SIZE, BATCH, N_CLASSES, N_DATA = 64, 128, 3, 1536
DROPOUT = 0.15


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--skip_train", action="store_true")
    args = ap.parse_args()

    import optax

    from eo_diffusion_tpu.data.datasets import SyntheticEO
    from eo_diffusion_tpu.data.device_cache import DeviceDataCache, gather_batch
    from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from eo_diffusion_tpu.models.unet import UNet, UNetConfig
    from eo_diffusion_tpu.train.checkpoint import restore_params, save_checkpoint
    from eo_diffusion_tpu.train.trainer import TrainState, make_train_step
    from eo_diffusion_tpu.utils import metrics as M
    from eo_diffusion_tpu.utils.images import save_image_grid

    os.makedirs(CKPT, exist_ok=True)
    ds = SyntheticEO(size=SIZE, length=N_DATA, num_classes=N_CLASSES,
                     class_correlated=True, data_range=(-1.0, 1.0), seed=0)
    imgs = np.stack([ds[i]["image"] for i in range(N_DATA)])
    labels = np.asarray([ds[i]["class"] for i in range(N_DATA)], np.int32)
    # per-class channel-mean prototypes (the classification rule)
    protos = np.stack([imgs[labels == k].mean(axis=(0, 1, 2))
                       for k in range(N_CLASSES)])
    print("class prototypes (channel means):", protos.round(3).tolist())

    cfg = UNetConfig(image_size=SIZE, in_channels=3, model_channels=64,
                     out_channels=3, num_res_blocks=1,
                     attention_resolutions=(4, 8), channel_mult=(1, 2, 3, 4),
                     num_heads=4, num_classes=N_CLASSES,
                     class_dropout_prob=DROPOUT, dtype=jnp.bfloat16)
    model = UNet(cfg)
    diffusion = GaussianDiffusion.create(timesteps=1000, image_size=SIZE,
                                         in_channels=3)
    x0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                                 jnp.zeros((1,), jnp.int32),
                                 y=jnp.zeros((1,), jnp.int32))

    results = {"dropout": DROPOUT, "num_classes": N_CLASSES}
    if not args.skip_train:
        sched = optax.warmup_cosine_decay_schedule(0.0, 1e-3, 500,
                                                   args.steps, 1e-5)
        tx = optax.adamw(sched)
        state = TrainState.create(params, tx)
        apply_fn = (lambda p, xx, tt, cond=None, y=None, train=False,
                    dropout_rng=None: model.apply(p, xx, tt, cond=cond, y=y))
        step_fn = make_train_step(diffusion, apply_fn, tx, ema_decay=0.999,
                                  ema_every=10, class_conditional=True,
                                  class_dropout_prob=DROPOUT,
                                  num_classes=N_CLASSES)
        cache = DeviceDataCache({"image": imgs, "label": labels})

        import functools

        @functools.partial(jax.jit, donate_argnums=(0,))
        def fused_step(state, tensors, rng):
            d_rng, s_rng = jax.random.split(rng)
            batch = gather_batch(tensors, d_rng, BATCH)
            return step_fn(state, batch, s_rng)

        rng = jax.random.PRNGKey(1)
        t0 = time.time()
        for i in range(args.steps):
            rng, srng = jax.random.split(rng)
            state, m = fused_step(state, cache.tensors, srng)
            if i == 0:
                t0 = time.time()
            if (i + 1) % 1000 == 0:
                print(f"step {i+1}/{args.steps} loss={float(m['loss']):.4f} "
                      f"({(time.time()-t0)/i*1e3:.0f} ms/step)", flush=True)
        save_checkpoint(CKPT, jax.device_get(state), name="final")

    _, ema = restore_params(os.path.join(CKPT, "final"), params)
    ema = jax.tree.map(jnp.asarray, ema)

    extractor = M.tiny_feature_extractor()
    real_feats = np.asarray(extractor(jnp.asarray(imgs[:256])))

    bs = 48  # 16 per class
    y_eval = jnp.asarray(np.repeat(np.arange(N_CLASSES), bs // N_CLASSES))
    y_null = jnp.full((bs,), N_CLASSES, jnp.int32)

    for scale in (1.0, 2.0, 4.0):
        def run(p, rng):
            fn = lambda x, t, c, y: model.apply(p, x, t, cond=c, y=y)
            kw = {}
            if scale != 1.0:
                kw = dict(guidance_scale=scale, y_uncond=y_null)
            return diffusion.ddim_sample(
                fn, rng, bs, num_steps=50, y=y_eval, dtype=jnp.bfloat16,
                **kw).x.astype(jnp.float32)

        j = jax.jit(run)
        xs = [np.asarray(j(ema, jax.random.PRNGKey(100 + i)))
              for i in range(4)]
        x = np.concatenate(xs)  # [4*bs, H, W, 3]
        yy = np.tile(np.asarray(y_eval), 4)
        sig = x.mean(axis=(1, 2))  # [N, 3]
        pred = np.argmin(
            np.linalg.norm(sig[:, None] - protos[None], axis=-1), axis=1)
        acc = float((pred == yy).mean())
        feats = np.asarray(extractor(jnp.asarray(np.clip(x, -1, 1))))
        k, _ = M.kid(real_feats, feats)
        results[f"scale_{scale:g}"] = {"class_acc": acc, "kid": float(k)}
        print(f"scale {scale:g}: class accuracy {acc:.3f}, KID {k:.4f}",
              flush=True)
        grid = np.clip((x[: N_CLASSES * 4] + 1) / 2, 0, 1)
        save_image_grid(grid, os.path.join(GALLERY, f"cfg64_scale{scale:g}.png"),
                        nrow=4)

    out = os.path.join(GALLERY, "cfg64_metrics.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
