"""Classifier-guidance capstone: trained, quantitative guidance evidence.

The mirror image of capstone_cfg.py: the denoiser is UNCONDITIONAL (never
sees a label), and all class signal comes from a separately trained
noisy-image EncoderUNet classifier whose input gradient steers sampling
(Dhariwal & Nichol 2021; the reference vendors EncoderUNetModel at
backbones/unet.py:845+ but never trains or wires it). On the
class-correlated synthetic fixture we train both nets, then sample at
classifier scales 0/2/8 with per-class targets and measure **class
accuracy** (nearest channel-mean prototype) and KID — guidance quality
becomes a measured curve: accuracy should rise from ~chance (scale 0,
the unconditional model cannot know the target) toward 1 with scale.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/capstone_clf.py \
           [--steps 5000] [--clf_steps 3000] [--skip_train]
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
CKPT = os.path.join(ROOT, "logs", "capstone_clf")
GALLERY = os.path.join(ROOT, "gallery")
SIZE, BATCH, N_CLASSES, N_DATA = 64, 128, 3, 1536


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--clf_steps", type=int, default=3000)
    ap.add_argument("--skip_train", action="store_true")
    args = ap.parse_args()

    import functools

    import optax

    from eo_diffusion_tpu.data.datasets import SyntheticEO
    from eo_diffusion_tpu.data.device_cache import (DeviceDataCache,
                                                    gather_batch)
    from eo_diffusion_tpu.diffusion.classifier_guidance import (
        classifier_guided,
    )
    from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from eo_diffusion_tpu.models.encoder_unet import (EncoderUNet,
                                                      EncoderUNetConfig)
    from eo_diffusion_tpu.models.unet import UNet, UNetConfig
    from eo_diffusion_tpu.train.checkpoint import (restore_params,
                                                   save_checkpoint)
    from eo_diffusion_tpu.train.trainer import (TrainState, make_train_step)
    from eo_diffusion_tpu.utils import metrics as M
    from eo_diffusion_tpu.utils.images import save_image_grid

    os.makedirs(CKPT, exist_ok=True)
    ds = SyntheticEO(size=SIZE, length=N_DATA, num_classes=N_CLASSES,
                     class_correlated=True, data_range=(-1.0, 1.0), seed=0)
    imgs = np.stack([ds[i]["image"] for i in range(N_DATA)])
    labels = np.asarray([ds[i]["class"] for i in range(N_DATA)], np.int32)
    protos = np.stack([imgs[labels == k].mean(axis=(0, 1, 2))
                       for k in range(N_CLASSES)])
    print("class prototypes (channel means):", protos.round(3).tolist())

    # unconditional denoiser: same torso as the CFG capstone, no label path
    cfg = UNetConfig(image_size=SIZE, in_channels=3, model_channels=64,
                     out_channels=3, num_res_blocks=1,
                     attention_resolutions=(4, 8), channel_mult=(1, 2, 3, 4),
                     num_heads=4, dtype=jnp.bfloat16)
    model = UNet(cfg)
    diffusion = GaussianDiffusion.create(timesteps=1000, image_size=SIZE,
                                         in_channels=3)
    x0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                                 jnp.zeros((1,), jnp.int32))

    clf = EncoderUNet(EncoderUNetConfig(
        image_size=SIZE, in_channels=3, model_channels=48,
        num_classes=N_CLASSES, num_res_blocks=1,
        attention_resolutions=(8,), channel_mult=(1, 2, 3),
        num_heads=4))
    clf_params = jax.jit(clf.init)(jax.random.PRNGKey(2), x0,
                                   jnp.zeros((1,), jnp.int32))

    cache = DeviceDataCache({"image": imgs, "label": labels})
    results = {"num_classes": N_CLASSES}

    if not args.skip_train:
        # 1) unconditional denoiser
        sched = optax.warmup_cosine_decay_schedule(
            0.0, 1e-3, min(500, max(args.steps // 10, 1)), args.steps, 1e-5)
        tx = optax.adamw(sched)
        state = TrainState.create(params, tx)
        apply_fn = (lambda p, xx, tt, cond=None, y=None, train=False,
                    dropout_rng=None: model.apply(p, xx, tt, cond=cond))
        step_fn = make_train_step(diffusion, apply_fn, tx, ema_decay=0.999,
                                  ema_every=10)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def fused_step(state, tensors, rng):
            d_rng, s_rng = jax.random.split(rng)
            batch = gather_batch(tensors, d_rng, BATCH)
            batch.pop("label", None)  # unconditional: labels never seen
            return step_fn(state, batch, s_rng)

        rng = jax.random.PRNGKey(1)
        t0 = time.time()
        for i in range(args.steps):
            rng, srng = jax.random.split(rng)
            state, m = fused_step(state, cache.tensors, srng)
            if i == 0:
                t0 = time.time()
            if (i + 1) % 1000 == 0:
                print(f"denoiser {i+1}/{args.steps} "
                      f"loss={float(m['loss']):.4f} "
                      f"({(time.time()-t0)/i*1e3:.0f} ms/step)", flush=True)
        save_checkpoint(CKPT, jax.device_get(state), name="final")

        # 2) noisy-image classifier across the whole timestep range
        csched = optax.warmup_cosine_decay_schedule(
            0.0, 3e-4, min(150, max(args.clf_steps // 10, 1)),
            args.clf_steps, 3e-6)
        ctx = optax.adamw(csched)
        copt = ctx.init(clf_params)
        T = diffusion.timesteps

        def clf_loss(p, x_t, y, t):
            logits = clf.apply(p, x_t, t)
            logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            nll = -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))
            acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
            return nll, acc

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def clf_step(p, opt, tensors, rng):
            d_rng, t_rng, n_rng = jax.random.split(rng, 3)
            batch = gather_batch(tensors, d_rng, BATCH)
            x, y = batch["image"], batch["label"].astype(jnp.int32)
            t = jax.random.randint(t_rng, (BATCH,), 0, T)
            eps = jax.random.normal(n_rng, x.shape, jnp.float32)
            x_t = diffusion.q_sample(x.astype(jnp.float32), t, eps)
            (l, a), g = jax.value_and_grad(clf_loss, has_aux=True)(
                p, x_t, y, t)
            up, opt = ctx.update(g, opt, p)
            return optax.apply_updates(p, up), opt, l, a

        rng = jax.random.PRNGKey(3)
        t0 = time.time()
        for i in range(args.clf_steps):
            rng, srng = jax.random.split(rng)
            clf_params, copt, l, a = clf_step(clf_params, copt,
                                              cache.tensors, srng)
            if i == 0:
                t0 = time.time()
            if (i + 1) % 1000 == 0:
                print(f"classifier {i+1}/{args.clf_steps} "
                      f"loss={float(l):.4f} acc={float(a):.3f} "
                      f"({(time.time()-t0)/i*1e3:.0f} ms/step)", flush=True)
        save_checkpoint(CKPT, jax.device_get(
            TrainState.create(clf_params, optax.identity())), name="clf")

    _, ema = restore_params(os.path.join(CKPT, "final"), params)
    ema = jax.tree.map(jnp.asarray, ema)
    clf_restored, _ = restore_params(os.path.join(CKPT, "clf"), clf_params)
    clf_params = jax.tree.map(jnp.asarray, clf_restored)
    clf_fn = lambda x, t: clf.apply(clf_params, x, t)

    extractor = M.tiny_feature_extractor()
    real_feats = np.asarray(extractor(jnp.asarray(imgs[:256])))

    bs = 48  # 16 per class target
    y_eval = jnp.asarray(np.repeat(np.arange(N_CLASSES), bs // N_CLASSES))

    for scale in (0.0, 2.0, 8.0):
        def run(p, cp, rng):
            fn = lambda x, t, c, y: model.apply(p, x, t, cond=c)
            if scale:
                cfn = lambda x, t: clf.apply(cp, x, t)
                fn = classifier_guided(diffusion, fn, cfn, y_eval,
                                       scale=scale)
            return diffusion.ddim_sample(
                fn, rng, bs, num_steps=50,
                dtype=jnp.bfloat16).x.astype(jnp.float32)

        j = jax.jit(run)
        xs = [np.asarray(j(ema, clf_params, jax.random.PRNGKey(100 + i)))
              for i in range(4)]
        x = np.concatenate(xs)
        yy = np.tile(np.asarray(y_eval), 4)
        sig = x.mean(axis=(1, 2))
        pred = np.argmin(
            np.linalg.norm(sig[:, None] - protos[None], axis=-1), axis=1)
        acc = float((pred == yy).mean())
        feats = np.asarray(extractor(jnp.asarray(np.clip(x, -1, 1))))
        k, _ = M.kid(real_feats, feats)
        results[f"scale_{scale:g}"] = {"class_acc": acc, "kid": float(k)}
        print(f"scale {scale:g}: class accuracy {acc:.3f}, KID {k:.4f}",
              flush=True)
        grid = np.clip((x[: N_CLASSES * 4] + 1) / 2, 0, 1)
        save_image_grid(grid, os.path.join(GALLERY,
                                           f"clf64_scale{scale:g}.png"),
                        nrow=4)

    out = os.path.join(GALLERY, "clf64_metrics.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
