"""Round-2 capstone: train the clouds-config UNet on synthetic EO tiles on
the real chip, then evaluate plain vs DeepCache sampling quality + speed and
the RePaint cloud-removal use-case end-to-end.

Produces gallery/capstone_r2_metrics.json and gallery PNGs. Mirrors the r1
capstone (PERF.md "End-to-end capstone") with the r2 additions under test:
cond-gated EMA, Pallas attention backward (inactive at 64px: T=256 uses the
XLA path), DeepCache sampling.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/capstone_r2.py \
           [--steps 6000] [--skip_train]
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
CKPT = os.path.join(ROOT, "logs", "capstone_r2")
GALLERY = os.path.join(ROOT, "gallery")
SIZE, BATCH = 64, 128
N_EVAL = 256  # samples for KID


def build():
    from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from eo_diffusion_tpu.models.unet import UNet, unet_clouds

    cfg = unet_clouds(SIZE, dtype=jnp.bfloat16)
    model = UNet(cfg)
    diffusion = GaussianDiffusion.create(timesteps=1000, image_size=SIZE, in_channels=3)
    return model, diffusion


def data_iter(batch_size, seed=0):
    from eo_diffusion_tpu.data.factories import create_synthetic_dataloaders

    train_loader, _ = create_synthetic_dataloaders(
        batch_size, image_size=SIZE, length=2048, data_range=(-1.0, 1.0),
        SEED=seed,
    )
    while True:
        for b in train_loader:
            yield b


def fast_train_batches(batch_size, n_images=2048, seed=0):
    """Pregenerate the synthetic set once (the per-step python generator is
    the bottleneck at 64px: 478 vs 206 ms/step device time), then serve
    random flip-augmented batches as pure numpy slicing."""
    from eo_diffusion_tpu.data.datasets import SyntheticEO

    ds = SyntheticEO(size=SIZE, length=n_images, data_range=(-1.0, 1.0), seed=seed)
    imgs = np.stack([ds[i]["image"] for i in range(n_images)])
    rng = np.random.default_rng(seed + 1)

    while True:
        idx = rng.integers(0, n_images, batch_size)
        x = imgs[idx]
        if rng.random() < 0.5:
            x = x[:, :, ::-1]
        if rng.random() < 0.5:
            x = x[:, ::-1]
        yield {"image": np.ascontiguousarray(x)}


def train(steps: int):
    import optax
    from eo_diffusion_tpu.train.checkpoint import save_checkpoint
    from eo_diffusion_tpu.train.trainer import TrainState, make_train_step

    model, diffusion = build()
    sched = optax.warmup_cosine_decay_schedule(0.0, 1e-3, 500, steps, 1e-5)
    tx = optax.adamw(sched)
    x0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32))
    state = TrainState.create(params, tx)
    apply_fn = (
        lambda p, xx, tt, cond=None, y=None, train=False, dropout_rng=None:
        model.apply(p, xx, tt, cond=cond, y=y, train=train,
                    rngs=None if dropout_rng is None else {"dropout": dropout_rng})
    )
    step_fn = make_train_step(diffusion, apply_fn, tx, ema_decay=0.999, ema_every=10)
    jstep = jax.jit(step_fn, donate_argnums=(0,))

    it = fast_train_batches(BATCH)
    rng = jax.random.PRNGKey(1)
    t0 = time.time()
    loss0 = loss = None
    for i in range(steps):
        batch = {"image": jnp.asarray(next(it)["image"])}
        rng, srng = jax.random.split(rng)
        state, m = jstep(state, batch, srng)
        if i == 0:
            loss0 = float(m["loss"])
        if (i + 1) % 500 == 0:
            loss = float(m["loss"])
            dt = (time.time() - t0) / (i + 1)
            print(f"step {i+1}/{steps} loss={loss:.4f} ({dt*1e3:.0f} ms/step)", flush=True)
    print(f"trained: loss {loss0:.4f} -> {loss:.4f}")
    save_checkpoint(CKPT, state, name="final")
    return state


def evaluate():
    from eo_diffusion_tpu.diffusion.deepcache import deepcache_model_fn
    from eo_diffusion_tpu.train.checkpoint import restore_params
    from eo_diffusion_tpu.utils import metrics as M
    from eo_diffusion_tpu.utils.images import save_image_grid

    model, diffusion = build()
    x0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32))
    params, ema_params = restore_params(os.path.join(CKPT, "final"), params)
    # params MUST thread through jit as explicit arguments: closing over the
    # restored tree embeds 350MB of weights as constants in the compile
    # payload (the remote-compile service rejects it with HTTP 413)
    params = jax.tree.map(jnp.asarray, params)

    # real features for KID
    extractor = M.tiny_feature_extractor()
    it = data_iter(64, seed=7)
    real_imgs = np.concatenate([np.asarray(next(it)["image"]) for _ in range(4)])
    real_feats = np.asarray(extractor(jnp.asarray(real_imgs)))

    results = {}

    def grad_mag(x):
        gx = np.abs(np.diff(x, axis=1)).mean()
        gy = np.abs(np.diff(x, axis=2)).mean()
        return float(gx + gy) / 2

    def eval_sampler(label, refresh_every=0):
        bs = 64

        def run(p, rng):
            if refresh_every > 1:
                fn, st0 = deepcache_model_fn(
                    model, p, jnp.zeros((bs, SIZE, SIZE, 3), jnp.bfloat16),
                    refresh_every=refresh_every,
                )
            else:
                fn = lambda x, t, c, y: model.apply(p, x, t, cond=c, y=y)
                st0 = None
            out = diffusion.ddim_sample(fn, rng, bs, num_steps=100,
                                        model_state=st0, dtype=jnp.bfloat16)
            return out.x.astype(jnp.float32)

        j = jax.jit(run)
        feats, imgs, t_first = [], [], None
        for i in range(N_EVAL // bs):
            t0 = time.time()
            x = np.asarray(j(params, jax.random.PRNGKey(100 + i)))
            dt = time.time() - t0
            if i == 1:
                t_first = dt  # post-compile timing
            imgs.append(x)
            feats.append(np.asarray(extractor(jnp.asarray(x))))
        fake = np.concatenate(feats)
        k, _ = M.kid(real_feats, fake)
        g = grad_mag(np.concatenate(imgs))
        results[label] = {"kid": k, "grad": g, "s_per_batch64": t_first}
        print(f"{label}: KID={k:.4f} grad={g:.4f} {t_first:.1f}s/64imgs", flush=True)
        grid = (np.concatenate(imgs)[:16] + 1.0) / 2.0
        save_image_grid(grid, os.path.join(GALLERY, f"capstone_r2_{label}.png"), nrow=4)

    eval_sampler("ddim100")
    for k in (2, 3):
        eval_sampler(f"ddim100_dc{k}", refresh_every=k)

    # RePaint cloud removal on held-out synthetic scenes (the thesis use-case)
    from eo_diffusion_tpu.data.factories import create_synthetic_dataloaders
    from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
    d_sum = GaussianDiffusion.create(timesteps=1000, image_size=SIZE, in_channels=3,
                                     cond_type="sum")
    _, test_loader = create_synthetic_dataloaders(16, image_size=SIZE,
                                                  data_range=(-1.0, 1.0), SEED=11)
    batch = next(iter(test_loader))
    img = jnp.asarray(batch["image"])
    mask_known = 1.0 - jnp.asarray(batch["segmentation"])  # known = non-cloud
    cond = jnp.concatenate([img, mask_known], axis=-1)

    def repaint(p, rng, c, refresh_every=0):
        if refresh_every > 1:
            fn, st0 = deepcache_model_fn(
                model, p, jnp.zeros((img.shape[0], SIZE, SIZE, 3), jnp.bfloat16),
                refresh_every=refresh_every,
            )
        else:
            fn = lambda x, t, cc, y: model.apply(p, x, t, cond=cc, y=y)
            st0 = None
        return d_sum.ddpm_sample(fn, rng, img.shape[0], cond=c,
                                 model_state=st0, dtype=jnp.bfloat16).x.astype(jnp.float32)

    import functools

    for label, k in (("repaint_ddpm1000", 0), ("repaint_ddpm1000_dc3", 3)):
        j = jax.jit(functools.partial(repaint, refresh_every=k))
        t0 = time.time()
        out = np.asarray(j(params, jax.random.PRNGKey(5), cond))
        s = float(M.ssim(jnp.asarray((out + 1) / 2), (img + 1) / 2))
        p_ = float(M.psnr(jnp.asarray((out + 1) / 2), (img + 1) / 2))
        results[label] = {"ssim": s, "psnr": p_}
        print(f"{label}: SSIM={s:.4f} PSNR={p_:.2f} ({time.time()-t0:.0f}s incl compile)",
              flush=True)
        if label == "repaint_ddpm1000":
            save_image_grid((np.asarray(img[:8]) + 1) / 2,
                            os.path.join(GALLERY, "capstone_r2_repaint_gt.png"), nrow=4)
            save_image_grid((out[:8] + 1) / 2,
                            os.path.join(GALLERY, "capstone_r2_repaint_out.png"), nrow=4)

    with open(os.path.join(GALLERY, "capstone_r2_metrics.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--skip_train", action="store_true")
    cli = ap.parse_args()
    if not cli.skip_train:
        train(cli.steps)
    evaluate()
