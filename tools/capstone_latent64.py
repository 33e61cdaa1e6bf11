"""Latent-diffusion capstone: train the first stage + a latent UNet on
synthetic EO tiles on the real chip, sample in latent space, decode, and
score KID vs the training distribution (VERDICT r2 #1 "done" criterion:
gallery/latent64_*.png + metrics from a trained latent model).

Mirrors the reference capability (CompVis LatentDiffusion, ddpm.py:628-692)
on the framework's own stack: ae_trainer first stage -> LatentDiffusion over
a 16x16x4 grid (4x spatial reduction of 64px pixels) -> DDIM/DPM sampling
with pixel decode. Also measures the latent-space sampling speedup over the
64px pixel-space model (16x fewer diffusion pixels).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/capstone_latent64.py \
           [--ae_steps 3000] [--steps 6000] [--skip_train]
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
CKPT = os.path.join(ROOT, "logs", "capstone_latent64")
GALLERY = os.path.join(ROOT, "gallery")
SIZE, BATCH = 64, 128
LAT, ZC = 16, 4
N_EVAL = 256


def dataset_images(n_images=2048, seed=0):
    from eo_diffusion_tpu.data.datasets import SyntheticEO

    ds = SyntheticEO(size=SIZE, length=n_images, data_range=(-1.0, 1.0), seed=seed)
    return np.stack([ds[i]["image"] for i in range(n_images)])


def batches(imgs, batch_size, seed=1):
    rng = np.random.default_rng(seed)
    while True:
        idx = rng.integers(0, len(imgs), batch_size)
        x = imgs[idx]
        if rng.random() < 0.5:
            x = x[:, :, ::-1]
        if rng.random() < 0.5:
            x = x[:, ::-1]
        yield np.ascontiguousarray(x)


def build_latent(ae_model, ae_params, scale):
    from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from eo_diffusion_tpu.diffusion.latent import LatentDiffusion
    from eo_diffusion_tpu.train.ae_trainer import make_codec

    enc, dec = make_codec(ae_model, ae_params)
    inner = GaussianDiffusion.create(timesteps=1000, image_size=LAT, in_channels=ZC)
    return LatentDiffusion(inner, enc, dec, scale_factor=scale)


def build_unet():
    from eo_diffusion_tpu.models.unet import UNet, UNetConfig

    cfg = UNetConfig(image_size=LAT, in_channels=ZC, model_channels=128,
                     out_channels=ZC, num_res_blocks=2,
                     attention_resolutions=(2, 4), channel_mult=(1, 2, 3),
                     num_heads=4, dtype=jnp.bfloat16)
    return UNet(cfg)


def train_first_stage(imgs, steps):
    from eo_diffusion_tpu.models.autoencoder import AutoencoderConfig, ConvAutoencoder
    from eo_diffusion_tpu.train.ae_trainer import save_ae, train_autoencoder

    acfg = AutoencoderConfig(in_channels=3, latent_channels=ZC,
                             base_channels=64, num_down=2)
    ae_model = ConvAutoencoder(acfg)

    class _Cycler:
        def __iter__(self):
            return (next(self._it) for _ in iter(int, 1))

        def __init__(self, it):
            self._it = it

    it = batches(imgs, BATCH)
    t0 = time.time()
    ae_params, scale, _ = train_autoencoder(
        ae_model, _Cycler(it), jax.random.PRNGKey(0), steps=steps, lr=2e-3,
        log_every=max(steps // 6, 1),
    )
    rec = ae_model.apply(ae_params, jnp.asarray(imgs[:64]))
    rec_mse = float(jnp.mean((rec - imgs[:64]) ** 2))
    print(f"first stage: {steps} steps in {time.time()-t0:.0f}s, "
          f"recon MSE {rec_mse:.5f}, scale {scale:.4f}", flush=True)
    save_ae(os.path.join(CKPT, "ae"), acfg, jax.device_get(ae_params), scale)
    return ae_model, ae_params, scale, rec_mse


def train_latent_unet(imgs, ld, steps):
    import optax

    from eo_diffusion_tpu.train.checkpoint import save_checkpoint
    from eo_diffusion_tpu.train.trainer import TrainState, make_train_step

    model = build_unet()
    sched = optax.warmup_cosine_decay_schedule(0.0, 1e-3, 500, steps, 1e-5)
    tx = optax.adamw(sched)
    z0 = jnp.zeros((1, LAT, LAT, ZC), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), z0, jnp.zeros((1,), jnp.int32))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"latent UNet: {n_params/1e6:.1f} M params", flush=True)
    state = TrainState.create(params, tx)
    apply_fn = (
        lambda p, xx, tt, cond=None, y=None, train=False, dropout_rng=None:
        model.apply(p, xx, tt, cond=cond, y=y, train=train,
                    rngs=None if dropout_rng is None else {"dropout": dropout_rng})
    )
    step_fn = make_train_step(ld, apply_fn, tx, ema_decay=0.999, ema_every=10)
    jstep = jax.jit(step_fn, donate_argnums=(0,))

    it = batches(imgs, BATCH, seed=3)
    rng = jax.random.PRNGKey(1)
    t0 = time.time()
    loss0 = loss = None
    for i in range(steps):
        rng, srng = jax.random.split(rng)
        state, m = jstep(state, {"image": jnp.asarray(next(it))}, srng)
        if i == 0:
            loss0 = float(m["loss"])
        if (i + 1) % 1000 == 0:
            loss = float(m["loss"])
            print(f"step {i+1}/{steps} loss={loss:.4f} "
                  f"({(time.time()-t0)/(i+1)*1e3:.0f} ms/step)", flush=True)
    print(f"latent UNet trained: loss {loss0:.4f} -> {loss:.4f}")
    save_checkpoint(CKPT, jax.device_get(state), name="final")
    return loss0, loss


def evaluate(imgs, ld):
    from eo_diffusion_tpu.train.checkpoint import restore_params
    from eo_diffusion_tpu.utils import metrics as M
    from eo_diffusion_tpu.utils.images import save_image_grid

    model = build_unet()
    z0 = jnp.zeros((1, LAT, LAT, ZC), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), z0, jnp.zeros((1,), jnp.int32))
    params, ema_params = restore_params(os.path.join(CKPT, "final"), params)
    params = jax.tree.map(jnp.asarray, params)  # thread explicitly (HTTP 413)

    extractor = M.tiny_feature_extractor()
    real_feats = np.asarray(extractor(jnp.asarray(imgs[:256])))
    data_grad = float(np.mean(np.abs(np.diff(imgs[:256], axis=1))))

    results = {}

    def eval_sampler(label, sampler, steps):
        bs = 64

        def run(p, rng):
            fn = lambda z, t, c, y: model.apply(p, z, t, cond=c, y=y)
            if sampler == "ddim":
                out = ld.ddim_sample(fn, rng, bs, num_steps=steps, dtype=jnp.bfloat16)
            else:
                out = ld.dpm_sample(fn, rng, bs, num_steps=steps, dtype=jnp.bfloat16)
            return out.x.astype(jnp.float32)

        j = jax.jit(run)
        feats, ims, t_steady = [], [], None
        for i in range(N_EVAL // bs):
            t0 = time.time()
            x = np.asarray(j(params, jax.random.PRNGKey(100 + i)))
            if i == 1:
                t_steady = time.time() - t0
            ims.append(x)
            feats.append(np.asarray(extractor(jnp.asarray(np.clip(x, -1, 1)))))
        k, _ = M.kid(real_feats, np.concatenate(feats))
        g = float(np.mean(np.abs(np.diff(np.concatenate(ims), axis=1))))
        results[label] = {"kid": float(k), "grad": g, "s_per_batch64": t_steady}
        print(f"{label}: KID={k:.4f} grad={g:.4f} (data {data_grad:.4f}) "
              f"{t_steady:.2f}s/64imgs", flush=True)
        grid = np.clip((np.concatenate(ims)[:16] + 1.0) / 2.0, 0, 1)
        save_image_grid(grid, os.path.join(GALLERY, f"latent64_{label}.png"), nrow=4)

    eval_sampler("ddim50", "ddim", 50)
    eval_sampler("dpm20", "dpm", 20)

    # AE reconstruction panel: top row originals, bottom row round trips
    rec = np.asarray(ld.decode(ld.encode(jnp.asarray(imgs[:8]))))
    panel = np.clip((np.concatenate([imgs[:8], rec]) + 1) / 2, 0, 1)
    save_image_grid(panel, os.path.join(GALLERY, "latent64_reconstruction.png"), nrow=8)
    results["data_grad"] = data_grad

    with open(os.path.join(GALLERY, "latent64_metrics.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ae_steps", type=int, default=3000)
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--skip_train", action="store_true")
    args = ap.parse_args()

    os.makedirs(GALLERY, exist_ok=True)
    imgs = dataset_images()
    if args.skip_train:
        from eo_diffusion_tpu.train.ae_trainer import load_ae

        ae_model, ae_params, scale = load_ae(os.path.join(CKPT, "ae"))
        ae_params = jax.tree.map(jnp.asarray, ae_params)
    else:
        ae_model, ae_params, scale, _ = train_first_stage(imgs, args.ae_steps)
        ld = build_latent(ae_model, ae_params, scale)
        train_latent_unet(imgs, ld, args.steps)
    ld = build_latent(ae_model, ae_params, scale)
    evaluate(imgs, ld)


if __name__ == "__main__":
    main()
