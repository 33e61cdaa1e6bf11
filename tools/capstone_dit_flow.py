"""Trained capstones for the beyond-reference axes (round 3).

Trains, on the real chip and the synthetic EO dataset:

1. **DiT-S/4 @64px** (models/dit.py, DDPM process): same data/protocol as
   the round-2 UNet capstone, evaluated at DDIM-25/50.
2. **Rectified flow** (diffusion/flow.py) on the flow64 UNet: the
   few-step-sampling story, evaluated at Euler-8/16/32 and Heun-8/16.

Scores KID (offline tiny extractor) + mean pixel gradient vs the training
distribution, writes gallery/dit64_*.png, gallery/flow64_*.png and
gallery/dit_flow64_metrics.json.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/capstone_dit_flow.py \
           [--steps 6000] [--skip_train] [--only dit|flow]
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
CKPT = os.path.join(ROOT, "logs", "capstone_dit_flow")
GALLERY = os.path.join(ROOT, "gallery")
SIZE, BATCH, N_EVAL = 64, 128, 256


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


def build_dit():
    from eo_diffusion_tpu.models.dit import DiT, dit_s

    return DiT(dit_s(SIZE, dtype=jnp.bfloat16))


def build_flow_unet():
    from eo_diffusion_tpu.models.unet import UNet, UNetConfig

    cfg = UNetConfig(image_size=SIZE, in_channels=3, model_channels=64,
                     out_channels=3, num_res_blocks=1,
                     attention_resolutions=(4, 8), channel_mult=(1, 2, 3, 4),
                     num_heads=4, dtype=jnp.bfloat16)
    return UNet(cfg)


def train(tag, model, process, imgs, steps, warmup=500):
    import optax

    from eo_diffusion_tpu.train.checkpoint import save_checkpoint
    from eo_diffusion_tpu.train.trainer import TrainState, make_train_step

    sched = optax.warmup_cosine_decay_schedule(0.0, 1e-3,
                                               min(warmup, steps // 4 or 1),
                                               steps, 1e-5)
    tx = optax.adamw(sched)
    x0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                                 jnp.zeros((1,), jnp.int32))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"[{tag}] {n_params/1e6:.1f} M params", flush=True)
    state = TrainState.create(params, tx)
    apply_fn = (
        lambda p, xx, tt, cond=None, y=None, train=False, dropout_rng=None:
        model.apply(p, xx, tt, cond=cond, y=y))
    step_fn = make_train_step(process, apply_fn, tx, ema_decay=0.999, ema_every=10)
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
        if (i + 1) % 1000 == 0 or i == steps - 1:
            loss = float(m["loss"])
            if (i + 1) % 1000 == 0:
                print(f"[{tag}] step {i+1}/{steps} loss={loss:.4f} "
                      f"({(time.time()-t0)/(i+1)*1e3:.0f} ms/step)", flush=True)
    print(f"[{tag}] trained: loss {loss0:.4f} -> {loss:.4f}")
    save_checkpoint(CKPT, jax.device_get(state), name=tag)
    return {"loss_first": loss0, "loss_last": loss,
            "ms_per_step": (time.time() - t0) / steps * 1e3}


def load_ema(tag, model):
    from eo_diffusion_tpu.train.checkpoint import restore_params

    x0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                                 jnp.zeros((1,), jnp.int32))
    _, ema = restore_params(os.path.join(CKPT, tag), params)
    return jax.tree.map(jnp.asarray, ema)


def evaluate(tag, model, params, run_sampler, configs, real_feats, data_grad,
             results):
    from eo_diffusion_tpu.utils import metrics as M
    from eo_diffusion_tpu.utils.images import save_image_grid

    for label, kw in configs:
        bs = min(64, N_EVAL)
        j = jax.jit(lambda p, rng: run_sampler(model, p, rng, bs, **kw))
        feats, ims, t_steady = [], [], None
        for i in range(N_EVAL // bs):
            t0 = time.time()
            x = np.asarray(j(params, jax.random.PRNGKey(100 + i)), np.float32)
            if i == 1 or N_EVAL // bs == 1:
                t_steady = time.time() - t0
            ims.append(x)
            feats.append(np.asarray(
                M.tiny_feature_extractor()(jnp.asarray(np.clip(x, -1, 1)))))
        k, _ = M.kid(real_feats, np.concatenate(feats))
        g = float(np.mean(np.abs(np.diff(np.concatenate(ims), axis=1))))
        results[f"{tag}_{label}"] = {"kid": float(k), "grad": g,
                                     "s_per_batch64": t_steady}
        print(f"[{tag}] {label}: KID={k:.4f} grad={g:.4f} "
              f"(data {data_grad:.4f}) {t_steady:.2f}s/64imgs", flush=True)
        grid = np.clip((np.concatenate(ims)[:16] + 1.0) / 2.0, 0, 1)
        save_image_grid(grid, os.path.join(GALLERY, f"{tag}_{label}.png"), nrow=4)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--only", type=str, default=None, choices=["dit", "flow"])
    args = ap.parse_args()

    from eo_diffusion_tpu.diffusion.flow import FlowMatching
    from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from eo_diffusion_tpu.utils import metrics as M

    os.makedirs(CKPT, exist_ok=True)
    os.makedirs(GALLERY, exist_ok=True)
    imgs = dataset_images()
    extractor = M.tiny_feature_extractor()
    real_feats = np.asarray(extractor(jnp.asarray(imgs[:256])))
    data_grad = float(np.mean(np.abs(np.diff(imgs[:256], axis=1))))

    gd = GaussianDiffusion.create(timesteps=1000, image_size=SIZE, in_channels=3)
    fm = FlowMatching.create(image_size=SIZE, in_channels=3)
    results = {"data_grad": data_grad}

    if args.only in (None, "dit"):
        model = build_dit()
        if not args.skip_train:
            results["dit_train"] = train("dit64", model, gd, imgs, args.steps)
        params = load_ema("dit64", model)

        def run_ddim(model, p, rng, bs, steps):
            fn = lambda x, t, c, y: model.apply(p, x, t, cond=c, y=y)
            return gd.ddim_sample(fn, rng, bs, num_steps=steps,
                                  dtype=jnp.bfloat16).x.astype(jnp.float32)

        evaluate("dit64", model, params, run_ddim,
                 [("ddim25", {"steps": 25}), ("ddim50", {"steps": 50})],
                 real_feats, data_grad, results)

    if args.only in (None, "flow"):
        model = build_flow_unet()
        if not args.skip_train:
            results["flow_train"] = train("flow64", model, fm, imgs, args.steps)
        params = load_ema("flow64", model)

        def run_flow(model, p, rng, bs, steps, method):
            fn = lambda x, t, c, y: model.apply(p, x, t, cond=c, y=y)
            return fm.sample(fn, rng, bs, num_steps=steps, method=method,
                             dtype=jnp.bfloat16).x.astype(jnp.float32)

        evaluate("flow64", model, params, run_flow,
                 [("euler8", {"steps": 8, "method": "euler"}),
                  ("euler16", {"steps": 16, "method": "euler"}),
                  ("euler32", {"steps": 32, "method": "euler"}),
                  ("heun8", {"steps": 8, "method": "heun"}),
                  ("heun16", {"steps": 16, "method": "heun"})],
                 real_feats, data_grad, results)

    out = os.path.join(GALLERY, "dit_flow64_metrics.json")
    existing = {}
    if os.path.exists(out):
        with open(out) as f:
            existing = json.load(f)
    existing.update(results)
    with open(out, "w") as f:
        json.dump(existing, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
