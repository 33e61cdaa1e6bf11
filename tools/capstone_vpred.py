"""Zero-terminal-SNR capstone: measure the brightness-range fix, trained.

Lin et al. 2023 (arXiv:2305.08891) show that common schedules never reach
SNR=0, so models trained on them inherit x_T's (near-zero) mean and cannot
generate very bright/dark images. This capstone makes that a measured
number on this framework: train two identical UNets on a brightness-BIMODAL
synthetic dataset (per-image mean at ±BRIGHT) —

  A. the reference configuration: eps objective, cosine schedule,
     DDIM-50 uniform spacing (what /root/reference trains and samples)
  B. the fixed configuration: v objective + zero_terminal_snr schedule,
     DDIM-50 trailing spacing

plus the ablation A-trailing (flawed schedule, fixed spacing) — and compare
the per-image mean distribution of generations against the data: std of
means, mode coverage (fraction with |mean| above half the mode offset), and
KID. Expected: B's mean distribution matches the bimodal data; A compresses
toward mid-gray (the paper's Fig. 1 effect), with A-trailing in between.

Writes gallery/vpred64_*.png + gallery/vpred64_metrics.json.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/capstone_vpred.py \
           [--steps 4000] [--skip_train] [--smoke]
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
CKPT = os.path.join(ROOT, "logs", "capstone_vpred")
GALLERY = os.path.join(ROOT, "gallery")
BRIGHT = 0.65  # per-image mean offset of the two brightness modes


def make_data(n: int, size: int, seed: int = 0) -> np.ndarray:
    """Brightness-bimodal smooth-texture images in [-1, 1], mean ≈ ±BRIGHT."""
    rng = np.random.default_rng(seed)
    modes = rng.choice([-BRIGHT, BRIGHT], size=(n, 1, 1, 1))
    low = max(size // 8, 2)
    coarse = rng.normal(size=(n, low, low, 3)).astype(np.float32)
    idx = np.linspace(0, low - 1, size)
    i0 = np.floor(idx).astype(int)
    i1 = np.minimum(i0 + 1, low - 1)
    w = (idx - i0).astype(np.float32)
    rows = coarse[:, i0] * (1 - w[:, None, None]) + coarse[:, i1] * w[:, None, None]
    tex = (rows[:, :, i0] * (1 - w[None, :, None])
           + rows[:, :, i1] * w[None, :, None])
    tex -= tex.mean(axis=(1, 2, 3), keepdims=True)  # texture carries no mean
    return np.clip(modes + 0.25 * tex, -1.0, 1.0).astype(np.float32)


def mean_stats(x: np.ndarray) -> dict:
    m = x.mean(axis=(1, 2, 3))
    return {
        "mean_std": float(m.std()),
        "mean_min": float(m.min()),
        "mean_max": float(m.max()),
        # both modes reached? fraction of samples committed to each
        "frac_dark": float((m < -BRIGHT / 2).mean()),
        "frac_bright": float((m > BRIGHT / 2).mean()),
        "frac_midgray": float((np.abs(m) <= BRIGHT / 2).mean()),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU config to exercise the script end-to-end")
    args = ap.parse_args()

    import optax

    from eo_diffusion_tpu.data.device_cache import DeviceDataCache, gather_batch
    from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from eo_diffusion_tpu.models.unet import UNet, UNetConfig
    from eo_diffusion_tpu.train.checkpoint import restore_params, save_checkpoint
    from eo_diffusion_tpu.train.trainer import TrainState, make_train_step
    from eo_diffusion_tpu.utils import metrics as M
    from eo_diffusion_tpu.utils.images import save_image_grid

    if args.smoke:
        size, batch, chans, tsteps, ddim_s, n_eval, n_data = 8, 16, 32, 100, 5, 32, 256
        args.steps = min(args.steps, 30)
    else:
        size, batch, chans, tsteps, ddim_s, n_eval, n_data = 64, 128, 64, 1000, 50, 256, 2048

    os.makedirs(CKPT, exist_ok=True)
    imgs = make_data(n_data, size)
    data_stats = mean_stats(imgs)
    print("data:", json.dumps(data_stats), flush=True)

    cfg = UNetConfig(image_size=size, in_channels=3, model_channels=chans,
                     out_channels=3, num_res_blocks=1,
                     attention_resolutions=(4, 8) if not args.smoke else (),
                     channel_mult=(1, 2, 3, 4) if not args.smoke else (1, 2),
                     num_heads=4, dtype=jnp.bfloat16)
    model = UNet(cfg)
    x0 = jnp.zeros((1, size, size, 3), jnp.float32)
    params0 = jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                                  jnp.zeros((1,), jnp.int32))

    configs = {
        "eps": GaussianDiffusion.create(timesteps=tsteps, image_size=size,
                                        in_channels=3),
        "ztsnr_v": GaussianDiffusion.create(timesteps=tsteps, image_size=size,
                                            in_channels=3, objective="v",
                                            zero_terminal_snr=True),
    }

    cache = DeviceDataCache({"image": imgs})
    import functools

    trained = {}
    for name, diffusion in configs.items():
        ck = os.path.join(CKPT, name)
        if not args.skip_train:
            sched = optax.warmup_cosine_decay_schedule(
                0.0, 1e-3, min(500, args.steps // 4), args.steps, 1e-5)
            tx = optax.adamw(sched)
            # fresh param buffers per config: the donated train step consumes
            # the state's arrays, and params0 is reused by the next config
            state = TrainState.create(jax.tree.map(jnp.copy, params0), tx)
            apply_fn = (lambda p, xx, tt, cond=None, y=None, train=False,
                        dropout_rng=None: model.apply(p, xx, tt, cond=cond, y=y))
            step_fn = make_train_step(diffusion, apply_fn, tx,
                                      ema_decay=0.999, ema_every=10)

            @functools.partial(jax.jit, donate_argnums=(0,))
            def fused_step(state, tensors, rng, _step_fn=step_fn):
                d_rng, s_rng = jax.random.split(rng)
                mb = gather_batch(tensors, d_rng, batch)
                return _step_fn(state, mb, s_rng)

            rng = jax.random.PRNGKey(1)
            t0 = time.time()
            for i in range(args.steps):
                rng, srng = jax.random.split(rng)
                state, m = fused_step(state, cache.tensors, srng)
                if i == 0:
                    t0 = time.time()
                if (i + 1) % 1000 == 0:
                    print(f"[{name}] step {i+1}/{args.steps} "
                          f"loss={float(m['loss']):.4f} "
                          f"({(time.time()-t0)/i*1e3:.0f} ms/step)", flush=True)
            save_checkpoint(ck, jax.device_get(state), name="final")
        _, ema = restore_params(os.path.join(ck, "final"), params0)
        trained[name] = jax.tree.map(jnp.asarray, ema)

    extractor = M.tiny_feature_extractor()
    real_feats = np.asarray(extractor(jnp.asarray(imgs[:512])))

    runs = {
        # (tag, model, spacing): reference behavior / ablation / the fix
        "eps_uniform": ("eps", "uniform"),
        "eps_trailing": ("eps", "trailing"),
        "ztsnr_trailing": ("ztsnr_v", "trailing"),
    }
    results = {"data": data_stats, "bright": BRIGHT,
               "steps": args.steps, "ddim_steps": ddim_s}
    bs = min(64, n_eval)
    for tag, (name, spacing) in runs.items():
        diffusion, ema = configs[name], trained[name]

        def run(p, rng):
            fn = lambda x, t, c, y: model.apply(p, x, t, cond=c, y=y)
            return diffusion.ddim_sample(
                fn, rng, bs, num_steps=ddim_s, method=spacing,
                dtype=jnp.bfloat16).x.astype(jnp.float32)

        j = jax.jit(run)
        xs = [np.asarray(j(ema, jax.random.PRNGKey(200 + i)))
              for i in range(max(n_eval // bs, 1))]
        x = np.concatenate(xs)
        stats = mean_stats(x)
        feats = np.asarray(extractor(jnp.asarray(np.clip(x, -1, 1))))
        k, _ = M.kid(real_feats, feats)
        stats["kid"] = float(k)
        results[tag] = stats
        print(f"{tag}: {json.dumps(stats)}", flush=True)
        grid = np.clip((x[:16] + 1) / 2, 0, 1)
        save_image_grid(grid, os.path.join(GALLERY, f"vpred64_{tag}.png"),
                        nrow=4)

    out = os.path.join(GALLERY, "vpred64_metrics.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
