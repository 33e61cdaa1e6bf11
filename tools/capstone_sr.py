"""Super-resolution capstone: train an SR stage, score it, chain a cascade.

Shared synthetic-EO protocol (tools/capstone_dit_flow.py extractor/KID):

1. train a 64px DDPM base (the usual protocol model);
2. train a 2x SR stage at 128px conditioned on sr_cond(image, 2)
   (data/transforms.py — avg-pool degrade + nearest upsample);
3. score **SR reconstruction** on held-out images: SSIM/PSNR of
   SR(cond=up(down(gt))) vs gt, reported against the nearest-upsample
   baseline (on smooth synthetic data at 2x that baseline is strong —
   the honest comparison is the point, not a guaranteed win);
4. run the **cascade** (base DDIM samples -> upsample -> SR DDIM) and
   report 128px KID vs real 128px features, the upsample-only baseline
   KID, and the pooled-back self-consistency RMSE (cli/cascade.py metric).

Writes gallery/sr128_*.png + gallery/sr128_metrics.json.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/capstone_sr.py \\
           [--base_steps 6000] [--sr_steps_train 4000] [--smoke]
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
CKPT = os.path.join(ROOT, "logs", "capstone_sr")
GALLERY = os.path.join(ROOT, "gallery")
TAG = "sr128"  # sr128tex when --texture > 0

FACTOR = 2


def _train_sr(tag, model, diffusion, imgs, steps, batch, ckpt_dir):
    """Conditioned train loop: cond = sr_cond(image, FACTOR) per batch."""
    import optax

    from eo_diffusion_tpu.data.transforms import sr_cond
    from eo_diffusion_tpu.train.checkpoint import save_checkpoint
    from eo_diffusion_tpu.train.trainer import TrainState, make_train_step

    size = imgs.shape[1]
    sched = optax.warmup_cosine_decay_schedule(
        0.0, 1e-3, min(500, steps // 4 or 1), steps, 1e-5)
    tx = optax.adamw(sched)
    x0 = jnp.zeros((1, size, size, 3), jnp.float32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32),
        cond=jnp.zeros((1, size, size, 3)))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"[{tag}] {n_params/1e6:.1f} M params", flush=True)
    state = TrainState.create(params, tx)
    apply_fn = (
        lambda p, xx, tt, cond=None, y=None, train=False, dropout_rng=None:
        model.apply(p, xx, tt, cond=cond, y=y))
    step_fn = make_train_step(diffusion, apply_fn, tx, ema_decay=0.999,
                              ema_every=10, use_cond=True)
    jstep = jax.jit(step_fn, donate_argnums=(0,))

    rng_np = np.random.default_rng(3)
    rng = jax.random.PRNGKey(1)
    t0 = time.time()
    loss0 = loss = None
    for i in range(steps):
        idx = rng_np.integers(0, len(imgs), batch)
        x = imgs[idx]
        if rng_np.random() < 0.5:
            x = x[:, :, ::-1]
        if rng_np.random() < 0.5:
            x = x[:, ::-1]
        x = np.ascontiguousarray(x)
        b = {"image": jnp.asarray(x), "cond": jnp.asarray(sr_cond(x, FACTOR))}
        rng, srng = jax.random.split(rng)
        state, m = jstep(state, b, srng)
        if i == 0:
            loss0 = float(m["loss"])
        if (i + 1) % 1000 == 0 or i == steps - 1:
            loss = float(m["loss"])
            if (i + 1) % 1000 == 0:
                print(f"[{tag}] step {i+1}/{steps} loss={loss:.4f} "
                      f"({(time.time()-t0)/(i+1)*1e3:.0f} ms/step)",
                      flush=True)
    print(f"[{tag}] trained: loss {loss0:.4f} -> {loss:.4f}", flush=True)
    save_checkpoint(ckpt_dir, jax.device_get(state), name=tag)
    return {"loss_first": loss0, "loss_last": loss,
            "ms_per_step": (time.time() - t0) / steps * 1e3}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base_steps", type=int, default=6000)
    ap.add_argument("--sr_steps_train", type=int, default=4000)
    ap.add_argument("--sr_steps", type=int, default=25,
                    help="SR-stage DDIM steps at eval")
    ap.add_argument("--skip_base", action="store_true")
    ap.add_argument("--skip_sr", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--texture", type=float, default=0.0,
                    help="SyntheticEO contour-line strength (0 = the smooth "
                         "fixture where bicubic is near-optimal; ~0.8 adds "
                         "sharp LR-inferable edges — the fair SR test). "
                         "Artifacts are tagged sr128tex_*")
    args = ap.parse_args()

    import tools.capstone_dit_flow as C
    from eo_diffusion_tpu.data.datasets import SyntheticEO
    from eo_diffusion_tpu.data.transforms import sr_cond, sr_degrade
    from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from eo_diffusion_tpu.models.unet import UNet, UNetConfig
    from eo_diffusion_tpu.train.checkpoint import restore_params
    from eo_diffusion_tpu.utils import metrics as M
    from eo_diffusion_tpu.utils.images import save_image_grid

    if args.smoke:
        C.SIZE, C.BATCH, C.N_EVAL = 8, 16, 32
        args.base_steps = min(args.base_steps, 30)
        args.sr_steps_train = min(args.sr_steps_train, 30)
        args.sr_steps = min(args.sr_steps, 4)
    global TAG, CKPT
    if args.texture > 0:
        TAG = "sr128tex"
        CKPT = CKPT + "_tex"  # keep the smooth run's checkpoints intact
    C.CKPT = CKPT
    base_size = C.SIZE
    hi_size = base_size * FACTOR
    n_data = 256 if args.smoke else 2048
    sr_batch = max(C.BATCH // 2, 8)
    n_eval = C.N_EVAL
    timesteps = 100 if args.smoke else 1000
    os.makedirs(CKPT, exist_ok=True)
    os.makedirs(GALLERY, exist_ok=True)

    # hi-res protocol images; the base trains on their degraded view, so the
    # cascade's two stages model the SAME distribution at two grids
    ds = SyntheticEO(size=hi_size, length=n_data, data_range=(-1.0, 1.0),
                     seed=0, texture=args.texture)
    hi = np.stack([ds[i]["image"] for i in range(n_data)])
    lo = sr_degrade(hi, FACTOR)
    dtype = jnp.float32 if args.smoke else jnp.bfloat16

    def build(size, cond_channels):
        if args.smoke:
            return UNet(UNetConfig(
                image_size=size, in_channels=3 + cond_channels,
                model_channels=32, out_channels=3, num_res_blocks=1,
                attention_resolutions=(), channel_mult=(1, 2), num_heads=1,
                dtype=jnp.float32))
        return UNet(UNetConfig(
            image_size=size, in_channels=3 + cond_channels,
            model_channels=64, out_channels=3, num_res_blocks=1,
            attention_resolutions=(4, 8), channel_mult=(1, 2, 3, 4),
            num_heads=4, dtype=jnp.bfloat16))

    base_model = build(base_size, 0)
    sr_model = build(hi_size, 3)
    base_diff = GaussianDiffusion.create(timesteps=timesteps,
                                         image_size=base_size, in_channels=3)
    sr_diff = GaussianDiffusion.create(timesteps=timesteps,
                                       image_size=hi_size, in_channels=3,
                                       cond_type="concat")

    results = {"base_px": base_size, "sr_px": hi_size, "factor": FACTOR,
               "smoke": bool(args.smoke), "texture": args.texture}
    if not args.skip_base:
        results["base_train"] = C.train("sr_base", base_model, base_diff,
                                        lo, args.base_steps)
        if args.skip_sr:
            # stage-split mode (one training per process, CLAUDE.md RSS
            # leak): the base process stops here; the --skip_base process
            # trains the SR stage and runs the evaluation
            print("[sr] base stage done; skip_sr set — exiting before eval")
            return
    base_params = C.load_ema("sr_base", base_model)
    if not args.skip_sr:
        results["sr_train"] = _train_sr("sr_stage", sr_model, sr_diff, hi,
                                        args.sr_steps_train, sr_batch, CKPT)
    tmpl = jax.jit(sr_model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, hi_size, hi_size, 3), jnp.float32),
        jnp.zeros((1,), jnp.int32),
        cond=jnp.zeros((1, hi_size, hi_size, 3)))
    _, sr_params = restore_params(os.path.join(CKPT, "sr_stage"), tmpl)
    sr_params = jax.tree.map(jnp.asarray, sr_params)

    base_fn = lambda p: (lambda x, t, c, y: base_model.apply(p, x, t,
                                                             cond=c, y=y))
    sr_fn = lambda p: (lambda x, t, c, y: sr_model.apply(p, x, t,
                                                         cond=c, y=y))

    # -- 1. SR reconstruction on held-out images vs the upsample baseline --
    held = hi[-n_eval:]
    cond_np = sr_cond(held, FACTOR)
    bs = min(32, n_eval)
    jrec = jax.jit(lambda p, k, c: sr_diff.ddim_sample(
        sr_fn(p), k, bs, num_steps=args.sr_steps, cond=c, clip=True,
        dtype=dtype).x.astype(jnp.float32))
    rec = np.concatenate([
        np.asarray(jrec(sr_params, jax.random.PRNGKey(40 + i),
                        jnp.asarray(cond_np[i * bs:(i + 1) * bs])))
        for i in range(n_eval // bs)])
    to01 = lambda a: jnp.asarray(np.clip((a + 1.0) / 2.0, 0.0, 1.0))
    held01, rec01, cond01 = to01(held[:len(rec)]), to01(rec), \
        to01(cond_np[:len(rec)])
    results["recon"] = {
        "ssim": float(M.ssim(rec01, held01)),
        "psnr": float(M.psnr(rec01, held01)),
        "baseline_ssim": float(M.ssim(cond01, held01)),
        "baseline_psnr": float(M.psnr(cond01, held01)),
    }
    print(f"[sr128] recon SSIM={results['recon']['ssim']:.4f} "
          f"(baseline {results['recon']['baseline_ssim']:.4f}) "
          f"PSNR={results['recon']['psnr']:.2f} "
          f"(baseline {results['recon']['baseline_psnr']:.2f})", flush=True)
    save_image_grid(np.asarray(rec01[:8]),
                    os.path.join(GALLERY, f"{TAG}_recon.png"), nrow=4)
    save_image_grid(np.asarray(cond01[:8]),
                    os.path.join(GALLERY, f"{TAG}_recon_input.png"), nrow=4)

    # -- 2. cascade: base samples -> upsample -> SR; KID at the hi grid ----
    extractor = M.tiny_feature_extractor()
    real_feats = np.asarray(extractor(jnp.asarray(hi[:256])))

    def cascade(bp, sp, rng):
        r1, r2 = jax.random.split(rng)
        xb = base_diff.ddim_sample(base_fn(bp), r1, bs, num_steps=25,
                                   clip=True, dtype=dtype).x
        cond = jnp.repeat(jnp.repeat(xb, FACTOR, axis=1), FACTOR, axis=2)
        xs = sr_diff.ddim_sample(sr_fn(sp), r2, bs,
                                 num_steps=args.sr_steps, cond=cond,
                                 clip=True, dtype=dtype).x
        n, H, _, c = xs.shape
        pooled = xs.reshape(n, H // FACTOR, FACTOR, H // FACTOR, FACTOR,
                            c).mean(axis=(2, 4))
        rmse = jnp.sqrt(jnp.mean((pooled - xb) ** 2))
        return (xb.astype(jnp.float32), xs.astype(jnp.float32), rmse)

    jcasc = jax.jit(cascade)
    xb_all, xs_all, rmses, t_steady = [], [], [], None
    for i in range(n_eval // bs):
        t0 = time.time()
        xb, xs, rmse = jcasc(base_params, sr_params,
                             jax.random.PRNGKey(200 + i))
        xb, xs = np.asarray(xb), np.asarray(xs)
        if i == 1 or n_eval // bs == 1:
            t_steady = time.time() - t0
        xb_all.append(xb)
        xs_all.append(xs)
        rmses.append(float(rmse))
    xb_np, xs_np = np.concatenate(xb_all), np.concatenate(xs_all)
    up_np = np.repeat(np.repeat(xb_np, FACTOR, axis=1), FACTOR, axis=2)
    feats = lambda a: np.asarray(extractor(
        jnp.asarray(np.clip(a, -1, 1))))
    kid_sr, _ = M.kid(real_feats, feats(xs_np))
    kid_up, _ = M.kid(real_feats, feats(up_np))
    results["cascade"] = {
        "kid_sr": float(kid_sr),
        "kid_upsample_baseline": float(kid_up),
        "cascade_rmse": float(np.mean(rmses)),
        "s_per_batch": t_steady,
        "grad_sr": float(np.mean(np.abs(np.diff(xs_np, axis=1)))),
        "grad_data": float(np.mean(np.abs(np.diff(hi[:256], axis=1)))),
    }
    print(f"[sr128] cascade KID={kid_sr:.4f} "
          f"(upsample-only {kid_up:.4f}) rmse={np.mean(rmses):.4f} "
          f"{t_steady:.2f}s/batch{bs}", flush=True)
    save_image_grid(np.clip((xs_np[:8] + 1) / 2, 0, 1),
                    os.path.join(GALLERY, f"{TAG}_cascade.png"), nrow=4)
    save_image_grid(np.clip((up_np[:8] + 1) / 2, 0, 1),
                    os.path.join(GALLERY, f"{TAG}_cascade_base_up.png"),
                    nrow=4)

    out = os.path.join(GALLERY, f"{TAG}_metrics.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
