"""Brownian-bridge capstone: paired cloud removal, bridge vs concat-DDPM.

The flagship EO use-case (cloud removal) solved three ways on the shared
64px synthetic protocol (same data/extractor as tools/capstone_dit_flow.py,
with the cloudy view as the pair source):

* **bridge**  — BBDM paired translation (diffusion/bridge.py): sampling
  starts AT the cloudy image, scored at 2/5/10/25 posterior steps (eta 0).
* **concat-DDPM** — the reference-style approach (cloudy view channel-
  concatenated, sampling from noise), scored at DDIM-10/25/50.
* **identity** — the cloudy input itself (the floor any method must beat).

Reports SSIM/PSNR against the held-out clear targets + KID against clear
images, and writes cloudy|translated|clear triptych grids. Expected story:
the bridge matches or beats concat-DDPM at a fraction of the steps because
it only has to move the clouded pixels.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/capstone_bridge.py \
           [--steps 6000] [--skip_bridge] [--skip_baseline] [--smoke]
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
CKPT = os.path.join(ROOT, "logs", "capstone_bridge")
GALLERY = os.path.join(ROOT, "gallery")
SIZE, BATCH, N_EVAL = 64, 128, 256


def dataset_pairs(n_images=2048, seed=0):
    """(clear, cloudy) pairs in [-1, 1] from the synthetic EO fixture."""
    from eo_diffusion_tpu.data.datasets import SyntheticEO

    ds = SyntheticEO(size=SIZE, length=n_images, data_range=(-1.0, 1.0),
                     seed=seed, with_cond_image=True)
    items = [ds[i] for i in range(n_images)]
    return (np.stack([it["image"] for it in items]),
            np.stack([it["cond_image"] for it in items]))


def batches(clear, cloudy, batch_size, seed=1):
    rng = np.random.default_rng(seed)
    while True:
        idx = rng.integers(0, len(clear), batch_size)
        x, c = clear[idx], cloudy[idx]
        if rng.random() < 0.5:
            x, c = x[:, :, ::-1], c[:, :, ::-1]
        if rng.random() < 0.5:
            x, c = x[:, ::-1], c[:, ::-1]
        yield np.ascontiguousarray(x), np.ascontiguousarray(c)


def build_unet(smoke: bool):
    from eo_diffusion_tpu.models.unet import UNet, UNetConfig

    if smoke:
        return UNet(UNetConfig(image_size=SIZE, in_channels=6,
                               model_channels=32, out_channels=3,
                               num_res_blocks=1, attention_resolutions=(),
                               channel_mult=(1, 2), num_heads=1,
                               dtype=jnp.float32))
    return UNet(UNetConfig(image_size=SIZE, in_channels=6, model_channels=64,
                           out_channels=3, num_res_blocks=1,
                           attention_resolutions=(4, 8),
                           channel_mult=(1, 2, 3, 4), num_heads=4,
                           dtype=jnp.bfloat16))


def train(tag, model, process, clear, cloudy, steps, warmup=500):
    import optax

    from eo_diffusion_tpu.train.checkpoint import save_checkpoint
    from eo_diffusion_tpu.train.trainer import TrainState, make_train_step

    sched = optax.warmup_cosine_decay_schedule(
        0.0, 1e-3, min(warmup, steps // 4 or 1), steps, 1e-5)
    tx = optax.adamw(sched)
    x0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    c0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                                 jnp.zeros((1,), jnp.int32), cond=c0)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"[{tag}] {n_params/1e6:.1f} M params", flush=True)
    state = TrainState.create(params, tx)
    apply_fn = (
        lambda p, xx, tt, cond=None, y=None, train=False, dropout_rng=None:
        model.apply(p, xx, tt, cond=cond, y=y))
    step_fn = make_train_step(process, apply_fn, tx, ema_decay=0.999,
                              ema_every=10, use_cond=True)
    jstep = jax.jit(step_fn, donate_argnums=(0,))

    it = batches(clear, cloudy, BATCH, seed=3)
    rng = jax.random.PRNGKey(1)
    t0 = time.time()
    loss0 = loss = None
    for i in range(steps):
        rng, srng = jax.random.split(rng)
        x, c = next(it)
        state, m = jstep(state, {"image": jnp.asarray(x),
                                 "cond": jnp.asarray(c)}, srng)
        if i == 0:
            loss0 = float(m["loss"])
        if (i + 1) % 1000 == 0 or i == steps - 1:
            loss = float(m["loss"])
            if (i + 1) % 1000 == 0:
                print(f"[{tag}] step {i+1}/{steps} loss={loss:.4f} "
                      f"({(time.time()-t0)/(i+1)*1e3:.0f} ms/step)",
                      flush=True)
    print(f"[{tag}] trained: loss {loss0:.4f} -> {loss:.4f}")
    save_checkpoint(CKPT, jax.device_get(state), name=tag)
    return {"loss_first": loss0, "loss_last": loss,
            "ms_per_step": (time.time() - t0) / steps * 1e3}


def load_ema(tag, model):
    from eo_diffusion_tpu.train.checkpoint import restore_params

    x0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    c0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                                 jnp.zeros((1,), jnp.int32), cond=c0)
    _, ema = restore_params(os.path.join(CKPT, tag), params)
    return jax.tree.map(jnp.asarray, ema)


def score(tag, label, out, clear_h, cloudy_h, extractor, real_feats,
          results, t_batch):
    from eo_diffusion_tpu.utils import metrics as M
    from eo_diffusion_tpu.utils.images import save_image_grid

    s = float(jnp.mean(M.ssim(jnp.asarray((out + 1) / 2),
                              jnp.asarray((clear_h + 1) / 2))))
    p = float(jnp.mean(M.psnr(jnp.asarray((out + 1) / 2),
                              jnp.asarray((clear_h + 1) / 2))))
    feats = np.asarray(extractor(jnp.asarray(np.clip(out, -1, 1))))
    k, _ = M.kid(real_feats, feats)
    results[f"{tag}_{label}"] = {"ssim": s, "psnr": p, "kid": float(k),
                                 "s_per_batch64": t_batch}
    print(f"[{tag}] {label}: SSIM={s:.4f} PSNR={p:.2f} KID={float(k):.4f} "
          f"{t_batch if t_batch is not None else -1:.2f}s/64imgs", flush=True)
    trip = np.stack([cloudy_h[:5], out[:5], clear_h[:5]], 1).reshape(
        15, SIZE, SIZE, 3)
    save_image_grid(np.clip((trip + 1) / 2, 0, 1),
                    os.path.join(GALLERY, f"{tag}_{label}.png"), nrow=3)


def main():
    global SIZE, BATCH, N_EVAL
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--skip_bridge", action="store_true")
    ap.add_argument("--skip_baseline", action="store_true")
    ap.add_argument("--skip_scene", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        SIZE, BATCH, N_EVAL = 8, 16, 32
        args.steps = min(args.steps, 30)
    os.makedirs(CKPT, exist_ok=True)
    os.makedirs(GALLERY, exist_ok=True)

    from eo_diffusion_tpu.diffusion.bridge import BrownianBridge
    from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from eo_diffusion_tpu.utils import metrics as M

    T = 100 if args.smoke else 1000
    clear, cloudy = dataset_pairs(256 if args.smoke else 2048)
    clear_h, cloudy_h = dataset_pairs(N_EVAL, seed=77)  # held-out pairs
    extractor = M.tiny_feature_extractor()
    real_feats = np.asarray(extractor(jnp.asarray(clear[:256])))

    bridge = BrownianBridge.create(image_size=SIZE, in_channels=3,
                                   timesteps=T, cond_type="concat")
    ddpm = GaussianDiffusion.create(timesteps=T, image_size=SIZE,
                                    in_channels=3, cond_type="concat")
    # merge into an existing json so --skip_* reruns (the per-step host
    # leak in the axon tunnel OOM-kills two-training processes; run one
    # training per process) keep earlier stages' numbers
    out_path = os.path.join(GALLERY, "bridge64_metrics.json")
    results = {}
    if os.path.exists(out_path) and not args.smoke:
        with open(out_path) as f:
            results = json.load(f)

    # the identity floor: how close the cloudy input already is
    s_id = float(jnp.mean(M.ssim(jnp.asarray((cloudy_h + 1) / 2),
                                 jnp.asarray((clear_h + 1) / 2))))
    p_id = float(jnp.mean(M.psnr(jnp.asarray((cloudy_h + 1) / 2),
                                 jnp.asarray((clear_h + 1) / 2))))
    results["identity"] = {"ssim": s_id, "psnr": p_id}
    print(f"[identity] SSIM={s_id:.4f} PSNR={p_id:.2f}", flush=True)

    model = build_unet(args.smoke)
    fn_of = lambda p: (lambda x, t, c, y: model.apply(p, x, t, cond=c, y=y))
    dtype = jnp.float32 if args.smoke else jnp.bfloat16
    bs = min(64, N_EVAL)

    if not args.skip_bridge:
        results["bridge_train"] = train("bridge", model, bridge, clear,
                                        cloudy, args.steps)
    bp = load_ema("bridge", model)
    for steps in ([2, 5] if args.smoke else [2, 5, 10, 25]):
        j = jax.jit(lambda p, rng, c: bridge.sample(
            fn_of(p), rng, bs, num_steps=steps, cond=c, eta=0.0,
            dtype=dtype).x.astype(jnp.float32))
        outs, t_b = [], None
        for i in range(N_EVAL // bs):
            t0 = time.time()
            outs.append(np.asarray(j(bp, jax.random.PRNGKey(100 + i),
                                     jnp.asarray(cloudy_h[i*bs:(i+1)*bs])),
                                   np.float32))
            if i == 1 or N_EVAL // bs == 1:
                t_b = time.time() - t0
        score("bridge64", f"b{steps}", np.concatenate(outs), clear_h,
              cloudy_h, extractor, real_feats, results, t_b)

    if not args.skip_baseline:
        results["ddpm_train"] = train("concat_ddpm", model, ddpm, clear,
                                      cloudy, args.steps)
        dp = load_ema("concat_ddpm", model)
        for steps in ([5] if args.smoke else [10, 25, 50]):
            j = jax.jit(lambda p, rng, c: ddpm.ddim_sample(
                fn_of(p), rng, bs, num_steps=steps, cond=c,
                dtype=dtype).x.astype(jnp.float32))
            outs, t_b = [], None
            for i in range(N_EVAL // bs):
                t0 = time.time()
                outs.append(np.asarray(j(dp, jax.random.PRNGKey(100 + i),
                                         jnp.asarray(cloudy_h[i*bs:(i+1)*bs])),
                                       np.float32))
                if i == 1 or N_EVAL // bs == 1:
                    t_b = time.time() - t0
            score("bridge64_baseline", f"ddim{steps}", np.concatenate(outs),
                  clear_h, cloudy_h, extractor, real_feats, results, t_b)

    # whole-scene stage: translate one large cloudy scene in ONE compiled
    # tiled-bridge pass (tiled.tiled_bridge_sample) — the flagship
    # large-scene cloud-removal artifact
    if not args.skip_scene:
        from eo_diffusion_tpu.data.datasets import SyntheticEO
        from eo_diffusion_tpu.diffusion.tiled import tiled_bridge_sample
        from eo_diffusion_tpu.utils.images import save_image_grid

        scene_px = 32 if args.smoke else 1024
        ds = SyntheticEO(size=scene_px, length=1, data_range=(-1.0, 1.0),
                         seed=555, with_cond_image=True)
        it = ds[0]
        sc_clear = it["image"][None]
        sc_cloudy = it["cond_image"][None]
        tb = None if args.smoke else 64

        jscene = jax.jit(lambda p, rng, c: tiled_bridge_sample(
            bridge, fn_of(p), rng, 1, scene_px, scene_px, num_steps=10,
            cond=c, eta=0.0, tile_batch=tb, dtype=dtype).x)
        t0 = time.time()
        sc_out = np.asarray(jscene(bp, jax.random.PRNGKey(9),
                                   jnp.asarray(sc_cloudy)), np.float32)
        # compile excluded: time the second (steady-state) scene
        t0 = time.time()
        sc_out = np.asarray(jscene(bp, jax.random.PRNGKey(10),
                                   jnp.asarray(sc_cloudy)), np.float32)
        dt = time.time() - t0

        def seam_metric(img):
            g_all = np.mean(np.abs(np.diff(img, axis=2)))
            bounds = np.arange(SIZE // 2, scene_px, SIZE // 2)[:-1]
            g_b = np.mean(np.abs(img[:, :, bounds] - img[:, :, bounds - 1]))
            return float(g_b / max(g_all, 1e-9))

        s = float(jnp.mean(M.ssim(jnp.asarray((sc_out + 1) / 2),
                                  jnp.asarray((sc_clear + 1) / 2))))
        s_in = float(jnp.mean(M.ssim(jnp.asarray((sc_cloudy + 1) / 2),
                                     jnp.asarray((sc_clear + 1) / 2))))
        results["scene"] = {"px": scene_px, "s_per_scene": dt,
                            "ssim": s, "ssim_identity": s_in,
                            "seam_ratio": seam_metric(sc_out)}
        print(f"[scene] {scene_px}px bridge-10: {dt:.1f}s "
              f"SSIM {s:.4f} (cloudy floor {s_in:.4f}) "
              f"seam {results['scene']['seam_ratio']:.3f}", flush=True)
        trip = np.stack([sc_cloudy[0], sc_out[0], sc_clear[0]])
        save_image_grid(np.clip((trip + 1) / 2, 0, 1),
                        os.path.join(GALLERY, "bridge_scene.png"), nrow=3)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
