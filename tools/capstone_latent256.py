"""latent256 capstone: the production LDM configuration at the headline
resolution (VERDICT r4 item 2).

Pipeline, all trained on-chip on the SyntheticEOHard 256px fixture:

  1. extractor256 — a FeatureCNN at native 256px for the KID harness
     (degradation-ladder validated, like the 64px one from
     capstone_evalregime); saved to gallery/eval_extractor256.npz.
  2. f4 first stage — ConvAutoencoder (base 128, 2 downs) trained at 256px
     with device-resident data (per-step host feeds leak RSS, CLAUDE.md).
  3. latent DiT — DiT-B/4 + rectified flow on the 64x64x4 latent grid
     (256 tokens/call vs the pixel-space dit256's 1024): the whole fixture
     is ENCODED ONCE to device-resident latents; training never touches
     pixels again.
  4. eval — sample latents (euler/heun sweeps), decode, KID vs the fixture
     under extractor256 + throughput at batch 32. The comparison target is
     the pixel-space modern stack (heun8 ~36 img/s bench rider, KID at
     trained quality from capstone_dit256).

Artifacts: gallery/latent256_metrics.json + grids; the latent256 preset
serves the same recipe through cli.train/inference/serve/export_model.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/capstone_latent256.py \
           [--stage all|extractor|ae|dit|eval] [--smoke]
"""

from __future__ import annotations

import argparse
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
CKPT = os.path.join(ROOT, "logs", "capstone_latent256")
GALLERY = os.path.join(ROOT, "gallery")
METRICS = os.path.join(GALLERY, "latent256_metrics.json")
EXT_NPZ = os.path.join(GALLERY, "eval_extractor256.npz")

STAGES = ("extractor", "ae", "dit", "eval")


class Ctx:
    def __init__(self, smoke: bool):
        self.smoke = smoke
        if smoke:
            self.size, self.n_data = 32, 128
            self.lat, self.zc, self.ae_base = 8, 4, 16
            self.ae_steps, self.dit_steps = 30, 30
            self.ae_batch, self.batch = 8, 16
            self.hidden, self.depth, self.patch, self.heads = 64, 2, 2, 4
            self.ext_steps, self.ext_widths = 60, (16, 24)
            self.n_eval, self.bs = 32, 16
        else:
            self.size, self.n_data = 256, 2048
            self.lat, self.zc, self.ae_base = 64, 4, 128
            self.ae_steps, self.dit_steps = 8000, 8000
            self.ae_batch, self.batch = 16, 32
            self.hidden, self.depth, self.patch, self.heads = 768, 12, 4, 12
            self.ext_steps, self.ext_widths = 3000, (32, 64, 128, 192, 256)
            self.n_eval, self.bs = 256, 32
        self._imgs = self._labels = self._ext = None

    @property
    def data(self):
        if self._imgs is None:
            from eo_diffusion_tpu.data.datasets import SyntheticEOHard

            t0 = time.time()
            ds = SyntheticEOHard(size=self.size, length=self.n_data,
                                 data_range=(-1.0, 1.0), seed=0)
            self._imgs = np.stack([ds[i]["image"] for i in range(self.n_data)])
            self._labels = np.asarray(
                [int(ds[i]["class"]) for i in range(self.n_data)], np.int32)
            print(f"fixture: {self.n_data}x{self.size}px in "
                  f"{time.time()-t0:.0f}s "
                  f"({self._imgs.nbytes/1e9:.2f} GB)", flush=True)
        return self._imgs, self._labels

    def extractor(self):
        """Tile-averaged features: the extractor is trained on TILE-sized
        crops (a 256px global-pool extractor saturates on the trivially
        separable classes and goes blur-invariant — its ladder failed on
        chip); 256px images are scored as the mean feature over the
        non-overlapping tile grid, which keeps per-tile blur/noise
        sensitivity."""
        if self._ext is None:
            from eo_diffusion_tpu.models.feature_cnn import (FeatureCNNConfig,
                                                             load_params,
                                                             make_extractor)

            params, meta = load_params(EXT_NPZ)
            widths = tuple(int(w) for w in meta["widths"])
            fcfg = FeatureCNNConfig(in_channels=3, widths=widths,
                                    num_classes=int(meta["num_classes"]))
            tile = int(meta["tile"])
            base = make_extractor(params, fcfg, batch=256)

            def tiled(x):
                x = np.asarray(x, np.float32)
                n, h, w, c = x.shape
                gh, gw = h // tile, w // tile
                tiles = (x.reshape(n, gh, tile, gw, tile, c)
                         .transpose(0, 1, 3, 2, 4, 5)
                         .reshape(n * gh * gw, tile, tile, c))
                f = base(tiles)
                return f.reshape(n, gh * gw, -1).mean(axis=1)

            self._ext = tiled
        return self._ext

    def feats(self, x):
        return np.asarray(self.extractor()(
            jnp.asarray(np.clip(x, -1.0, 1.0))))

    def kid_vs(self, x, real_feats):
        from eo_diffusion_tpu.utils import metrics as M

        k, ks = M.kid(real_feats, self.feats(x),
                      subset_size=min(100, len(real_feats)))
        return float(k), float(ks)

    def ae(self):
        from eo_diffusion_tpu.models.autoencoder import (AutoencoderConfig,
                                                         ConvAutoencoder)

        acfg = AutoencoderConfig(in_channels=3, latent_channels=self.zc,
                                 base_channels=self.ae_base, num_down=2)
        return ConvAutoencoder(acfg), acfg

    def dit(self):
        from eo_diffusion_tpu.models.dit import DiT, DiTConfig

        cfg = DiTConfig(image_size=self.lat, in_channels=self.zc,
                        out_channels=self.zc, patch_size=self.patch,
                        hidden_size=self.hidden, depth=self.depth,
                        num_heads=self.heads, dtype=jnp.bfloat16)
        return DiT(cfg)

    def flow(self):
        from eo_diffusion_tpu.diffusion.flow import FlowMatching

        return FlowMatching.create(image_size=self.lat, in_channels=self.zc)


def _load():
    if os.path.exists(METRICS):
        with open(METRICS) as f:
            return json.load(f)
    return {}


def _dump(r):
    os.makedirs(GALLERY, exist_ok=True)
    with open(METRICS, "w") as f:
        json.dump(r, f, indent=2)


def stage_extractor(ctx, results):
    from eo_diffusion_tpu.models.feature_cnn import (FeatureCNNConfig,
                                                     save_params,
                                                     train_feature_extractor)

    imgs, labels = ctx.data
    # train on random TILE-sized crops (4 per image): a full-256px
    # global-pool extractor saturates and loses blur sensitivity (the
    # first chip run's ladder failed); tile-level training keeps texture
    # resolution, and eval features tile-average (see Ctx.extractor)
    tile = max(ctx.size // 4, 8)
    rng = np.random.default_rng(3)
    crops, crop_labels = [], []
    for i in range(len(imgs)):
        for _ in range(4):
            oy, ox = rng.integers(0, ctx.size - tile + 1, 2)
            crops.append(imgs[i, oy:oy + tile, ox:ox + tile])
            crop_labels.append(labels[i])
    crops = np.stack(crops)
    crop_labels = np.asarray(crop_labels, np.int32)
    widths = (16, 24) if ctx.smoke else (32, 64, 128, 192)
    fcfg = FeatureCNNConfig(in_channels=3, widths=widths, num_classes=5)
    params, acc = train_feature_extractor(
        crops, crop_labels, cfg=fcfg, steps=ctx.ext_steps, batch_size=64,
        seed=0, log_every=max(ctx.ext_steps // 6, 1))
    save_params(params, EXT_NPZ, meta={
        "widths": np.asarray(widths), "num_classes": 5,
        "size": ctx.size, "tile": tile, "data": "synthetic_hard",
        "seed": 0})
    ctx._ext = None

    half = len(imgs) // 2
    real = ctx.feats(imgs[:half])
    test = imgs[half:half + min(256, half)]
    rng = np.random.default_rng(1)

    def blur(x, passes):
        for _ in range(passes):
            x = (np.roll(x, 1, 1) + x + np.roll(x, -1, 1)) / 3
            x = (np.roll(x, 1, 2) + x + np.roll(x, -1, 2)) / 3
        return x.astype(np.float32)

    ladder = {"plain": ctx.kid_vs(test, real)[0],
              "blur3": ctx.kid_vs(blur(test.copy(), 3), real)[0],
              "noise0.3": ctx.kid_vs(np.clip(
                  test + rng.normal(0, 0.3, test.shape), -1, 1
              ).astype(np.float32), real)[0]}
    mono = ladder["plain"] < min(ladder["blur3"], ladder["noise0.3"])
    results["extractor"] = {"held_out_acc": float(acc), "ladder": ladder,
                            "monotone": bool(mono)}
    print(f"extractor256: acc={acc:.3f} ladder={ladder}", flush=True)
    assert mono or ctx.smoke, "256px degradation ladder failed"


def stage_ae(ctx, results):
    import optax

    from eo_diffusion_tpu.data.device_cache import DeviceDataCache
    from eo_diffusion_tpu.train.ae_trainer import save_ae

    imgs, _ = ctx.data
    model, acfg = ctx.ae()
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, ctx.size, ctx.size, 3)))
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"f4 AE: {n_params/1e6:.1f} M params", flush=True)
    tx = optax.adam(2e-3)
    opt = jax.jit(tx.init)(params)
    cache = DeviceDataCache({"image": imgs})

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt, tensors, rng):
        idx = jax.random.randint(rng, (ctx.ae_batch,), 0,
                                 tensors["image"].shape[0])
        x = tensors["image"][idx]

        def loss_fn(p):
            z = model.apply(p, x, method="encode")
            rec = model.apply(p, z, method="decode")
            rec_l = jnp.mean((rec - x) ** 2)
            return rec_l + 1e-4 * jnp.mean(z.astype(jnp.float32) ** 2), rec_l

        (_, rec_l), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, rec_l

    rng = jax.random.PRNGKey(1)
    t0 = time.time()
    for i in range(ctx.ae_steps):
        rng, srng = jax.random.split(rng)
        params, opt, l = step(params, opt, cache.tensors, srng)
        if i == 0:
            t0 = time.time()
        if (i + 1) % max(ctx.ae_steps // 8, 1) == 0:
            print(f"ae step {i+1}/{ctx.ae_steps} recon={float(l):.5f} "
                  f"({(time.time()-t0)/max(i,1)*1e3:.0f} ms/step)",
                  flush=True)

    z = model.apply(params, jnp.asarray(imgs[:32]), method="encode")
    scale = 1.0 / max(float(jnp.std(z.astype(jnp.float32))), 1e-6)
    rec = model.apply(params, z, method="decode")
    rec_mse = float(jnp.mean((rec - imgs[:32]) ** 2))
    save_ae(os.path.join(CKPT, "ae"), acfg, jax.device_get(params), scale)

    # AE quality in the eval harness: recon KID vs real (the AE ceiling)
    half = ctx.n_data // 2
    real = ctx.feats(imgs[:half])
    dec = []
    for s in range(half, min(half + 256, ctx.n_data), 32):
        zz = model.apply(params, jnp.asarray(imgs[s:s + 32]), method="encode")
        dec.append(np.asarray(model.apply(params, zz, method="decode")))
    k_rec, _ = ctx.kid_vs(np.concatenate(dec), real)
    results["ae"] = {"recon_mse": rec_mse, "scale": scale,
                     "recon_kid_ceiling": k_rec,
                     "params_m": n_params / 1e6}
    print(f"ae: recon_mse={rec_mse:.5f} scale={scale:.3f} "
          f"recon-KID ceiling={k_rec:.4g}", flush=True)

    from eo_diffusion_tpu.utils.images import save_image_grid

    panel = np.clip((np.concatenate([imgs[half:half + 8],
                                     np.concatenate(dec)[:8]]) + 1) / 2, 0, 1)
    save_image_grid(panel, os.path.join(GALLERY,
                                        "latent256_reconstruction.png"),
                    nrow=8)


def _encode_all(ctx):
    """Encode the fixture to scaled latents once (device-resident)."""
    from eo_diffusion_tpu.train.ae_trainer import load_ae

    imgs, _ = ctx.data
    ae_model, ae_params, scale = load_ae(os.path.join(CKPT, "ae"))
    ae_params = jax.tree.map(jnp.asarray, ae_params)
    enc = jax.jit(lambda p, x: ae_model.apply(p, x, method="encode"))
    zs = []
    for s in range(0, ctx.n_data, 32):
        zs.append(np.asarray(enc(ae_params, jnp.asarray(imgs[s:s + 32]))))
    z = np.concatenate(zs) * scale
    print(f"encoded {z.shape} latents (std {z.std():.3f})", flush=True)
    return z, (ae_model, ae_params, scale)


def stage_dit(ctx, results):
    import optax

    from eo_diffusion_tpu.data.device_cache import DeviceDataCache, gather_batch
    from eo_diffusion_tpu.train.checkpoint import save_checkpoint
    from eo_diffusion_tpu.train.trainer import TrainState, make_train_step

    z, _ = _encode_all(ctx)
    model = ctx.dit()
    flow = ctx.flow()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, ctx.lat, ctx.lat, ctx.zc)),
        jnp.zeros((1,), jnp.int32))
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"latent DiT: {n_params/1e6:.1f} M params "
          f"({(ctx.lat//ctx.patch)**2} tokens/call)", flush=True)

    steps = ctx.dit_steps
    sched = optax.warmup_cosine_decay_schedule(0.0, 1e-3,
                                               min(500, steps // 4 or 1),
                                               steps, 1e-5)
    tx = optax.adamw(sched)
    state = TrainState.create(params, tx)
    apply_fn = (lambda p, xx, tt, cond=None, y=None, train=False,
                dropout_rng=None: model.apply(p, xx, tt, cond=cond, y=y))
    step_fn = make_train_step(flow, apply_fn, tx, ema_decay=0.999,
                              ema_every=10)
    cache = DeviceDataCache({"image": z})

    @functools.partial(jax.jit, donate_argnums=(0,))
    def jstep(state, tensors, rng):
        d_rng, s_rng = jax.random.split(rng)
        mb = gather_batch(tensors, d_rng, ctx.batch)
        return step_fn(state, mb, s_rng)

    rng = jax.random.PRNGKey(2)
    t0 = time.time()
    for i in range(steps):
        rng, srng = jax.random.split(rng)
        state, m = jstep(state, cache.tensors, srng)
        if i == 0:
            t0 = time.time()
        if (i + 1) % 1000 == 0 or (i + 1) == steps:
            print(f"dit step {i+1}/{steps} loss={float(m['loss']):.4f} "
                  f"({(time.time()-t0)/max(i,1)*1e3:.0f} ms/step)",
                  flush=True)
    save_checkpoint(CKPT, jax.device_get(state),
                    name="final" + getattr(ctx, "_suffix", ""))
    results["dit"] = {"steps": steps, "loss_final": float(m["loss"]),
                      "params_m": n_params / 1e6}


def stage_eval(ctx, results):
    from eo_diffusion_tpu.train.ae_trainer import load_ae
    from eo_diffusion_tpu.train.checkpoint import restore_params
    from eo_diffusion_tpu.utils.images import save_image_grid

    imgs, _ = ctx.data
    ae_model, ae_params, scale = load_ae(os.path.join(CKPT, "ae"))
    ae_params = jax.tree.map(jnp.asarray, ae_params)
    model = ctx.dit()
    flow = ctx.flow()
    params0 = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, ctx.lat, ctx.lat, ctx.zc)),
        jnp.zeros((1,), jnp.int32))
    _, ema = restore_params(
        os.path.join(CKPT, "final" + getattr(ctx, "_suffix", "")), params0)
    ema = jax.tree.map(jnp.asarray, ema)

    half = ctx.n_data // 2
    real = ctx.feats(imgs[:half])
    data_grad = float(np.mean(np.abs(np.diff(imgs[:256], axis=1))))

    def run(p, ap, r, num_steps, method):
        z = flow.sample(
            lambda x, t, c, y: model.apply(p, x, t, cond=c, y=y), r, ctx.bs,
            num_steps=num_steps, method=method, dtype=jnp.bfloat16).x
        return ae_model.apply(ap, z / scale, method="decode").astype(jnp.float32)

    out = {}
    grid = ([("euler", 2), ("heun", 2)] if ctx.smoke else
            [("euler", 1), ("euler", 2), ("euler", 4), ("heun", 4),
             ("heun", 8), ("heun", 16)])
    for method, n in grid:
        j = jax.jit(functools.partial(run, num_steps=n, method=method))
        xs, t_draw = [], 0.0
        for i in range(max(ctx.n_eval // ctx.bs, 1)):
            t1 = time.time()
            x = j(ema, ae_params, jax.random.PRNGKey(400 + i))
            _ = float(jnp.sum(x))
            if i > 0:
                t_draw += time.time() - t1
            xs.append(np.asarray(x))
        x = np.concatenate(xs)
        k, ks = ctx.kid_vs(x, real)
        g = float(np.mean(np.abs(np.diff(x, axis=1))))
        nb = max(ctx.n_eval // ctx.bs - 1, 1)
        tag = f"{method}{n}"
        out[tag] = {"kid": k, "kid_std": ks, "grad": g,
                    "img_s": nb * ctx.bs / t_draw if t_draw else None}
        print(f"eval {tag}: kid={k:.4g} grad={g:.4f} (data {data_grad:.4f})"
              f" {out[tag]['img_s'] or 0:.1f} img/s", flush=True)
        if (method, n) in (("heun", 8), ("euler", 2)):
            save_image_grid(np.clip((x[:16] + 1) / 2, 0, 1),
                            os.path.join(GALLERY, f"latent256_{tag}.png"),
                            nrow=4)
    out["data_grad"] = data_grad
    results["eval"] = out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all", choices=STAGES + ("all",))
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--dit_steps", type=int, default=0,
                    help="override the DiT training budget (the longer-run "
                         "entry; eval results land under eval{steps}k)")
    args = ap.parse_args()

    global METRICS, EXT_NPZ, CKPT
    if args.smoke:
        METRICS = METRICS.replace(".json", "_smoke.json")
        EXT_NPZ = EXT_NPZ.replace(".npz", "_smoke.npz")
        CKPT = CKPT + "_smoke"

    ctx = Ctx(args.smoke)
    if args.dit_steps:
        # longer-run entry: fresh DiT budget, results under suffixed keys
        # (the 8k-budget rows stay as the pixel-baseline-matched pair)
        ctx.dit_steps = args.dit_steps
        ctx._suffix = f"{args.dit_steps // 1000}k"
    results = _load()
    fns = {"extractor": stage_extractor, "ae": stage_ae, "dit": stage_dit,
           "eval": stage_eval}
    for s in (STAGES if args.stage == "all" else (args.stage,)):
        key = s + getattr(ctx, "_suffix", "") if s in ("dit", "eval") else s
        if key in results and not args.force:
            print(f"stage {key}: already recorded, skipping")
            continue
        print(f"=== stage {key} ===", flush=True)
        fns[s](ctx, results)
        if getattr(ctx, "_suffix", "") and s in ("dit", "eval"):
            results[key] = results.pop(s)
        _dump(results)
    print(f"wrote {METRICS}")


if __name__ == "__main__":
    main()
