"""256px eval-harness hardening (VERDICT r4 next-round item 5 / weak #4).

The r4 256px KID harness scores images as the MEAN tile feature over a
4x4 grid of 64px crops (a full-256px global-pool extractor went
blur-invariant and failed the degradation ladder on chip). Tile-averaged
features are blind to global-composition failures larger than a tile —
exactly the regime 256px generation can fail in.

This capstone:

  1. ``global``  — trains a COMPOSITION stream: a FeatureCNN on 4x
     average-pool-downsampled full images (the whole layout in one view),
     saved to gallery/eval_extractor256_global.npz. Validates the combined
     two-stream extractor (models/feature_cnn.make_two_stream_extractor)
     on an EXTENDED degradation ladder that now includes composition
     degradations:
        blur3 / noise0.3      (texture failures — the r4 ladder)
        tile_shuffle          (each image's 4x4 64px tiles permuted)
        tile_swap             (half of each image's tiles replaced from
                               another image)
     Requirement: plain < every degradation, measured; also records the
     OLD tiled extractor's scores on the composition rows to demonstrate
     the blindness being fixed.
  2. ``rescore`` — re-emits the latent256/pixel256 quality tables under
     the hardened extractor from the saved checkpoints (latent 24k DiT
     heun-16/8, ReFlow student euler-1/2, conditional latent heun-8,
     pixel256 DiT heun-16/8), so every 256px claim has a
     composition-sensitive score: gallery/latent256_hardened_metrics.json.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/capstone_evalharden.py \
           [--stage all|global|rescore] [--smoke] [--force]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import capstone_latent256 as cl

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GALLERY = os.path.join(ROOT, "gallery")
GLOBAL_NPZ = os.path.join(GALLERY, "eval_extractor256_global.npz")
STAGES = ("global", "rescore")


def tile_shuffle(x, tile, rng):
    """Permute each image's (H/tile x W/tile) grid independently."""
    n, h, w, c = x.shape
    gh, gw = h // tile, w // tile
    t = (x.reshape(n, gh, tile, gw, tile, c).transpose(0, 1, 3, 2, 4, 5)
         .reshape(n, gh * gw, tile, tile, c))
    out = np.empty_like(t)
    for i in range(n):
        out[i] = t[i, rng.permutation(gh * gw)]
    return (out.reshape(n, gh, gw, tile, tile, c).transpose(0, 1, 3, 2, 4, 5)
            .reshape(n, h, w, c))


def tile_swap(x, tile, rng):
    """Replace half of each image's tiles with tiles from a rolled partner
    image (cross-image composition corruption; per-tile stats unchanged)."""
    n, h, w, c = x.shape
    gh, gw = h // tile, w // tile
    t = (x.reshape(n, gh, tile, gw, tile, c).transpose(0, 1, 3, 2, 4, 5)
         .reshape(n, gh * gw, tile, tile, c))
    partner = np.roll(t, 1, axis=0)
    out = t.copy()
    for i in range(n):
        pick = rng.choice(gh * gw, size=(gh * gw) // 2, replace=False)
        out[i, pick] = partner[i, pick]
    return (out.reshape(n, gh, gw, tile, tile, c).transpose(0, 1, 3, 2, 4, 5)
            .reshape(n, h, w, c))


class HCtx:
    def __init__(self, smoke: bool):
        self.base = cl.Ctx(smoke)
        self.smoke = smoke
        self.down = 4
        self.ckpt = cl.CKPT
        self._two = None

    @property
    def tile(self):
        return max(self.base.size // 4, 8)

    def hardened_feats(self):
        """Two-stream feature fn from the persisted npzs."""
        if self._two is None:
            from eo_diffusion_tpu.models.feature_cnn import (
                FeatureCNNConfig, load_params, make_two_stream_extractor)

            tp, tmeta = load_params(cl.EXT_NPZ)
            tcfg = FeatureCNNConfig(
                in_channels=3,
                widths=tuple(int(w) for w in tmeta["widths"]),
                num_classes=int(tmeta["num_classes"]))
            gp, gmeta = load_params(GLOBAL_NPZ)
            gcfg = FeatureCNNConfig(
                in_channels=3,
                widths=tuple(int(w) for w in gmeta["widths"]),
                num_classes=int(gmeta["num_classes"]))
            self._two = make_two_stream_extractor(
                tp, tcfg, int(tmeta["tile"]), gp, gcfg,
                int(gmeta["down"]))
        return self._two

    def kid_h(self, x, real_feats):
        from eo_diffusion_tpu.utils import metrics as M

        f = self.hardened_feats()(np.clip(np.asarray(x, np.float32), -1, 1))
        k, ks = M.kid(real_feats, f, subset_size=min(100, len(real_feats)))
        return float(k), float(ks)


def stage_global(ctx, results):
    from eo_diffusion_tpu.models.feature_cnn import (FeatureCNNConfig,
                                                     save_params,
                                                     train_feature_extractor)

    b = ctx.base
    imgs, labels = b.data
    # composition stream: train on down-x average-pooled full images
    n, h, w, c = imgs.shape
    d = ctx.down
    imgs_d = imgs.reshape(n, h // d, d, w // d, d, c).mean((2, 4)) \
        .astype(np.float32)
    widths = (16, 24) if ctx.smoke else (32, 64, 128, 192)
    fcfg = FeatureCNNConfig(in_channels=3, widths=widths, num_classes=5)
    steps = b.ext_steps
    params, acc = train_feature_extractor(
        imgs_d, labels, cfg=fcfg, steps=steps, batch_size=64, seed=11,
        log_every=max(steps // 6, 1))
    save_params(params, GLOBAL_NPZ, meta={
        "widths": np.asarray(widths), "num_classes": 5,
        "size": b.size, "down": d, "data": "synthetic_hard", "seed": 11})
    ctx._two = None

    # extended ladder under BOTH extractors
    half = len(imgs) // 2
    test = imgs[half:half + min(256, half)].copy()
    rng = np.random.default_rng(1)

    def blur(x, passes):
        for _ in range(passes):
            x = (np.roll(x, 1, 1) + x + np.roll(x, -1, 1)) / 3
            x = (np.roll(x, 1, 2) + x + np.roll(x, -1, 2)) / 3
        return x.astype(np.float32)

    degraded = {
        "plain": test,
        "blur3": blur(test.copy(), 3),
        "noise0.3": np.clip(test + rng.normal(0, 0.3, test.shape),
                            -1, 1).astype(np.float32),
        "tile_shuffle": tile_shuffle(test, ctx.tile, rng),
        "tile_swap": tile_swap(test, ctx.tile, rng),
    }
    real_h = ctx.hardened_feats()(imgs[:half])
    real_old = b.feats(imgs[:half])
    from eo_diffusion_tpu.utils import metrics as M

    ladder_h, ladder_old = {}, {}
    for name, x in degraded.items():
        ladder_h[name] = ctx.kid_h(x, real_h)[0]
        k, _ = M.kid(real_old, b.feats(x),
                     subset_size=min(100, len(real_old)))
        ladder_old[name] = float(k)
        print(f"ladder[{name}]: hardened={ladder_h[name]:.4g} "
              f"old={ladder_old[name]:.4g}", flush=True)
    mono = ladder_h["plain"] < min(v for k, v in ladder_h.items()
                                   if k != "plain")
    results["global"] = {
        "held_out_acc": float(acc), "ladder_hardened": ladder_h,
        "ladder_old_tiled": ladder_old, "monotone": bool(mono),
        "old_blind_to_composition": bool(
            ladder_old["tile_shuffle"] < 2 * max(ladder_old["plain"], 1e-6)
            or ladder_old["tile_shuffle"] < ladder_old["blur3"])}
    assert mono or ctx.smoke, f"hardened ladder failed: {ladder_h}"


def _sample_rows(ctx):
    """(name, sample_fn) rows for every 256px checkpoint on disk."""
    b = ctx.base
    rows = []
    from eo_diffusion_tpu.train.ae_trainer import load_ae
    from eo_diffusion_tpu.train.checkpoint import restore_params

    ae_model, ae_params, scale = load_ae(os.path.join(ctx.ckpt, "ae"))
    ae_params = jax.tree.map(jnp.asarray, ae_params)
    flow = b.flow()

    def latent_runner(params, model, num_steps, method):
        # params/ae_params THREADED as jit args — a closed-over tree becomes
        # literal constants in the remote-compile payload (HTTP 413,
        # CLAUDE.md machine gotchas)
        def run(p, ap, r):
            z = flow.sample(
                lambda x, t, c, y: model.apply(p, x, t, cond=c, y=y),
                r, b.bs, num_steps=num_steps, method=method,
                dtype=jnp.bfloat16).x
            return ae_model.apply(ap, z / scale,
                                  method="decode").astype(jnp.float32)

        j = jax.jit(run)
        return lambda r: j(params, ae_params, r)

    # latent 24k teacher
    name24 = "final24k" if not ctx.smoke else "final"
    p24 = os.path.join(ctx.ckpt, name24)
    if os.path.exists(p24):
        model = b.dit()
        t0 = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, b.lat, b.lat, b.zc)),
                                 jnp.zeros((1,), jnp.int32))
        _, ema = restore_params(p24, t0)
        ema = jax.tree.map(jnp.asarray, ema)
        grid = [("heun", 16), ("heun", 8)] if not ctx.smoke else [("euler", 2)]
        for method, nsteps in grid:
            rows.append((f"latent24k_{method}{nsteps}",
                         latent_runner(ema, model, nsteps, method)))
    # ReFlow student
    pr = os.path.join(ctx.ckpt, "reflow", "final")
    if os.path.exists(pr):
        model = b.dit()
        t0 = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, b.lat, b.lat, b.zc)),
                                 jnp.zeros((1,), jnp.int32))
        _, ema = restore_params(pr, t0)
        ema = jax.tree.map(jnp.asarray, ema)
        for nsteps in ((1, 2) if not ctx.smoke else (1,)):
            rows.append((f"reflow_euler{nsteps}",
                         latent_runner(ema, model, nsteps, "euler")))
    # pixel256 baseline (tools/capstone_pixel256.py config)
    pp = os.path.join(ROOT, "logs", "capstone_pixel256", "final")
    if os.path.exists(pp) and not ctx.smoke:
        from eo_diffusion_tpu.models.dit import DiT, DiTConfig

        pcfg = DiTConfig(image_size=b.size, in_channels=3, out_channels=3,
                         patch_size=8, hidden_size=768, depth=12,
                         num_heads=12, dtype=jnp.bfloat16)
        pmodel = DiT(pcfg)
        pflow = __import__("eo_diffusion_tpu.diffusion.flow",
                           fromlist=["FlowMatching"]).FlowMatching.create(
            image_size=b.size, in_channels=3)
        t0 = jax.jit(pmodel.init)(jax.random.PRNGKey(0),
                                  jnp.zeros((1, b.size, b.size, 3)),
                                  jnp.zeros((1,), jnp.int32))
        _, pema = restore_params(pp, t0)
        pema = jax.tree.map(jnp.asarray, pema)

        def pixel_runner(nsteps, method):
            def run(p, r):
                return pflow.sample(
                    lambda x, t, c, y: pmodel.apply(p, x, t, cond=c, y=y),
                    r, b.bs, num_steps=nsteps, method=method,
                    dtype=jnp.bfloat16).x.astype(jnp.float32)

            j = jax.jit(run)
            return lambda r: j(pema, r)

        rows.append(("pixel256_heun16", pixel_runner(16, "heun")))
        rows.append(("pixel256_heun8", pixel_runner(8, "heun")))
    return rows


def stage_rescore(ctx, results):
    b = ctx.base
    imgs, _ = b.data
    half = b.n_data // 2
    real_h = ctx.hardened_feats()(imgs[:half])
    out = results.setdefault("rescore", {})

    # harness floor references under the hardened extractor
    if "real_heldout" not in out:
        test = imgs[half:half + min(256, half)]
        out["real_heldout"] = ctx.kid_h(test, real_h)[0]

    for name, run in _sample_rows(ctx):
        if name in out:
            print(f"rescore[{name}]: already recorded, skipping")
            continue
        xs = []
        for i in range(max(b.n_eval // b.bs, 1)):
            x = run(jax.random.PRNGKey(1300 + i))
            _ = float(jnp.sum(x))
            xs.append(np.asarray(x))
        k, ks = ctx.kid_h(np.concatenate(xs), real_h)
        out[name] = {"kid_hardened": k, "kid_std": ks}
        print(f"rescore[{name}]: kid_hardened={k:.4g}", flush=True)
        _dump(results)

    # conditional model rides its own paired eval (different real protocol);
    # score its heun-8 output distribution against the clean fixture
    pc = os.path.join(ctx.ckpt, "cond", "final")
    if os.path.exists(pc) and "cond_heun8" not in out and not ctx.smoke:
        import capstone_latent256_cond as cc

        cctx = cc.CCtx(ctx.smoke)
        cctx.ckpt = ctx.ckpt
        clean, cloudy = cctx.paired_fixture(seed=7, n=cctx.n_eval)
        encode, (ae_model, ae_params, scale) = cc._encoder(cctx)
        z_cloudy = encode(cloudy)
        from eo_diffusion_tpu.train.checkpoint import restore_params

        model = cctx.cond_dit()
        t0 = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, b.lat, b.lat, 2 * b.zc)),
            jnp.zeros((1,), jnp.int32))
        _, ema = restore_params(pc, t0)
        ema = jax.tree.map(jnp.asarray, ema)
        flow = b.flow()

        def run(p, ap, zc, r):
            z = flow.sample(
                lambda x, t, c, y: model.apply(p, x, t, cond=c, y=y), r,
                zc.shape[0], num_steps=8, method="heun", cond=zc,
                dtype=jnp.bfloat16).x
            return ae_model.apply(ap, z / scale,
                                  method="decode").astype(jnp.float32)

        j = jax.jit(run)
        xs = []
        for i in range(max(cctx.n_eval // cctx.bs, 1)):
            zc = jnp.asarray(z_cloudy[i * cctx.bs:(i + 1) * cctx.bs])
            x = j(ema, ae_params, zc, jax.random.PRNGKey(1500 + i))
            _ = float(jnp.sum(x))
            xs.append(np.asarray(x))
        k, ks = ctx.kid_h(np.concatenate(xs), real_h)
        out["cond_heun8"] = {"kid_hardened": k, "kid_std": ks}
        print(f"rescore[cond_heun8]: kid_hardened={k:.4g}", flush=True)


METRICS = os.path.join(GALLERY, "latent256_hardened_metrics.json")
_RESULTS_PATH = METRICS


def _dump(results):
    os.makedirs(GALLERY, exist_ok=True)
    with open(_RESULTS_PATH, "w") as f:
        json.dump(results, f, indent=2)


def main():
    global _RESULTS_PATH
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all", choices=STAGES + ("all",))
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    global GLOBAL_NPZ
    if args.smoke:
        cl.METRICS = cl.METRICS.replace(".json", "_smoke.json")
        cl.EXT_NPZ = cl.EXT_NPZ.replace(".npz", "_smoke.npz")
        cl.CKPT = cl.CKPT + "_smoke"
        GLOBAL_NPZ = GLOBAL_NPZ.replace(".npz", "_smoke.npz")
        _RESULTS_PATH = METRICS.replace(".json", "_smoke.json")

    ctx = HCtx(args.smoke)
    ctx.ckpt = cl.CKPT

    results = {}
    if os.path.exists(_RESULTS_PATH):
        with open(_RESULTS_PATH) as f:
            results = json.load(f)
    if args.force:
        results = {}
    fns = {"global": stage_global, "rescore": stage_rescore}
    for s in (STAGES if args.stage == "all" else (args.stage,)):
        if s == "global" and "global" in results and not args.force:
            print("stage global: already recorded, skipping")
            continue
        print(f"=== stage {s} ===", flush=True)
        fns[s](ctx, results)
        _dump(results)
    print(f"wrote {_RESULTS_PATH}")


if __name__ == "__main__":
    main()
