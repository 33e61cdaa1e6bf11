"""Discriminative evaluation regime + re-runs of the void capstones.

VERDICT r4 item 1: the plain synthetic fixture saturates (7M models reach
the offline extractor's KID noise floor at 4k steps) and the 16x16
random-projection extractor is provably noise-blind — so PAG, autoguidance,
post-hoc EMA and the UniPC-vs-DDIM ranking all measured void or
fixture-artifact negatives in r3. This capstone rebuilds the harness and
re-measures all of them:

  stage extractor — train models/feature_cnn.FeatureCNN on SyntheticEOHard
      at 64px; validate the degradation ladder (KID must rise monotonically
      with blur radius and noise amplitude) and held-out class accuracy;
      save gallery/eval_extractor64.npz for every later stage (and round).
  stage base — train the 7M eps-DDPM (capstone_pag arch) on the hard
      fixture, with power-EMA snapshots (post-hoc EMA) and an early
      checkpoint (autoguidance's degraded model); record baseline DDIM-50
      KID vs the data-vs-data noise floor — the saturation check.
  stage samplers — DDIM/DPM++/UniPC at matched NFE under the new harness
      (re-litigates r3's "UniPC-10 worse than DDIM-10").
  stage pag — perturbed-attention guidance sweep (re-run of the r3
      negative, PERF.md pass 10).
  stage phema — post-hoc EMA profile sweep (re-run of the r3 FLAT result).
  stage autoguide — autoguidance with early-ckpt and short-EMA bad models
      (re-run of the r3 bit-exact no-op).
  stage cfg — class-conditional CFG on the hard fixture's five visually
      distinct classes; class accuracy via the trained extractor's own
      head; plain/rescale/interval variants.

Each stage appends to gallery/evalregime_metrics.json (incremental, so
partial runs survive preemption) and skips itself when its key is already
present (pass --force to re-run).

Usage:
  PYTHONPATH=/root/repo:$PYTHONPATH python tools/capstone_evalregime.py \
      [--stage all] [--smoke] [--force]
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
CKPT = os.path.join(ROOT, "logs", "capstone_evalregime")
GALLERY = os.path.join(ROOT, "gallery")
METRICS = os.path.join(GALLERY, "evalregime_metrics.json")
EXTRACTOR_NPZ = os.path.join(GALLERY, "eval_extractor64.npz")

STAGES = ("extractor", "base", "samplers", "pag", "phema", "autoguide", "cfg")


def _load_metrics():
    if os.path.exists(METRICS):
        with open(METRICS) as f:
            return json.load(f)
    return {}


def _dump(results):
    os.makedirs(GALLERY, exist_ok=True)
    with open(METRICS, "w") as f:
        json.dump(results, f, indent=2)


def _use_smoke_paths():
    """Redirect every artifact to *_smoke paths (CPU end-to-end check)."""
    global METRICS, EXTRACTOR_NPZ, CKPT
    METRICS = METRICS.replace(".json", "_smoke.json")
    EXTRACTOR_NPZ = EXTRACTOR_NPZ.replace(".npz", "_smoke.npz")
    CKPT = CKPT + "_smoke"


class Ctx:
    """Shared config + lazily built fixture/model/extractor handles."""

    def __init__(self, smoke: bool):
        self.smoke = smoke
        if smoke:
            self.size, self.chans, self.tsteps = 8, 32, 100
            self.n_data, self.batch, self.n_eval, self.bs = 256, 16, 32, 16
            self.attn, self.mult = (2,), (1, 2)
            self.train_steps, self.ext_steps, self.cfg_steps = 40, 80, 40
            self.snap_every = 10
            self.ddim_grid = (5,)
            self.pag_scales = (0.0, 2.0)
        else:
            self.size, self.chans, self.tsteps = 64, 64, 1000
            self.n_data, self.batch, self.n_eval, self.bs = 4096, 128, 256, 64
            self.attn, self.mult = (4, 8), (1, 2, 3, 4)
            self.train_steps, self.ext_steps, self.cfg_steps = 6000, 3000, 6000
            self.snap_every = 250
            self.ddim_grid = (10, 50)
            self.pag_scales = (0.0, 0.5, 1.0, 2.0, 3.0)
        self.num_classes = 5
        self._imgs = self._labels = self._ext = None

    # ---- fixture -----------------------------------------------------------
    @property
    def data(self):
        if self._imgs is None:
            from eo_diffusion_tpu.data.datasets import SyntheticEOHard

            ds = SyntheticEOHard(size=self.size, length=self.n_data,
                                 num_classes=self.num_classes,
                                 data_range=(-1.0, 1.0), seed=0)
            self._imgs = np.stack([ds[i]["image"] for i in range(self.n_data)])
            self._labels = np.asarray(
                [int(ds[i]["class"]) for i in range(self.n_data)], np.int32)
        return self._imgs, self._labels

    # ---- model -------------------------------------------------------------
    def unet(self, num_classes: int = 0, dropout: float = 0.0):
        from eo_diffusion_tpu.models.unet import UNet, UNetConfig

        cfg = UNetConfig(image_size=self.size, in_channels=3,
                         model_channels=self.chans, out_channels=3,
                         num_res_blocks=1, attention_resolutions=self.attn,
                         channel_mult=self.mult, num_heads=4,
                         num_classes=num_classes or None,
                         class_dropout_prob=dropout, dtype=jnp.bfloat16)
        model = UNet(cfg)
        kw = {"y": jnp.zeros((1,), jnp.int32)} if num_classes else {}
        params = jax.jit(functools.partial(model.init, **kw))(
            jax.random.PRNGKey(0),
            jnp.zeros((1, self.size, self.size, 3), jnp.float32),
            jnp.zeros((1,), jnp.int32))
        return model, params

    def diffusion(self):
        from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion

        return GaussianDiffusion.create(timesteps=self.tsteps,
                                        image_size=self.size, in_channels=3)

    # ---- extractor ---------------------------------------------------------
    def extractor(self):
        """Feature fn + logits fn from the persisted npz."""
        if self._ext is None:
            from eo_diffusion_tpu.models.feature_cnn import (
                FeatureCNN, FeatureCNNConfig, load_params, make_extractor)

            params, meta = load_params(EXTRACTOR_NPZ)
            widths = tuple(int(w) for w in meta["widths"])
            fcfg = FeatureCNNConfig(in_channels=3, widths=widths,
                                    num_classes=int(meta["num_classes"]))
            fmodel = FeatureCNN(fcfg)
            logits_fn = jax.jit(lambda x: fmodel.apply(params, x)[0])
            self._ext = (make_extractor(params, fcfg), logits_fn)
        return self._ext

    def feats(self, x):
        extract, _ = self.extractor()
        return np.asarray(extract(jnp.asarray(np.clip(x, -1.0, 1.0))))

    def kid_vs_real(self, x, real_feats):
        from eo_diffusion_tpu.utils import metrics as M

        k, ks = M.kid(real_feats, self.feats(x),
                      subset_size=min(100, len(real_feats)))
        return float(k), float(ks)


# ---------------------------------------------------------------------------
# stage: extractor
# ---------------------------------------------------------------------------

def stage_extractor(ctx: Ctx, results: dict):
    from eo_diffusion_tpu.models.feature_cnn import (FeatureCNNConfig,
                                                     save_params,
                                                     train_feature_extractor)
    from eo_diffusion_tpu.utils import metrics as M

    imgs, labels = ctx.data
    widths = (16, 24) if ctx.smoke else (32, 64, 128, 192)
    fcfg = FeatureCNNConfig(in_channels=3, widths=widths,
                            num_classes=ctx.num_classes)
    t0 = time.time()
    params, acc = train_feature_extractor(
        imgs, labels, cfg=fcfg, steps=ctx.ext_steps,
        batch_size=min(128, ctx.batch * 2), seed=0,
        log_every=max(ctx.ext_steps // 10, 1))
    train_s = time.time() - t0
    path = EXTRACTOR_NPZ
    save_params(params, path, meta={
        "widths": np.asarray(widths), "num_classes": ctx.num_classes,
        "size": ctx.size, "data": "synthetic_hard", "seed": 0})
    ctx._ext = None  # force reload from disk

    # degradation-ladder validation: KID must rise with severity
    half = len(imgs) // 2
    real = ctx.feats(imgs[:half])
    test = imgs[half:half + min(512, half)]
    rng = np.random.default_rng(1)

    def blur(x, passes):
        for _ in range(passes):
            x = (np.roll(x, 1, 1) + x + np.roll(x, -1, 1)) / 3
            x = (np.roll(x, 1, 2) + x + np.roll(x, -1, 2)) / 3
        return x.astype(np.float32)

    ladder = {"plain": ctx.kid_vs_real(test, real)[0]}
    for p in (1, 3):
        ladder[f"blur{p}"] = ctx.kid_vs_real(blur(test.copy(), p), real)[0]
    for amp in (0.1, 0.3):
        noised = np.clip(test + rng.normal(0, amp, test.shape), -1, 1)
        ladder[f"noise{amp:g}"] = ctx.kid_vs_real(
            noised.astype(np.float32), real)[0]
    mono = (ladder["plain"] < ladder["blur1"] < ladder["blur3"]
            and ladder["plain"] < ladder["noise0.1"] < ladder["noise0.3"])

    # the old extractor's view of the same ladder, for the record
    old = M.tiny_feature_extractor()
    old_real = np.asarray(old(jnp.asarray(imgs[:half])))
    k_old = lambda x: float(M.kid(old_real, np.asarray(
        old(jnp.asarray(np.clip(x, -1, 1)))))[0])
    ladder_old = {
        "plain": k_old(test), "blur3": k_old(blur(test.copy(), 3)),
        "noise0.3": k_old(np.clip(
            test + rng.normal(0, 0.3, test.shape), -1, 1).astype(np.float32)),
    }

    results["extractor"] = {
        "held_out_acc": float(acc), "train_s": train_s,
        "widths": list(widths), "ladder": ladder, "monotone": bool(mono),
        "ladder_old_extractor": ladder_old, "npz": os.path.basename(path),
    }
    print(f"extractor: acc={acc:.3f} ladder={ladder} monotone={mono}",
          flush=True)
    assert mono or ctx.smoke, "degradation ladder not monotone — harness invalid"


# ---------------------------------------------------------------------------
# stage: base (train DDPM on the hard fixture + saturation check)
# ---------------------------------------------------------------------------

def stage_base(ctx: Ctx, results: dict):
    import optax

    from eo_diffusion_tpu.data.device_cache import DeviceDataCache, gather_batch
    from eo_diffusion_tpu.train.checkpoint import save_checkpoint
    from eo_diffusion_tpu.train.posthoc_ema import PowerEMA
    from eo_diffusion_tpu.train.trainer import TrainState, make_train_step
    from eo_diffusion_tpu.utils.images import save_image_grid

    imgs, _ = ctx.data
    model, params0 = ctx.unet()
    diffusion = ctx.diffusion()
    steps = ctx.train_steps

    sched = optax.warmup_cosine_decay_schedule(
        0.0, 1e-3, min(500, steps // 4 or 1), steps, 1e-5)
    tx = optax.adamw(sched)
    state = TrainState.create(jax.tree.map(jnp.copy, params0), tx)
    apply_fn = (lambda p, xx, tt, cond=None, y=None, train=False,
                dropout_rng=None: model.apply(p, xx, tt, cond=cond, y=y))
    step_fn = make_train_step(diffusion, apply_fn, tx,
                              ema_decay=0.999, ema_every=10)
    pema = PowerEMA()
    tracks = pema.init(state.params)
    cache = DeviceDataCache({"image": imgs})

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def jstep(state, tracks, tensors, rng, i):
        d_rng, s_rng = jax.random.split(rng)
        mb = gather_batch(tensors, d_rng, ctx.batch)
        state, m = step_fn(state, mb, s_rng)
        tracks = pema.update(tracks, state.params, i)
        return state, tracks, m

    rng = jax.random.PRNGKey(1)
    snap_dir = os.path.join(CKPT, "phema")
    t0 = time.time()
    for i in range(steps):
        rng, srng = jax.random.split(rng)
        state, tracks, m = jstep(state, tracks, cache.tensors, srng,
                                 jnp.int32(i))
        if i == 0:
            t0 = time.time()
        if (i + 1) % max(ctx.snap_every, 1) == 0:
            pema.save_snapshots(snap_dir, jax.device_get(tracks), i + 1)
        if (i + 1) == max(steps // 4, 1):  # autoguidance's "worse self"
            save_checkpoint(os.path.join(CKPT, "base"),
                            jax.device_get(state), name="early")
        if (i + 1) % 1000 == 0 or (i + 1) == steps:
            print(f"base step {i+1}/{steps} loss={float(m['loss']):.4f} "
                  f"({(time.time()-t0)/max(i,1)*1e3:.0f} ms/step)",
                  flush=True)
    save_checkpoint(os.path.join(CKPT, "base"), jax.device_get(state),
                    name="final")

    # saturation check: baseline KID must sit well above the data floor
    half = ctx.n_data // 2
    real = ctx.feats(imgs[:half])
    floor, floor_std = ctx.kid_vs_real(imgs[half:], real)
    x = _draw(ctx, model, _ema(ctx), diffusion, num_steps=50)
    base_kid, _ = ctx.kid_vs_real(x, real)
    results["base"] = {
        "steps": steps, "loss_final": float(m["loss"]),
        "kid_floor_data_vs_data": floor, "kid_floor_std": floor_std,
        "kid_ddim50": base_kid,
        "off_floor_ratio": base_kid / max(floor, 1e-9),
    }
    save_image_grid(np.clip((x[:16] + 1) / 2, 0, 1),
                    os.path.join(GALLERY, "evalregime_base_ddim50.png"),
                    nrow=4)
    print(f"base: floor={floor:.3g} ddim50={base_kid:.3g} "
          f"ratio={base_kid/max(floor,1e-9):.1f}x", flush=True)


def _ema(ctx: Ctx, name: str = "final"):
    from eo_diffusion_tpu.train.checkpoint import restore_params

    _, params0 = ctx.unet()
    _, ema = restore_params(os.path.join(CKPT, "base", name), params0)
    return jax.tree.map(jnp.asarray, ema)


def _params_of(ctx: Ctx, name: str):
    """Raw (non-EMA) params of a saved checkpoint."""
    from eo_diffusion_tpu.train.checkpoint import restore_params

    _, params0 = ctx.unet()
    params, _ = restore_params(os.path.join(CKPT, "base", name), params0)
    return jax.tree.map(jnp.asarray, params)


def _draw(ctx: Ctx, model, params, diffusion, num_steps=50, sampler="ddim",
          model_wrap=None, time_and_count=None, **kw):
    """Sample n_eval images in bs chunks; returns float32 [N,H,W,3]."""
    base_fn = lambda x, t, c, y: model.apply(params, x, t, cond=c, y=y)
    fn = model_wrap(base_fn) if model_wrap else base_fn

    if sampler == "ddim":
        run = lambda r: diffusion.ddim_sample(
            fn, r, ctx.bs, num_steps=num_steps, dtype=jnp.bfloat16,
            **kw).x.astype(jnp.float32)
    elif sampler == "dpm":
        from eo_diffusion_tpu.diffusion.dpm_solver import dpm_solver_sample

        run = lambda r: dpm_solver_sample(
            diffusion, fn, r, ctx.bs, num_steps=num_steps,
            dtype=jnp.bfloat16, **kw).x.astype(jnp.float32)
    elif sampler == "unipc":
        from eo_diffusion_tpu.diffusion.unipc import unipc_sample

        run = lambda r: unipc_sample(
            diffusion, fn, r, ctx.bs, num_steps=num_steps,
            dtype=jnp.bfloat16, **kw).x.astype(jnp.float32)
    else:
        raise ValueError(sampler)

    j = jax.jit(run)
    xs, t_draw = [], 0.0
    for i in range(max(ctx.n_eval // ctx.bs, 1)):
        t1 = time.time()
        out = j(jax.random.PRNGKey(300 + i))
        _ = float(jnp.sum(out))  # host fetch: completion through the tunnel
        if i > 0:
            t_draw += time.time() - t1
        xs.append(np.asarray(out))
    if time_and_count is not None:
        nb = max(ctx.n_eval // ctx.bs - 1, 1)
        time_and_count.append((t_draw, nb * ctx.bs))
    return np.concatenate(xs)


# ---------------------------------------------------------------------------
# stage: samplers (UniPC / DPM++ / DDIM at matched NFE)
# ---------------------------------------------------------------------------

def stage_samplers(ctx: Ctx, results: dict):
    imgs, _ = ctx.data
    model, _ = ctx.unet()
    diffusion = ctx.diffusion()
    ema = _ema(ctx)
    real = ctx.feats(imgs[:ctx.n_data // 2])

    grid = ([("ddim", 5), ("dpm", 5), ("unipc", 5)] if ctx.smoke else
            [("ddim", 10), ("dpm", 10), ("unipc", 10),
             ("ddim", 20), ("dpm", 20), ("unipc", 20),
             ("ddim", 50)])
    out = {}
    for sampler, n in grid:
        tc = []
        x = _draw(ctx, model, ema, diffusion, num_steps=n, sampler=sampler,
                  time_and_count=tc, clip=True)
        k, ks = ctx.kid_vs_real(x, real)
        t_draw, cnt = tc[0]
        out[f"{sampler}{n}"] = {
            "kid": k, "kid_std": ks,
            "img_s": cnt / t_draw if t_draw else None,
        }
        print(f"samplers {sampler}{n}: kid={k:.4g}", flush=True)
    results["samplers"] = out
    _dump(results)


# ---------------------------------------------------------------------------
# stage: pag
# ---------------------------------------------------------------------------

def stage_pag(ctx: Ctx, results: dict):
    from eo_diffusion_tpu.diffusion.pag import pag_model_fn
    from eo_diffusion_tpu.utils.images import save_image_grid

    imgs, _ = ctx.data
    model, _ = ctx.unet()
    diffusion = ctx.diffusion()
    ema = _ema(ctx)
    real = ctx.feats(imgs[:ctx.n_data // 2])

    out = {}
    for n in ctx.ddim_grid:
        for s in ctx.pag_scales:
            wrap = (lambda f, _s=s: pag_model_fn(f, _s)) if s > 0 else None
            tc = []
            x = _draw(ctx, model, ema, diffusion, num_steps=n,
                      model_wrap=wrap, time_and_count=tc, clip=True)
            k, ks = ctx.kid_vs_real(x, real)
            t_draw, cnt = tc[0]
            tag = f"ddim{n}_pag{s:g}"
            out[tag] = {"kid": k, "kid_std": ks,
                        "img_s": cnt / t_draw if t_draw else None}
            print(f"pag {tag}: kid={k:.4g}", flush=True)
            if s in (0.0, 2.0) and n == max(ctx.ddim_grid):
                save_image_grid(
                    np.clip((x[:16] + 1) / 2, 0, 1),
                    os.path.join(GALLERY, f"evalregime_{tag}.png"), nrow=4)
    results["pag"] = out
    _dump(results)


# ---------------------------------------------------------------------------
# stage: phema
# ---------------------------------------------------------------------------

def stage_phema(ctx: Ctx, results: dict):
    from eo_diffusion_tpu.train.posthoc_ema import synthesize_from_dir

    imgs, _ = ctx.data
    model, params0 = ctx.unet()
    diffusion = ctx.diffusion()
    real = ctx.feats(imgs[:ctx.n_data // 2])
    snap_dir = os.path.join(CKPT, "phema")

    out = {}
    # train-time EMA 0.999 (the baseline every profile competes against)
    x = _draw(ctx, model, _ema(ctx), diffusion,
              num_steps=max(ctx.ddim_grid), clip=True)
    out["ema0.999"] = {"kid": ctx.kid_vs_real(x, real)[0]}
    # raw final params (no averaging at all — the other end of the spectrum)
    x = _draw(ctx, model, _params_of(ctx, "final"), diffusion,
              num_steps=max(ctx.ddim_grid), clip=True)
    out["raw"] = {"kid": ctx.kid_vs_real(x, real)[0]}
    for sr in (0.05, 0.10, 0.15, 0.25):
        params = synthesize_from_dir(snap_dir, params0, sigma_rel=sr)
        params = jax.tree.map(jnp.asarray, params)
        x = _draw(ctx, model, params, diffusion,
                  num_steps=max(ctx.ddim_grid), clip=True)
        out[f"sigma_rel{sr:g}"] = {"kid": ctx.kid_vs_real(x, real)[0]}
        print(f"phema sigma_rel={sr:g}: kid={out[f'sigma_rel{sr:g}']['kid']:.4g}",
              flush=True)
    kids = {k: v["kid"] for k, v in out.items()}
    spread = max(kids.values()) - min(kids.values())
    out["spread"] = spread
    out["best"] = min(kids, key=kids.get)
    results["phema"] = out
    print(f"phema: {json.dumps(kids)} spread={spread:.4g}", flush=True)
    _dump(results)


# ---------------------------------------------------------------------------
# stage: autoguide
# ---------------------------------------------------------------------------

def stage_autoguide(ctx: Ctx, results: dict):
    from eo_diffusion_tpu.diffusion.autoguide import autoguided_model_fn
    from eo_diffusion_tpu.train.posthoc_ema import synthesize_from_dir

    imgs, _ = ctx.data
    model, params0 = ctx.unet()
    diffusion = ctx.diffusion()
    main = _ema(ctx)
    real = ctx.feats(imgs[:ctx.n_data // 2])

    bads = {"early": _ema(ctx, "early")}
    try:
        bads["shortema"] = jax.tree.map(jnp.asarray, synthesize_from_dir(
            os.path.join(CKPT, "phema"), params0, sigma_rel=0.02))
    except Exception as e:  # snapshots missing in partial runs
        print(f"shortema bad model unavailable: {e}", flush=True)

    n = max(ctx.ddim_grid)
    out = {}
    # w=1 == unguided baseline
    x = _draw(ctx, model, main, diffusion, num_steps=n, clip=True)
    out["w1"] = {"kid": ctx.kid_vs_real(x, real)[0]}
    for bad_name, bad in bads.items():
        # difference between main and bad predictions (no-op guard: the r3
        # sweep was a bit-exact no-op because the pair was identical)
        xq = jnp.asarray(imgs[:8])
        tq = jnp.full((8,), ctx.tsteps // 2, jnp.int32)
        d_main = model.apply(main, xq, tq)
        d_bad = model.apply(bad, xq, tq)
        delta = float(jnp.mean(jnp.abs(d_main - d_bad)))
        for w in ((2.0,) if ctx.smoke else (1.5, 2.0, 3.0)):
            def wrap(fn_main, _bad=bad, _w=w):
                fn_bad = lambda x, t, c, y: model.apply(_bad, x, t, cond=c, y=y)
                return autoguided_model_fn(fn_main, fn_bad, _w)

            x = _draw(ctx, model, main, diffusion, num_steps=n,
                      model_wrap=wrap, clip=True)
            k, _ = ctx.kid_vs_real(x, real)
            out[f"{bad_name}_w{w:g}"] = {"kid": k, "pair_delta": delta}
            print(f"autoguide {bad_name} w={w:g}: kid={k:.4g} "
                  f"(pair delta {delta:.3g})", flush=True)
    results["autoguide"] = out
    _dump(results)


# ---------------------------------------------------------------------------
# stage: cfg (class-conditional + rescale + interval)
# ---------------------------------------------------------------------------

def stage_cfg(ctx: Ctx, results: dict):
    import optax

    from eo_diffusion_tpu.data.device_cache import DeviceDataCache, gather_batch
    from eo_diffusion_tpu.train.checkpoint import restore_params, save_checkpoint
    from eo_diffusion_tpu.train.trainer import TrainState, make_train_step
    from eo_diffusion_tpu.utils.images import save_image_grid

    imgs, labels = ctx.data
    dropout = 0.15
    model, params0 = ctx.unet(num_classes=ctx.num_classes, dropout=dropout)
    diffusion = ctx.diffusion()
    ck = os.path.join(CKPT, "cfg")
    steps = ctx.cfg_steps

    if not os.path.exists(os.path.join(ck, "final")):
        sched = optax.warmup_cosine_decay_schedule(
            0.0, 1e-3, min(500, steps // 4 or 1), steps, 1e-5)
        # grad clip: the class-conditional 64px model diverges right when
        # warmup reaches 1e-3 (measured: loss 0.042@400 -> 1.02@500 with
        # |params| blowing up); the unconditional base does not
        tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(sched))
        state = TrainState.create(jax.tree.map(jnp.copy, params0), tx)
        apply_fn = (lambda p, xx, tt, cond=None, y=None, train=False,
                    dropout_rng=None: model.apply(p, xx, tt, cond=cond, y=y))
        step_fn = make_train_step(diffusion, apply_fn, tx, ema_decay=0.999,
                                  ema_every=10, class_conditional=True,
                                  class_dropout_prob=dropout,
                                  num_classes=ctx.num_classes)
        cache = DeviceDataCache({"image": imgs, "label": labels})

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
                print(f"cfg step {i+1}/{steps} loss={float(m['loss']):.4f} "
                      f"({(time.time()-t0)/max(i,1)*1e3:.0f} ms/step)",
                      flush=True)
        save_checkpoint(ck, jax.device_get(state), name="final")
    _, ema = restore_params(os.path.join(ck, "final"), params0)
    ema = jax.tree.map(jnp.asarray, ema)

    real = ctx.feats(imgs[:ctx.n_data // 2])
    _, logits_fn = ctx.extractor()
    bs = ctx.bs - (ctx.bs % ctx.num_classes)
    y_eval = jnp.asarray(np.tile(np.arange(ctx.num_classes),
                                 bs // ctx.num_classes))
    y_null = jnp.full((bs,), ctx.num_classes, jnp.int32)

    def measure(tag, **kw):
        def run(r):
            fn = lambda x, t, c, y: model.apply(ema, x, t, cond=c, y=y)
            return diffusion.ddim_sample(
                fn, r, bs, num_steps=max(ctx.ddim_grid), y=y_eval,
                dtype=jnp.bfloat16, clip=True, **kw).x.astype(jnp.float32)

        j = jax.jit(run)
        xs = [np.asarray(j(jax.random.PRNGKey(500 + i)))
              for i in range(max(ctx.n_eval // bs, 1))]
        x = np.concatenate(xs)
        yy = np.tile(np.asarray(y_eval), len(xs))
        pred = np.argmax(np.asarray(logits_fn(
            jnp.asarray(np.clip(x, -1, 1)))), -1)
        acc = float((pred == yy).mean())
        k, _ = ctx.kid_vs_real(x, real)
        out[tag] = {"class_acc": acc, "kid": k}
        print(f"cfg {tag}: acc={acc:.3f} kid={k:.4g}", flush=True)
        return x

    out = {"dropout": dropout}
    scales = (1.0, 2.0) if ctx.smoke else (1.0, 1.5, 2.0, 3.0, 4.0)
    for s in scales:
        kw = {} if s == 1.0 else dict(guidance_scale=s, y_uncond=y_null)
        x = measure(f"scale{s:g}", **kw)
        if s in (1.0, 2.0):
            save_image_grid(
                np.clip((x[:ctx.num_classes * 3] + 1) / 2, 0, 1),
                os.path.join(GALLERY, f"evalregime_cfg_s{s:g}.png"),
                nrow=ctx.num_classes)
    if not ctx.smoke:
        s = 4.0
        measure("scale4_rescale0.7", guidance_scale=s, y_uncond=y_null,
                guidance_rescale=0.7)
        measure("scale4_interval", guidance_scale=s, y_uncond=y_null,
                guidance_interval=(0.17, 1.0))
    results["cfg"] = out
    _dump(results)


# ---------------------------------------------------------------------------

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all",
                    choices=STAGES + ("all",))
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    if args.smoke:
        _use_smoke_paths()
    ctx = Ctx(args.smoke)
    results = _load_metrics()

    stages = STAGES if args.stage == "all" else (args.stage,)
    fns = {"extractor": stage_extractor, "base": stage_base,
           "samplers": stage_samplers, "pag": stage_pag,
           "phema": stage_phema, "autoguide": stage_autoguide,
           "cfg": stage_cfg}
    for s in stages:
        if s in results and not args.force:
            print(f"stage {s}: already recorded, skipping (--force to redo)")
            continue
        print(f"=== stage {s} ===", flush=True)
        fns[s](ctx, results)
        _dump(results)
    print(f"wrote {METRICS}")


if __name__ == "__main__":
    main()
