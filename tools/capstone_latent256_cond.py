"""Conditional latent256 capstone: a thesis use-case AT the production
config (VERDICT r4 next-round item 2).

Cloud removal — the reference's flagship application
(/root/reference/README.md:13-22, diffusion/model.py:47-75 RePaint-sum) —
run through the latent256 production stack: the cloudy 256px view is
first-stage-encoded and channel-concatenated to the noisy latent
(cond_type="concat" semantics, train+sample), and a DiT-B/4 rectified flow
is trained on the 64x64x4 latent grid to transport noise -> clean latent
given the cloudy latent.

Pipeline (resumable per-stage via gallery/latent256_cond_metrics.json):

  1. encode — paired fixture (SyntheticEOHard with_cond_image=True) pushed
     ONCE through the trained f4 AE (tools/capstone_latent256.py's first
     stage): clean + cloudy latent sets, host arrays.
  2. dit    — conditional DiT-B/4 (in 8ch = 4 noisy + 4 cond) flow-matching
     on device-resident latent pairs (index-only feeds, CLAUDE.md RSS
     leak).
  3. eval   — HELD-OUT pairs (fresh seed): heun-16/8 + euler-2 sampling,
     f4 decode, paired SSIM/PSNR vs the clean GT + KID under the tiled
     256px extractor + decoded img/s. Baselines: identity (cloudy-as-
     prediction) on the same pairs, and the r4 pixel-space RePaint numbers
     (gallery/capstone256_metrics.json: DDIM-50 SSIM 0.839 @ 2.1 img/s on
     the plain fixture — different fixture, quoted not re-run).

The `latent256-cr` preset serves the same recipe through cli.train /
cli.inference / cli.serve (tiny CPU round trip: tests/test_cli.py).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/capstone_latent256_cond.py \
           [--stage all|encode|dit|eval] [--smoke] [--force]
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
import capstone_latent256 as cl  # shared Ctx: extractor, AE/DiT configs

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GALLERY = os.path.join(ROOT, "gallery")

STAGES = ("encode", "dit", "eval", "serve")


class CCtx:
    def __init__(self, smoke: bool):
        self.base = cl.Ctx(smoke)
        self.smoke = smoke
        if smoke:
            self.dit_steps, self.batch = 30, 16
            self.n_eval, self.bs = 32, 16
        else:
            self.dit_steps, self.batch = 16000, 32
            self.n_eval, self.bs = 256, 32
        # 3e-4: the first chip run at the unconditional stack's 1e-3 was
        # healthy to 5k steps (loss 0.19) then blew up to ~1.6 and never
        # recovered, WITH clip_by_global_norm(1.0) — the conditional
        # (in 8ch) latent DiT needs the gentler peak (cf. CLAUDE.md's
        # conditional-divergence gotcha for eps-DDPM at 64px)
        self.lr = 3e-4
        self.ckpt = cl.CKPT

    @property
    def pairs_npz(self):
        return os.path.join(self.ckpt, "cond_latents.npz")

    @property
    def cond_dir(self):
        return os.path.join(self.ckpt, "cond")

    def cond_dit(self):
        """DiT with the cond latent concatenated: in 2*zc, out zc."""
        from eo_diffusion_tpu.models.dit import DiT, DiTConfig

        b = self.base
        cfg = DiTConfig(image_size=b.lat, in_channels=2 * b.zc,
                        out_channels=b.zc, patch_size=b.patch,
                        hidden_size=b.hidden, depth=b.depth,
                        num_heads=b.heads, dtype=jnp.bfloat16)
        return DiT(cfg)

    def paired_fixture(self, seed: int, n: int):
        """(clean, cloudy) 256px pairs from the hard fixture generator."""
        from eo_diffusion_tpu.data.datasets import SyntheticEOHard

        b = self.base
        ds = SyntheticEOHard(size=b.size, length=n, data_range=(-1.0, 1.0),
                             seed=seed, with_cond_image=True)
        t0 = time.time()
        clean = np.stack([ds[i]["image"] for i in range(n)])
        cloudy = np.stack([ds[i]["cond_image"] for i in range(n)])
        print(f"paired fixture seed={seed}: {n}x{b.size}px in "
              f"{time.time()-t0:.0f}s", flush=True)
        return clean, cloudy


def _encoder(ctx):
    from eo_diffusion_tpu.train.ae_trainer import load_ae

    ae_model, ae_params, scale = load_ae(os.path.join(ctx.ckpt, "ae"))
    ae_params = jax.tree.map(jnp.asarray, ae_params)
    enc = jax.jit(lambda p, x: ae_model.apply(p, x, method="encode"))

    def encode(x):
        zs = []
        for s in range(0, len(x), 32):
            zs.append(np.asarray(enc(ae_params, jnp.asarray(x[s:s + 32]))))
        return np.concatenate(zs) * scale

    return encode, (ae_model, ae_params, scale)


def stage_encode(ctx, results):
    b = ctx.base
    clean, cloudy = ctx.paired_fixture(seed=0, n=b.n_data)
    encode, _ = _encoder(ctx)
    z_clean = encode(clean)
    z_cloudy = encode(cloudy)
    np.savez(ctx.pairs_npz, z_clean=z_clean.astype(np.float32),
             z_cloudy=z_cloudy.astype(np.float32))
    results["encode"] = {"n": int(len(z_clean)),
                         "z_clean_std": float(z_clean.std()),
                         "z_cloudy_std": float(z_cloudy.std())}
    print(f"encoded {z_clean.shape} pairs "
          f"(clean std {z_clean.std():.3f}, cloudy std {z_cloudy.std():.3f})",
          flush=True)


def stage_dit(ctx, results):
    import optax

    from eo_diffusion_tpu.train.checkpoint import save_checkpoint
    from eo_diffusion_tpu.train.trainer import TrainState, make_train_step

    b = ctx.base
    with np.load(ctx.pairs_npz) as z:
        z_clean = jnp.asarray(z["z_clean"])
        z_cloudy = jnp.asarray(z["z_cloudy"])
    model = ctx.cond_dit()
    flow = b.flow()
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, b.lat, b.lat, 2 * b.zc)),
        jnp.zeros((1,), jnp.int32))
    n_params = sum(p.size for p in jax.tree.leaves(params))
    print(f"cond latent DiT: {n_params/1e6:.1f} M params", flush=True)

    steps = ctx.dit_steps
    sched = optax.warmup_cosine_decay_schedule(0.0, ctx.lr,
                                               min(500, steps // 4 or 1),
                                               steps, 1e-5)
    # conditional trainings at warmup peak need the global-norm clip
    # (measured divergence, CLAUDE.md "machine gotchas")
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(sched))
    state = TrainState.create(params, tx)
    apply_fn = (lambda p, xx, tt, cond=None, y=None, train=False,
                dropout_rng=None: model.apply(p, xx, tt, cond=cond, y=y))
    step_fn = make_train_step(flow, apply_fn, tx, ema_decay=0.999,
                              ema_every=10, use_cond=True)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def jstep(state, zc_all, zy_all, idx, rng):
        return step_fn(state, {"image": zc_all[idx], "cond": zy_all[idx]},
                       rng)

    rng = jax.random.PRNGKey(2)
    rnp = np.random.default_rng(1)
    t0 = time.time()
    for i in range(steps):
        rng, srng = jax.random.split(rng)
        idx = jnp.asarray(rnp.integers(0, z_clean.shape[0], ctx.batch))
        state, m = jstep(state, z_clean, z_cloudy, idx, srng)
        if i == 0:
            t0 = time.time()
        if (i + 1) % max(steps // 32, 1) == 0:
            print(f"dit {i+1}/{steps} loss={float(m['loss']):.4f} "
                  f"({(time.time()-t0)/max(i,1)*1e3:.0f} ms/step)",
                  flush=True)
    save_checkpoint(ctx.cond_dir, jax.device_get(state), name="final")
    results["dit"] = {"steps": steps, "loss_final": float(m["loss"]),
                      "params_m": n_params / 1e6,
                      "ms_per_step": (time.time() - t0) / max(steps - 1, 1)
                      * 1e3}


def stage_eval(ctx, results):
    from eo_diffusion_tpu.train.checkpoint import restore_params
    from eo_diffusion_tpu.utils import metrics as M
    from eo_diffusion_tpu.utils.images import save_image_grid

    b = ctx.base
    imgs, _ = b.data  # clean train-side fixture: the KID real side
    half = b.n_data // 2
    real = b.feats(imgs[:half])

    clean, cloudy = ctx.paired_fixture(seed=7, n=ctx.n_eval)  # held-out
    encode, (ae_model, ae_params, scale) = _encoder(ctx)
    z_cloudy = encode(cloudy)

    model = ctx.cond_dit()
    flow = b.flow()
    template = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, b.lat, b.lat, 2 * b.zc)),
        jnp.zeros((1,), jnp.int32))
    _, ema = restore_params(os.path.join(ctx.cond_dir, "final"), template)
    ema = jax.tree.map(jnp.asarray, ema)

    def run(p, ap, zc, r, num_steps, method):
        z = flow.sample(
            lambda x, t, c, y: model.apply(p, x, t, cond=c, y=y), r,
            zc.shape[0], num_steps=num_steps, method=method, cond=zc,
            dtype=jnp.bfloat16).x
        return ae_model.apply(ap, z / scale,
                              method="decode").astype(jnp.float32)

    # paired identity baseline: the cloudy input scored as the prediction
    dr = 2.0  # data_range (-1, 1)
    out = {"identity_baseline": {
        "ssim": float(jnp.mean(M.ssim(jnp.asarray(cloudy),
                                      jnp.asarray(clean), data_range=dr))),
        "psnr": float(jnp.mean(M.psnr(jnp.asarray(cloudy),
                                      jnp.asarray(clean), data_range=dr)))}}
    print(f"identity: ssim={out['identity_baseline']['ssim']:.3f} "
          f"psnr={out['identity_baseline']['psnr']:.2f}", flush=True)

    grid = ([("euler", 2)] if ctx.smoke else
            [("euler", 2), ("heun", 8), ("heun", 16)])
    for method, n in grid:
        j = jax.jit(functools.partial(run, num_steps=n, method=method))
        xs, t_draw = [], 0.0
        for i in range(max(ctx.n_eval // ctx.bs, 1)):
            zc = jnp.asarray(z_cloudy[i * ctx.bs:(i + 1) * ctx.bs])
            t1 = time.time()
            x = j(ema, ae_params, zc, jax.random.PRNGKey(900 + i))
            _ = float(jnp.sum(x))
            if i > 0:
                t_draw += time.time() - t1
            xs.append(np.asarray(x))
        x = np.concatenate(xs)
        gt = clean[:len(x)]
        k, ks = b.kid_vs(x, real)
        tag = f"{method}{n}"
        nb = max(ctx.n_eval // ctx.bs - 1, 1)
        out[tag] = {
            "ssim": float(jnp.mean(M.ssim(jnp.asarray(x), jnp.asarray(gt),
                                          data_range=dr))),
            "psnr": float(jnp.mean(M.psnr(jnp.asarray(x), jnp.asarray(gt),
                                          data_range=dr))),
            "kid": k, "kid_std": ks,
            "img_s": nb * ctx.bs / t_draw if t_draw else None}
        print(f"eval {tag}: ssim={out[tag]['ssim']:.3f} "
              f"psnr={out[tag]['psnr']:.2f} kid={k:.4g} "
              f"{out[tag]['img_s'] or 0:.1f} img/s", flush=True)
        if (method, n) in (("heun", 8), ("euler", 2)):
            sfx = "_smoke" if ctx.smoke else ""
            panel = np.clip((np.concatenate(
                [cloudy[:6], x[:6], gt[:6]]) + 1) / 2, 0, 1)
            save_image_grid(panel, os.path.join(
                GALLERY, f"latent256_cond_{tag}{sfx}.png"), nrow=6)
    # quoted pixel-space reference (different fixture; not re-run here)
    try:
        with open(os.path.join(GALLERY, "capstone256_metrics.json")) as f:
            out["pixel_repaint_ref"] = json.load(f)["ddim50"]
    except (OSError, KeyError):
        pass
    results["eval"] = out


def stage_serve(ctx, results):
    """Cloud removal as a service: the trained conditional latent256 model
    behind the batching engine — the request carries the cloudy PIXEL view;
    the engine first-stage-encodes it (cli/serve.py latent-concat path)."""
    from eo_diffusion_tpu.cli import serve as serve_cli
    from eo_diffusion_tpu.utils import metrics as M

    preset = "tiny-latent-cr" if ctx.smoke else "latent256-cr"
    sargs = serve_cli.parse_args([
        "--preset", preset, "--ckpt", os.path.join(ctx.cond_dir, "final"),
        "--ae_ckpt", os.path.join(ctx.ckpt, "ae"),
        # euler-2 IS the production pick (best paired SSIM in the eval
        # table) and keeps the cold sampler compile small; the heun-8
        # engine program took >20 min through the remote-compile service
        "--sampler", "flow", "--flow_method", "euler", "--sampler_steps",
        "2", "--batch_size", "4", "--seed", "0",
        "--request_timeout", "1800"]
        + (["--no_bf16", "--image_size", "32"] if ctx.smoke else []))
    _, batcher, _ = serve_cli.build_engine(sargs)
    try:
        clean, cloudy = ctx.paired_fixture(seed=9, n=4)
        arr = np.asarray(batcher.submit(4, cond=cloudy, seed=1))
        assert np.isfinite(arr).all() and arr.shape[0] == 4, arr.shape
        dr = 2.0
        ssim_out = float(M.ssim(jnp.asarray(arr), jnp.asarray(clean),
                                data_range=dr))
        ssim_id = float(M.ssim(jnp.asarray(cloudy), jnp.asarray(clean),
                               data_range=dr))
    finally:
        batcher.shutdown()
    results["serve"] = {"shape": list(arr.shape), "ssim": ssim_out,
                        "identity_ssim": ssim_id}
    print(f"serve: cloud removal over HTTP-engine path, ssim={ssim_out:.3f} "
          f"(identity {ssim_id:.3f})", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all", choices=STAGES + ("all",))
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--dit_steps", type=int, default=0)
    ap.add_argument("--lr", type=float, default=0.0)
    args = ap.parse_args()

    metrics_path = os.path.join(
        GALLERY, "latent256_cond_metrics"
        + ("_smoke" if args.smoke else "") + ".json")
    if args.smoke:
        cl.METRICS = cl.METRICS.replace(".json", "_smoke.json")
        cl.EXT_NPZ = cl.EXT_NPZ.replace(".npz", "_smoke.npz")
        cl.CKPT = cl.CKPT + "_smoke"

    ctx = CCtx(args.smoke)
    ctx.ckpt = cl.CKPT
    if args.dit_steps:
        ctx.dit_steps = args.dit_steps
    if args.lr:
        ctx.lr = args.lr

    results = {}
    if os.path.exists(metrics_path):
        with open(metrics_path) as f:
            results = json.load(f)
    fns = {"encode": stage_encode, "dit": stage_dit, "eval": stage_eval,
           "serve": stage_serve}
    for s in (STAGES if args.stage == "all" else (args.stage,)):
        if s in results and not args.force:
            print(f"stage {s}: already recorded, skipping")
            continue
        print(f"=== stage {s} ===", flush=True)
        fns[s](ctx, results)
        os.makedirs(GALLERY, exist_ok=True)
        with open(metrics_path, "w") as f:
            json.dump(results, f, indent=2)
    print(f"wrote {metrics_path}")


if __name__ == "__main__":
    main()
