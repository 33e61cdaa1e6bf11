"""Round-3 capstone: post-hoc EMA sweep + ToMe quality/speed, trained.

Two of the session's beyond-reference features grounded in chip
measurements on one trained model:

A. **Post-hoc EMA** (train/posthoc_ema.py, arXiv:2312.02696): train a
   DiT-S/4 on the synthetic EO set while maintaining the two power-EMA
   tracks + periodic snapshots, then *after* training synthesize a grid of
   EMA lengths (sigma_rel 0.02..0.15) and KID-score each — the curve the
   feature exists to expose (one run, every EMA length), with the classic
   baked-in EMA-0.999 and the raw params as baselines.

B. **ToMe** (ops/tome.py, arXiv:2303.17604): on the best checkpoint from
   A, sample with token-merge ratios 0/0.25/0.375/0.5 (attn+mlp) and
   KID-score each — the quality side of the training-free speedup; the
   speed side is measured at the 256px DiT-B/8 protocol (1024 -> 640/512
   tokens) with the same code path (bench.py's dit_tome rider tracks the
   headline configuration).

Writes gallery/tome_phema64_metrics.json + sample grids.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/capstone_tome_phema.py \
           [--steps 6000] [--skip_train] [--smoke]
"""

from __future__ import annotations

import argparse
import dataclasses
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
CKPT = os.path.join(ROOT, "logs", "capstone_tome_phema")
GALLERY = os.path.join(ROOT, "gallery")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU config to exercise the script end-to-end")
    args = ap.parse_args()

    import optax

    from eo_diffusion_tpu.data.datasets import SyntheticEO
    from eo_diffusion_tpu.data.device_cache import DeviceDataCache, gather_batch
    from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from eo_diffusion_tpu.models.dit import DiT, DiTConfig, dit_b, dit_s
    from eo_diffusion_tpu.train.checkpoint import restore_params, save_checkpoint
    from eo_diffusion_tpu.train.posthoc_ema import (PowerEMA, load_snapshots,
                                                    sigma_rel_to_gamma,
                                                    solve_weights, synthesize)
    from eo_diffusion_tpu.train.trainer import TrainState, make_train_step
    from eo_diffusion_tpu.utils import metrics as M
    from eo_diffusion_tpu.utils.images import save_image_grid

    if args.smoke:
        size, patch, batch, tsteps, ddim_s, n_eval, n_data = 16, 2, 16, 100, 5, 32, 256
        args.steps = min(args.steps, 40)
        snap_every, sigma_rels = 10, (0.05, 0.10)
        ratios = (0.0, 0.25)
        speed_cfgs = ()
    else:
        size, patch, batch, tsteps, ddim_s, n_eval, n_data = 64, 4, 128, 1000, 50, 256, 2048
        snap_every, sigma_rels = 500, (0.02, 0.05, 0.10, 0.15)
        ratios = (0.0, 0.25, 0.375, 0.5)
        speed_cfgs = (0.0, 0.25, 0.375, 0.5)

    os.makedirs(CKPT, exist_ok=True)
    phema_dir = os.path.join(CKPT, "phema")
    ds = SyntheticEO(size=size, length=n_data, with_mask=False)
    imgs = np.stack([ds[i]["image"] for i in range(n_data)]).astype(np.float32)
    imgs = imgs * 2.0 - 1.0  # SyntheticEO emits [0,1]

    cfg = (dit_s(size, patch_size=patch, dtype=jnp.bfloat16) if not args.smoke
           else DiTConfig(image_size=size, in_channels=3, out_channels=3,
                          patch_size=patch, hidden_size=32, depth=2,
                          num_heads=4, dtype=jnp.bfloat16))
    model = DiT(cfg)
    diffusion = GaussianDiffusion.create(timesteps=tsteps, image_size=size,
                                         in_channels=3)
    x0 = jnp.zeros((1, size, size, 3), jnp.float32)
    params0 = jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                                  jnp.zeros((1,), jnp.int32))

    phema = PowerEMA()
    if not args.skip_train:
        sched = optax.warmup_cosine_decay_schedule(
            0.0, 1e-3, min(500, args.steps // 4), args.steps, 1e-5)
        tx = optax.adamw(sched)
        state = TrainState.create(jax.tree.map(jnp.copy, params0), tx)
        apply_fn = (lambda p, xx, tt, cond=None, y=None, train=False,
                    dropout_rng=None: model.apply(p, xx, tt, cond=cond, y=y))
        step_fn = make_train_step(diffusion, apply_fn, tx,
                                  ema_decay=0.999, ema_every=10)
        cache = DeviceDataCache({"image": imgs})

        @functools.partial(jax.jit, donate_argnums=(0,))
        def fused_step(state, tensors, rng):
            d_rng, s_rng = jax.random.split(rng)
            mb = gather_batch(tensors, d_rng, batch)
            return step_fn(state, mb, s_rng)

        tracks = phema.init(state.params)
        phema_update = jax.jit(phema.update)
        rng = jax.random.PRNGKey(1)
        t0 = time.time()
        for i in range(args.steps):
            rng, srng = jax.random.split(rng)
            state, m = fused_step(state, cache.tensors, srng)
            tracks = phema_update(tracks, state.params, jnp.asarray(i))
            if i == 0:
                t0 = time.time()
            if (i + 1) % snap_every == 0:
                phema.save_snapshots(phema_dir, jax.device_get(tracks), i)
            if (i + 1) % 1000 == 0:
                print(f"step {i+1}/{args.steps} loss={float(m['loss']):.4f} "
                      f"({(time.time()-t0)/i*1e3:.0f} ms/step)", flush=True)
        save_checkpoint(CKPT, jax.device_get(state), name="final")

    params, ema999 = restore_params(os.path.join(CKPT, "final"), params0)
    extractor = M.tiny_feature_extractor()
    real_feats = np.asarray(extractor(jnp.asarray(imgs[:512])))
    bs = min(64, n_eval)

    def kid_of(p, tome_ratio=0.0, sampler="ddim", steps=None, fn_override=None):
        m = (model if not tome_ratio else
             DiT(dataclasses.replace(cfg, tome_ratio=tome_ratio,
                                     tome_mlp=True)))
        steps = ddim_s if steps is None else steps

        def run(p, rng):
            fn = (fn_override if fn_override is not None
                  else lambda x, t, c, y: m.apply(p, x, t, cond=c, y=y))
            sample = (diffusion.unipc_sample if sampler == "unipc"
                      else diffusion.ddim_sample)
            return sample(fn, rng, bs, num_steps=steps,
                          dtype=jnp.bfloat16).x.astype(jnp.float32)

        j = jax.jit(run)
        xs = [np.asarray(j(p, jax.random.PRNGKey(300 + i)))
              for i in range(max(n_eval // bs, 1))]
        x = np.concatenate(xs)
        feats = np.asarray(extractor(jnp.asarray(np.clip(x, -1, 1))))
        k, _ = M.kid(real_feats, feats)
        return float(k), x

    results = {"steps": args.steps, "ddim_steps": ddim_s, "size": size}

    # A: the post-hoc EMA curve
    trees, meta = load_snapshots(phema_dir, params)
    t_final = max(t for t, _ in meta)
    curve = {}
    kid_raw, _ = kid_of(params)
    kid_ema, x_ema = kid_of(ema999)
    curve["raw"], curve["ema_0.999"] = kid_raw, kid_ema
    best = ("ema_0.999", kid_ema, ema999)
    for sr in sigma_rels:
        w = solve_weights(meta, sigma_rel_to_gamma(sr), t_final)
        p_sr = synthesize(trees, w)
        k, x = kid_of(p_sr)
        curve[f"sigma_rel_{sr}"] = k
        print(f"phema sigma_rel={sr}: KID {k:.5f}", flush=True)
        if k < best[1]:
            best = (f"sigma_rel_{sr}", k, p_sr)
    results["phema_kid"] = curve
    results["phema_best"] = {"tag": best[0], "kid": best[1]}
    print("phema curve:", json.dumps(curve), flush=True)
    save_image_grid(np.clip((x_ema[:16] + 1) / 2, 0, 1),
                    os.path.join(GALLERY, "tome_phema64_ema.png"), nrow=4)

    # B: ToMe quality on the best params
    tome_q = {}
    for r in ratios:
        k, x = kid_of(best[2], tome_ratio=r)
        tome_q[f"ratio_{r}"] = k
        print(f"tome ratio={r}: KID {k:.5f}", flush=True)
        if r in (0.0, max(ratios)):
            save_image_grid(
                np.clip((x[:16] + 1) / 2, 0, 1),
                os.path.join(GALLERY, f"tome_phema64_tome{r}.png"), nrow=4)
    results["tome_kid"] = tome_q

    # Autoguidance (diffusion/autoguide.py, arXiv:2406.02507): the phema
    # snapshots give degraded variants for free — guide the best params
    # away from the shortest-EMA synthesis and KID the result
    if not args.smoke:
        from eo_diffusion_tpu.diffusion.autoguide import autoguided_model_fn

        # the degraded variant must be DISTINCT from the guided model: when
        # the shortest-EMA synthesis itself won the phema sweep (measured in
        # the 2026-08-19 rerun: best == sigma_rel_0.02 made the guided
        # combine a bit-exact no-op), fall back to the raw late params (the
        # EMA-length -> 0 limit, the paper's same degradation direction)
        bad_tag = f"sigma_rel_{min(sigma_rels)}"
        if best[0] == bad_tag:
            p_bad, bad_tag = params, "raw"
        else:
            w_bad = solve_weights(meta, sigma_rel_to_gamma(min(sigma_rels)),
                                  t_final)
            p_bad = synthesize(trees, w_bad)
        fn_main = lambda x, t, c, y: model.apply(best[2], x, t, cond=c, y=y)
        fn_bad = lambda x, t, c, y: model.apply(p_bad, x, t, cond=c, y=y)
        ag = {}
        for w in (1.0, 1.5, 2.0):
            fn = (fn_main if w == 1.0
                  else autoguided_model_fn(fn_main, fn_bad, w,
                                           timesteps=tsteps))
            k, _ = kid_of(best[2], fn_override=fn)
            ag[f"scale_{w}"] = k
            print(f"autoguide w={w}: KID {k:.5f}", flush=True)
        ag["bad_model"] = bad_tag
        results["autoguide_kid"] = ag

    # UniPC few-step frontier on the same trained model (diffusion/unipc.py)
    if not args.smoke:
        from eo_diffusion_tpu.utils.metrics import gradient_energy

        upc = {}
        for tag, sampler, steps in [("ddim_10", "ddim", 10),
                                    ("unipc_10", "unipc", 10),
                                    ("ddim_50", "ddim", 50)]:
            k, x = kid_of(best[2], sampler=sampler, steps=steps)
            upc[tag] = {"kid": k, "grad": gradient_energy(np.clip(x, -1, 1))}
            print(f"sampler {tag}: KID {k:.5f} grad {upc[tag]['grad']:.4f}",
                  flush=True)
        upc["data_grad"] = gradient_energy(imgs[:256])
        results["sampler_kid"] = upc

    # C: ToMe speed at the 256px DiT-B/8 protocol (random params — timing
    # is parameter-independent; quality is B's job at the trained scale)
    if speed_cfgs:
        bcfg = dit_b(256, dtype=jnp.bfloat16)
        bx0 = jnp.zeros((1, 256, 256, 3), jnp.bfloat16)
        bparams = jax.jit(DiT(bcfg).init)(jax.random.PRNGKey(0), bx0,
                                          jnp.zeros((1,), jnp.int32))
        bdiff = GaussianDiffusion.create(timesteps=1000, image_size=256,
                                         in_channels=3)
        speed = {}
        for r in speed_cfgs:
            bm = DiT(dataclasses.replace(bcfg, tome_ratio=r, tome_mlp=True))

            def srun(p, rng):
                fn = lambda x, t, c, y: bm.apply(p, x, t, cond=c, y=y)
                out = bdiff.ddim_sample(fn, rng, 8, num_steps=50,
                                        dtype=jnp.bfloat16)
                return jnp.float32(jnp.sum(out.x))

            js = jax.jit(srun)
            float(js(bparams, jax.random.PRNGKey(0)))
            t0 = time.time()
            for i in range(3):
                float(js(bparams, jax.random.PRNGKey(i)))
            speed[f"ratio_{r}"] = round(8 / ((time.time() - t0) / 3), 3)
            print(f"tome 256px speed ratio={r}: "
                  f"{speed[f'ratio_{r}']} img/s", flush=True)
        results["tome_256_img_s"] = speed

    out = os.path.join(GALLERY, "tome_phema64_metrics.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
