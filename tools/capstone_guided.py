"""Guided-distillation capstone (VERDICT r4 item 3, arXiv:2210.03142).

Measures the whole claim on-chip under the discriminative eval regime:

  1. teacher — class-conditional rectified flow (cflow64 arch) trained with
     CFG label dropout on SyntheticEOHard; quality swept over guidance
     scale w at heun-8 (KID + class accuracy via the trained extractor's
     head) to pick the operating point. Every guided teacher call costs a
     DOUBLED batch (cfg_double_inputs).
  2. student — `cli.distill --method guided` machinery inline: couplings
     from the guided ODE (cfg_model_fn), class-conditional re-fit. The
     student samples the SAME guided distribution with ONE unguided call
     per step, at 1-4 Euler steps.
  3. verdict — student-vs-teacher KID/accuracy at matched compute, plus
     measured img/s for teacher-CFG-heun8 vs student-euler{1,2,4} (the
     "no batch-doubling" claim as a number).

Needs gallery/eval_extractor64.npz (capstone_evalregime stage extractor).
Writes gallery/guided64_metrics.json + grids.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/capstone_guided.py \
           [--steps 6000] [--refit_steps 3000] [--w 3.0] [--smoke]
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
CKPT = os.path.join(ROOT, "logs", "capstone_guided")
GALLERY = os.path.join(ROOT, "gallery")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--refit_steps", type=int, default=3000)
    ap.add_argument("--n_pairs", type=int, default=4096)
    ap.add_argument("--w", type=float, default=3.0)
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    import optax

    from eo_diffusion_tpu.data.datasets import SyntheticEOHard
    from eo_diffusion_tpu.data.device_cache import DeviceDataCache, gather_batch
    from eo_diffusion_tpu.diffusion.distill import cfg_model_fn, generate_couplings
    from eo_diffusion_tpu.diffusion.flow import FlowMatching
    from eo_diffusion_tpu.models.feature_cnn import (FeatureCNNConfig,
                                                     FeatureCNN, load_params,
                                                     make_extractor)
    from eo_diffusion_tpu.models.unet import UNet, UNetConfig
    from eo_diffusion_tpu.train.checkpoint import restore_params, save_checkpoint
    from eo_diffusion_tpu.train.trainer import TrainState, make_train_step
    from eo_diffusion_tpu.utils import metrics as M
    from eo_diffusion_tpu.utils.images import save_image_grid

    if args.smoke:
        size, chans, n_data, batch, n_eval, bs = 8, 32, 256, 16, 32, 16
        attn, mult = (2,), (1, 2)
        args.steps = min(args.steps, 30)
        args.refit_steps = min(args.refit_steps, 20)
        args.n_pairs = min(args.n_pairs, 64)
        pair_steps, teacher_steps = 4, 4
        ext_path = os.path.join(GALLERY, "eval_extractor64_smoke.npz")
        metrics_path = os.path.join(GALLERY, "guided64_metrics_smoke.json")
        ckpt = CKPT + "_smoke"
    else:
        size, chans, n_data, batch, n_eval, bs = 64, 64, 4096, 128, 256, 64
        attn, mult = (4, 8), (1, 2, 3, 4)
        pair_steps, teacher_steps = 16, 8
        ext_path = os.path.join(GALLERY, "eval_extractor64.npz")
        metrics_path = os.path.join(GALLERY, "guided64_metrics.json")
        ckpt = CKPT

    N_CLASSES, DROPOUT = 5, 0.15
    ds = SyntheticEOHard(size=size, length=n_data, num_classes=N_CLASSES,
                         data_range=(-1.0, 1.0), seed=0)
    imgs = np.stack([ds[i]["image"] for i in range(n_data)])
    labels = np.asarray([int(ds[i]["class"]) for i in range(n_data)], np.int32)

    # ---- harness: trained extractor features + class head ------------------
    eparams, emeta = load_params(ext_path)
    ewidths = tuple(int(w) for w in emeta["widths"])
    fcfg = FeatureCNNConfig(in_channels=3, widths=ewidths,
                            num_classes=int(emeta["num_classes"]))
    extract = make_extractor(eparams, fcfg)
    fmodel = FeatureCNN(fcfg)
    logits_fn = jax.jit(lambda x: fmodel.apply(eparams, x)[0])
    real = np.asarray(extract(jnp.asarray(imgs[:n_data // 2])))

    def score(x, yy):
        xc = np.clip(x, -1, 1)
        k, ks = M.kid(real, np.asarray(extract(jnp.asarray(xc))),
                      subset_size=min(100, len(real)))
        pred = np.argmax(np.asarray(logits_fn(jnp.asarray(xc))), -1)
        return float(k), float(ks), float((pred == yy).mean())

    # ---- teacher -----------------------------------------------------------
    cfg = UNetConfig(image_size=size, in_channels=3, model_channels=chans,
                     out_channels=3, num_res_blocks=1,
                     attention_resolutions=attn, channel_mult=mult,
                     num_heads=4, num_classes=N_CLASSES,
                     class_dropout_prob=DROPOUT, dtype=jnp.bfloat16)
    model = UNet(cfg)
    flow = FlowMatching.create(image_size=size, in_channels=3)
    params0 = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3), jnp.float32),
        jnp.zeros((1,), jnp.int32), y=jnp.zeros((1,), jnp.int32))
    apply5 = lambda p, x, t, c, y: model.apply(p, x, t, cond=c, y=y)

    results = {"w": args.w, "steps": args.steps,
               "refit_steps": args.refit_steps, "n_pairs": args.n_pairs}
    tpath = os.path.join(ckpt, "teacher")
    if not args.skip_train and not os.path.exists(os.path.join(tpath, "final")):
        sched = optax.warmup_cosine_decay_schedule(
            0.0, 1e-3, min(500, args.steps // 4 or 1), args.steps, 1e-5)
        tx = optax.chain(optax.clip_by_global_norm(1.0),
                         optax.adamw(sched))
        state = TrainState.create(jax.tree.map(jnp.copy, params0), tx)
        step_fn = make_train_step(
            flow, lambda p, x, t, cond=None, y=None, train=False,
            dropout_rng=None: model.apply(p, x, t, cond=cond, y=y),
            tx, ema_decay=0.999, ema_every=10, class_conditional=True,
            class_dropout_prob=DROPOUT, num_classes=N_CLASSES)
        cache = DeviceDataCache({"image": imgs, "label": labels})

        @functools.partial(jax.jit, donate_argnums=(0,))
        def jstep(state, tensors, rng):
            d_rng, s_rng = jax.random.split(rng)
            mb = gather_batch(tensors, d_rng, batch)
            return step_fn(state, mb, s_rng)

        rng = jax.random.PRNGKey(1)
        t0 = time.time()
        for i in range(args.steps):
            rng, srng = jax.random.split(rng)
            state, m = jstep(state, cache.tensors, srng)
            if i == 0:
                t0 = time.time()
            if (i + 1) % 1000 == 0 or (i + 1) == args.steps:
                print(f"teacher {i+1}/{args.steps} "
                      f"loss={float(m['loss']):.4f} "
                      f"({(time.time()-t0)/max(i,1)*1e3:.0f} ms/step)",
                      flush=True)
        save_checkpoint(tpath, jax.device_get(state), name="final")
    _, teacher = restore_params(os.path.join(tpath, "final"), params0)
    teacher = jax.tree.map(jnp.asarray, teacher)

    # ---- teacher CFG sweep (pick/validate w) -------------------------------
    y_eval = np.tile(np.arange(N_CLASSES), -(-bs // N_CLASSES))[:bs]
    y_eval_j = jnp.asarray(y_eval, jnp.int32)
    y_null = jnp.full((bs,), N_CLASSES, jnp.int32)

    def draw(runner, tag, save_grid=False):
        j = jax.jit(runner)
        xs, t_draw = [], 0.0
        for i in range(max(n_eval // bs, 1)):
            t1 = time.time()
            x = j(jax.random.PRNGKey(600 + i))
            _ = float(jnp.sum(x))
            if i > 0:
                t_draw += time.time() - t1
            xs.append(np.asarray(x))
        x = np.concatenate(xs)
        yy = np.tile(y_eval, len(xs))
        k, ks, acc = score(x, yy)
        nb = max(n_eval // bs - 1, 1)
        results[tag] = {"kid": k, "kid_std": ks, "class_acc": acc,
                        "img_s": nb * bs / t_draw if t_draw else None}
        print(f"{tag}: kid={k:.4g} acc={acc:.3f} "
              f"{results[tag]['img_s'] or 0:.1f} img/s", flush=True)
        if save_grid:
            save_image_grid(
                np.clip((x[:N_CLASSES * 3] + 1) / 2, 0, 1),
                os.path.join(GALLERY, f"guided64_{tag}.png"),
                nrow=N_CLASSES)
        _write(results, metrics_path)
        return x

    for w in ((1.0, args.w) if args.smoke else (1.0, 1.5, 2.0, 3.0)):
        kw = {} if w == 1.0 else dict(guidance_scale=w, y_uncond=y_null)
        draw(lambda r, _w=w, _kw=kw: flow.sample(
            lambda x, t, c, y: apply5(teacher, x, t, c, y), r, bs,
            num_steps=teacher_steps, method="heun", y=y_eval_j,
            dtype=jnp.bfloat16, **_kw).x.astype(jnp.float32),
            f"teacher_w{w:g}_heun{teacher_steps}", save_grid=(w != 1.0))

    # ---- guided couplings + student re-fit ---------------------------------
    guided5 = lambda p, x, t, c, y: cfg_model_fn(
        lambda xx, tt, cc, yy: model.apply(p, xx, tt, cond=cc, y=yy),
        args.w, N_CLASSES)(x, t, c, y)
    npr = np.random.default_rng(7)
    y_pairs = npr.integers(0, N_CLASSES, args.n_pairs).astype(np.int32)
    t0 = time.time()
    eps, x1 = generate_couplings(
        flow, guided5, jax.random.PRNGKey(11), args.n_pairs,
        num_steps=pair_steps, method="heun", batch_size=bs,
        dtype=jnp.bfloat16, y=y_pairs, params=teacher)
    print(f"{args.n_pairs} guided couplings (heun-{pair_steps}, w={args.w:g})"
          f" in {time.time()-t0:.0f}s", flush=True)

    sched = optax.warmup_cosine_decay_schedule(
        0.0, 1e-4, max(args.refit_steps // 20, 1), args.refit_steps, 1e-6)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(sched))
    state = TrainState.create(jax.tree.map(jnp.copy, teacher), tx)
    step_fn = make_train_step(
        flow, lambda p, x, t, cond=None, y=None, train=False,
        dropout_rng=None: model.apply(p, x, t, cond=cond, y=y),
        tx, ema_decay=0.999, ema_every=1, ema_warmup=False,
        class_conditional=True, class_dropout_prob=0.0,
        num_classes=N_CLASSES)
    ccache = DeviceDataCache({"image": x1, "noise": eps, "label": y_pairs})

    @functools.partial(jax.jit, donate_argnums=(0,))
    def rstep(state, tensors, r):
        i_rng, s_rng = jax.random.split(r)
        idx = jax.random.randint(i_rng, (batch,), 0,
                                 tensors["image"].shape[0])
        mb = {k: v[idx] for k, v in tensors.items()}
        return step_fn(state, mb, s_rng)

    rng = jax.random.PRNGKey(21)
    t0 = time.time()
    for i in range(args.refit_steps):
        rng, srng = jax.random.split(rng)
        state, m = rstep(state, ccache.tensors, srng)
        if i == 0:
            t0 = time.time()
        if (i + 1) % 1000 == 0 or (i + 1) == args.refit_steps:
            print(f"refit {i+1}/{args.refit_steps} "
                  f"loss={float(m['loss']):.4f} "
                  f"({(time.time()-t0)/max(i,1)*1e3:.0f} ms/step)",
                  flush=True)
    save_checkpoint(os.path.join(ckpt, "student"), jax.device_get(state),
                    name="final")
    student = state.ema_params

    # ---- student few-NFE: guided quality at single-call cost ---------------
    for nfe in ((1,) if args.smoke else (1, 2, 4)):
        draw(lambda r, _n=nfe: flow.sample(
            lambda x, t, c, y: apply5(student, x, t, c, y), r, bs,
            num_steps=_n, method="euler", y=y_eval_j,
            dtype=jnp.bfloat16).x.astype(jnp.float32),
            f"student_euler{nfe}", save_grid=(nfe in (1, 4)))

    _write(results, metrics_path)
    print(f"wrote {metrics_path}")


def _write(results, path):
    os.makedirs(GALLERY, exist_ok=True)
    with open(path, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
