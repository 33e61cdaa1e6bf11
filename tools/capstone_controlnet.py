"""ControlNet capstone: bolt paired cloud-removal onto a FROZEN base.

The adapter story end-to-end on the shared 64px synthetic protocol (same
data/extractor as tools/capstone_bridge.py): first train an UNCONDITIONAL
DDPM on clear imagery — the "shipped model". Then train ONLY a ControlNet
branch (models/controlnet.py, arXiv:2302.05543) with the cloudy paired
view as the hint, base weights untouched. Scored on held-out pairs:

* **identity**      — the cloudy input itself (floor).
* **base DDIM-50**  — the frozen unconditional model, no hint: KID is
                      fine (it IS the right distribution) but per-pair
                      SSIM is chance — it cannot know WHICH scene.
* **controlnet**    — frozen base + adapter, hint = cloudy view, at
                      DDIM-10/25/50: per-pair SSIM/PSNR must rise far
                      above both floors while KID stays data-like.

That per-pair-fidelity-from-a-frozen-prior gap is the measurable claim
of the adapter family. Writes cloudy|output|clear triptychs +
gallery/controlnet64_metrics.json.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/capstone_controlnet.py \
           [--steps 6000] [--ctrl_steps 4000] [--smoke]
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
CKPT = os.path.join(ROOT, "logs", "capstone_controlnet")
GALLERY = os.path.join(ROOT, "gallery")
SIZE, BATCH, N_EVAL = 64, 128, 256


def dataset_pairs(n_images=2048, seed=0):
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


def build_cfg(smoke: bool):
    from eo_diffusion_tpu.models.unet import UNetConfig

    if smoke:
        return UNetConfig(image_size=SIZE, in_channels=3, model_channels=32,
                          out_channels=3, num_res_blocks=1,
                          attention_resolutions=(), channel_mult=(1, 2),
                          num_heads=1, dtype=jnp.float32)
    return UNetConfig(image_size=SIZE, in_channels=3, model_channels=64,
                      out_channels=3, num_res_blocks=1,
                      attention_resolutions=(4, 8),
                      channel_mult=(1, 2, 3, 4), num_heads=4,
                      dtype=jnp.bfloat16)


def train_base(model, process, clear, steps):
    import optax

    from eo_diffusion_tpu.train.checkpoint import save_checkpoint
    from eo_diffusion_tpu.train.trainer import TrainState, make_train_step

    sched = optax.warmup_cosine_decay_schedule(
        0.0, 1e-3, min(500, steps // 4 or 1), steps, 1e-5)
    tx = optax.adamw(sched)
    x0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                                 jnp.zeros((1,), jnp.int32))
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"[base] {n/1e6:.1f} M params", flush=True)
    state = TrainState.create(params, tx)
    apply_fn = (
        lambda p, xx, tt, cond=None, y=None, train=False, dropout_rng=None:
        model.apply(p, xx, tt))
    jstep = jax.jit(make_train_step(process, apply_fn, tx, ema_decay=0.999,
                                    ema_every=10), donate_argnums=(0,))
    rng = jax.random.PRNGKey(1)
    rnp = np.random.default_rng(3)
    t0 = time.time()
    loss0 = loss = None
    for i in range(steps):
        idx = rnp.integers(0, len(clear), BATCH)
        rng, srng = jax.random.split(rng)
        state, m = jstep(state, {"image": jnp.asarray(clear[idx])}, srng)
        if i == 0:
            loss0 = float(m["loss"])
        if (i + 1) % 1000 == 0 or i == steps - 1:
            loss = float(m["loss"])
            if (i + 1) % 1000 == 0:
                print(f"[base] step {i+1}/{steps} loss={loss:.4f} "
                      f"({(time.time()-t0)/(i+1)*1e3:.0f} ms/step)",
                      flush=True)
    save_checkpoint(CKPT, jax.device_get(state), name="base")
    print(f"[base] trained: loss {loss0:.4f} -> {loss:.4f}", flush=True)
    return {"loss_first": loss0, "loss_last": loss}


def load_base(model):
    from eo_diffusion_tpu.train.checkpoint import restore_params

    x0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                                 jnp.zeros((1,), jnp.int32))
    _, ema = restore_params(os.path.join(CKPT, "base"), params)
    return jax.tree.map(jnp.asarray, ema)


def train_ctrl(model, cnet, base, process, clear, cloudy, steps):
    import optax

    from eo_diffusion_tpu.models.controlnet import (
        control_param_count,
        init_from_base,
        save_controlnet,
    )

    x0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    cparams = jax.jit(cnet.init)(jax.random.PRNGKey(7), x0,
                                 jnp.zeros((1,), jnp.int32), x0)
    cparams, n_copied = init_from_base(cparams, base)
    n_ctrl = control_param_count(cparams)
    n_base = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(base))
    print(f"[ctrl] {n_copied} leaves copied; {n_ctrl/1e6:.2f}M adapter "
          f"({100*n_ctrl/n_base:.0f}% of base)", flush=True)

    sched = optax.warmup_cosine_decay_schedule(
        0.0, 1e-3, min(400, steps // 4 or 1), steps, 1e-5)
    tx = optax.adamw(sched)
    opt = tx.init(cparams)

    @jax.jit
    def jstep(cparams, opt, rng, img, hint):
        def loss_fn(cp):
            def fn(x, t, c, y=None):
                return model.apply(base, x, t,
                                   control=cnet.apply(cp, x, t, c))
            return process.train_loss(fn, rng, img, cond=hint)

        loss, grads = jax.value_and_grad(loss_fn)(cparams)
        up, opt = tx.update(grads, opt, cparams)
        return optax.apply_updates(cparams, up), opt, loss

    it = batches(clear, cloudy, BATCH, seed=11)
    rng = jax.random.PRNGKey(5)
    t0 = time.time()
    loss0 = loss = None
    for i in range(steps):
        x, c = next(it)
        rng, srng = jax.random.split(rng)
        cparams, opt, l = jstep(cparams, opt, srng, jnp.asarray(x),
                                jnp.asarray(c))
        if i == 0:
            loss0 = float(l)
        if (i + 1) % 1000 == 0 or i == steps - 1:
            loss = float(l)
            if (i + 1) % 1000 == 0:
                print(f"[ctrl] step {i+1}/{steps} loss={loss:.4f} "
                      f"({(time.time()-t0)/(i+1)*1e3:.0f} ms/step)",
                      flush=True)
    save_controlnet(os.path.join(CKPT, "adapter"), jax.device_get(cparams),
                    {"hint_channels": 3, "steps": steps,
                     "n_ctrl_params": n_ctrl, "n_base_params": n_base})
    print(f"[ctrl] trained: loss {loss0:.4f} -> {loss:.4f}", flush=True)
    return cparams, {"loss_first": loss0, "loss_last": loss,
                     "n_ctrl": n_ctrl, "n_base": n_base}


def score(label, out, clear_h, cloudy_h, extractor, real_feats, results,
          t_batch=None):
    from eo_diffusion_tpu.utils import metrics as M
    from eo_diffusion_tpu.utils.images import save_image_grid

    s = float(jnp.mean(M.ssim(jnp.asarray((out + 1) / 2),
                              jnp.asarray((clear_h + 1) / 2))))
    p = float(jnp.mean(M.psnr(jnp.asarray((out + 1) / 2),
                              jnp.asarray((clear_h + 1) / 2))))
    feats = np.asarray(extractor(jnp.asarray(np.clip(out, -1, 1))))
    k, _ = M.kid(real_feats, feats)
    results[label] = {"ssim": s, "psnr": p, "kid": float(k)}
    if t_batch is not None:
        results[label]["s_per_batch"] = t_batch
    print(f"[{label}] SSIM={s:.4f} PSNR={p:.2f} KID={float(k):.4f}",
          flush=True)
    trip = np.stack([cloudy_h[:5], out[:5], clear_h[:5]], 1).reshape(
        15, SIZE, SIZE, 3)
    save_image_grid(np.clip((trip + 1) / 2, 0, 1),
                    os.path.join(GALLERY, f"controlnet64_{label}.png"),
                    nrow=3)


def main():
    global SIZE, BATCH, N_EVAL
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--ctrl_steps", type=int, default=4000)
    ap.add_argument("--skip_base", action="store_true",
                    help="reuse the saved base checkpoint")
    ap.add_argument("--base_only", action="store_true",
                    help="exit after base training (stage-split: one "
                         "training per process — the axon host-feed RSS "
                         "leak documented in CLAUDE.md)")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        SIZE, BATCH, N_EVAL = 8, 16, 32
        args.steps = min(args.steps, 30)
        args.ctrl_steps = min(args.ctrl_steps, 30)
    os.makedirs(CKPT, exist_ok=True)
    os.makedirs(GALLERY, exist_ok=True)

    from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from eo_diffusion_tpu.models.controlnet import ControlNet
    from eo_diffusion_tpu.models.unet import UNet
    from eo_diffusion_tpu.utils import metrics as M

    T = 100 if args.smoke else 1000
    clear, cloudy = dataset_pairs(256 if args.smoke else 2048)
    clear_h, cloudy_h = dataset_pairs(N_EVAL, seed=77)
    extractor = M.tiny_feature_extractor()
    real_feats = np.asarray(extractor(jnp.asarray(clear[:256])))

    process = GaussianDiffusion.create(timesteps=T, image_size=SIZE,
                                       in_channels=3)
    cfg = build_cfg(args.smoke)
    model = UNet(cfg)
    cnet = ControlNet(cfg, hint_channels=3)
    results = {}

    s_id = float(jnp.mean(M.ssim(jnp.asarray((cloudy_h + 1) / 2),
                                 jnp.asarray((clear_h + 1) / 2))))
    p_id = float(jnp.mean(M.psnr(jnp.asarray((cloudy_h + 1) / 2),
                                 jnp.asarray((clear_h + 1) / 2))))
    results["identity"] = {"ssim": s_id, "psnr": p_id}
    print(f"[identity] SSIM={s_id:.4f} PSNR={p_id:.2f}", flush=True)

    if not args.skip_base:
        results["base_train"] = train_base(model, process, clear, args.steps)
        if args.base_only:
            print("[ctrl] base stage done; base_only set — exiting")
            return
    base = load_base(model)
    cparams, ctrain = train_ctrl(model, cnet, base, process, clear, cloudy,
                                 args.ctrl_steps)
    results["ctrl_train"] = ctrain

    dtype = jnp.float32 if args.smoke else jnp.bfloat16
    bs = min(64, N_EVAL)

    # frozen base, no hint: right distribution, wrong scenes
    fn_base = lambda x, t, c, y: model.apply(base, x, t)
    jb = jax.jit(lambda rng: process.ddim_sample(
        fn_base, rng, bs, num_steps=50, dtype=dtype).x.astype(jnp.float32))
    outs = [np.asarray(jb(jax.random.PRNGKey(200 + i)))
            for i in range(N_EVAL // bs)]
    score("base_ddim50", np.concatenate(outs), clear_h, cloudy_h,
          extractor, real_feats, results)

    # frozen base + adapter, hint = the cloudy pair
    def fn_ctrl(x, t, c, y):
        return model.apply(base, x, t, control=cnet.apply(cparams, x, t, c))

    for steps in ([5] if args.smoke else [10, 25, 50]):
        j = jax.jit(lambda rng, c: process.ddim_sample(
            fn_ctrl, rng, bs, num_steps=steps, cond=c,
            dtype=dtype).x.astype(jnp.float32))
        outs, t_b = [], None
        for i in range(N_EVAL // bs):
            t0 = time.time()
            outs.append(np.asarray(j(jax.random.PRNGKey(100 + i),
                                     jnp.asarray(cloudy_h[i*bs:(i+1)*bs]))))
            if i == 1 or N_EVAL // bs == 1:
                t_b = time.time() - t0
        score(f"ctrl_ddim{steps}", np.concatenate(outs), clear_h, cloudy_h,
              extractor, real_feats, results, t_b)

    out = os.path.join(GALLERY, "controlnet64_metrics.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
