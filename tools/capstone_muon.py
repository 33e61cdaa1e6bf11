"""Muon optimizer capstone (round 3): Muon vs AdamW at a matched budget.

Trains the flow64 UNet (rectified flow, the capstone_dit_flow protocol:
SyntheticEO 64px, device-resident data, EMA 0.999) twice — once with the
reference-parity AdamW and once with Muon (train/muon.py: Newton-Schulz-
orthogonalized momentum on matrix kernels, AdamW on the rest) — and
reports, per optimizer: ms/step (the NS iteration is 5 small matmuls per
kernel per step — measure, don't assume it's free), the loss trajectory at
matched steps, and the EMA model's Heun-8 sampling KID.

Muon's orthogonalized updates have a different natural scale than Adam's
(per-entry RMS ~ 1/sqrt(fan_out) after the official rows/cols rescale), so
the run starts with a short LR-multiplier probe (400-step mini-runs over
a small grid) and uses the winner for the full run — an honest tuned-vs-
default comparison would be unfair in the other direction, since AdamW's
1e-3 is itself the tuned reference default.

Stage-split like capstone_sr.py (one training per process):
  python tools/capstone_muon.py --opt adamw
  python tools/capstone_muon.py --opt muon       # runs the probe first
  python tools/capstone_muon.py --eval           # KIDs + JSON + grids
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
CKPT = os.path.join(ROOT, "logs", "capstone_muon")
GALLERY = os.path.join(ROOT, "gallery")
SIZE, BATCH, N_EVAL = 64, 128, 256
# CPU smoke-test hooks (the chip protocol never sets these)
BATCH = int(os.environ.get("CAPSTONE_MUON_BATCH", BATCH))
N_EVAL = int(os.environ.get("CAPSTONE_MUON_NEVAL", N_EVAL))
EVAL_BS = min(64, N_EVAL)


def dataset_images(n_images=2048, seed=0):
    from eo_diffusion_tpu.data.datasets import SyntheticEO

    ds = SyntheticEO(size=SIZE, length=n_images, data_range=(-1.0, 1.0),
                     seed=seed)
    return np.stack([ds[i]["image"] for i in range(n_images)])


def build_model():
    from eo_diffusion_tpu.models.unet import UNet, UNetConfig

    cfg = UNetConfig(image_size=SIZE, in_channels=3, model_channels=64,
                     out_channels=3, num_res_blocks=1,
                     attention_resolutions=(4, 8), channel_mult=(1, 2, 3, 4),
                     num_heads=4, dtype=jnp.bfloat16)
    return UNet(cfg)


def init_params(model):
    x0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    return jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                               jnp.zeros((1,), jnp.int32))


def make_tx(opt, steps, lr, muon_lr_mult):
    import optax

    from eo_diffusion_tpu.train.muon import muon_with_adamw

    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, min(500, steps // 4 or 1), steps, lr * 1e-2)
    if opt == "muon":
        return muon_with_adamw(sched, muon_lr_mult=muon_lr_mult)
    return optax.adamw(sched)


def train_one(opt, steps, lr, muon_lr_mult, imgs, probe=False, seed=1):
    from eo_diffusion_tpu.data.device_cache import DeviceDataCache, gather_batch
    from eo_diffusion_tpu.diffusion.flow import FlowMatching
    from eo_diffusion_tpu.train.checkpoint import save_checkpoint
    from eo_diffusion_tpu.train.trainer import TrainState, make_train_step

    flow = FlowMatching.create(image_size=SIZE, in_channels=3)
    model = build_model()
    tx = make_tx(opt, steps, lr, muon_lr_mult)
    params = init_params(model)
    state = TrainState.create(params, tx)
    apply_fn = (lambda p, xx, tt, cond=None, y=None, train=False,
                dropout_rng=None: model.apply(p, xx, tt, cond=cond, y=y))
    step_fn = make_train_step(flow, apply_fn, tx, ema_decay=0.999,
                              ema_every=10)
    cache = DeviceDataCache({"image": imgs})

    @functools.partial(jax.jit, donate_argnums=(0,))
    def jstep(state, tensors, rng):
        d_rng, s_rng = jax.random.split(rng)
        batch = gather_batch(tensors, d_rng, BATCH)
        return step_fn(state, batch, s_rng)

    rng = jax.random.PRNGKey(seed)
    curve = {}
    # tail-averaged loss is the probe/compare statistic (per-step loss is
    # noisy: random t and noise per batch)
    tail = []
    t0 = time.time()
    for i in range(steps):
        rng, srng = jax.random.split(rng)
        state, m = jstep(state, cache.tensors, srng)
        if steps - i <= max(50, steps // 20):
            tail.append(float(m["loss"]))
        if (i + 1) % 500 == 0 or i == 0 or i == steps - 1:
            curve[i + 1] = float(m["loss"])
            if not probe:
                print(f"[muon:{opt}] step {i+1}/{steps} "
                      f"loss={curve[i+1]:.4f} "
                      f"({(time.time()-t0)/(i+1)*1e3:.0f} ms/step)",
                      flush=True)
    out = {"curve": curve, "tail_loss": float(np.mean(tail)),
           "ms_per_step": (time.time() - t0) / steps * 1e3}
    if not probe:
        save_checkpoint(CKPT, jax.device_get(state), name=f"flow64_{opt}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--opt", choices=["adamw", "muon"])
    ap.add_argument("--eval", action="store_true")
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--probe_steps", type=int, default=400)
    ap.add_argument("--muon_lr_mult", type=float, default=0.0,
                    help="0 = probe a grid and pick the best tail loss")
    args = ap.parse_args()

    os.makedirs(CKPT, exist_ok=True)
    os.makedirs(GALLERY, exist_ok=True)
    out_path = os.path.join(GALLERY, "muon_metrics.json")
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)

    imgs = dataset_images()

    if args.opt:
        mult = args.muon_lr_mult
        if args.opt == "muon" and mult == 0.0:
            probe = {}
            for m in (1.0, 4.0, 16.0):
                r = train_one("muon", args.probe_steps, args.lr, m, imgs,
                              probe=True)
                probe[str(m)] = r["tail_loss"]
                print(f"[muon] probe mult={m}: tail loss {r['tail_loss']:.4f}",
                      flush=True)
            mult = float(min(probe, key=probe.get))
            results["muon_probe"] = {"tail_losses": probe, "picked": mult}
            print(f"[muon] probe picked lr_mult={mult}", flush=True)
        r = train_one(args.opt, args.steps, args.lr, mult, imgs)
        r["lr"] = args.lr
        if args.opt == "muon":
            r["lr_mult"] = mult
        results[args.opt] = r
        print(f"[muon:{args.opt}] tail loss {r['tail_loss']:.4f} "
              f"at {r['ms_per_step']:.0f} ms/step", flush=True)

    if args.eval:
        from eo_diffusion_tpu.diffusion.flow import FlowMatching
        from eo_diffusion_tpu.train.checkpoint import restore_params
        from eo_diffusion_tpu.utils import metrics as M
        from eo_diffusion_tpu.utils.images import save_image_grid

        flow = FlowMatching.create(image_size=SIZE, in_channels=3)
        model = build_model()
        extractor = M.tiny_feature_extractor()
        real_feats = np.asarray(extractor(jnp.asarray(imgs[:256])))
        data_grad = float(np.mean(np.abs(np.diff(imgs[:256], axis=1))))
        results["data_grad"] = data_grad

        for opt in ("adamw", "muon"):
            ck = os.path.join(CKPT, f"flow64_{opt}")
            if not os.path.isdir(ck):
                print(f"[muon:eval] missing checkpoint {ck}; skip")
                continue
            _, ema = restore_params(ck, init_params(model))
            params = jax.tree.map(jnp.asarray, ema)
            j = jax.jit(lambda p, rng: flow.sample(
                (lambda x, t, c, y: model.apply(p, x, t, cond=c, y=y)),
                rng, EVAL_BS, num_steps=8, method="heun",
                dtype=jnp.bfloat16).x.astype(jnp.float32))
            feats, ims = [], []
            for i in range(N_EVAL // EVAL_BS):
                x = np.asarray(j(params, jax.random.PRNGKey(100 + i)),
                               np.float32)
                ims.append(x)
                feats.append(np.asarray(
                    extractor(jnp.asarray(np.clip(x, -1, 1)))))
            k, _ = M.kid(real_feats, np.concatenate(feats))
            g = float(np.mean(np.abs(np.diff(np.concatenate(ims), axis=1))))
            results.setdefault(opt, {})["heun8"] = {"kid": float(k), "grad": g}
            print(f"[muon:eval] {opt}: heun8 KID={k:.5f} grad={g:.4f} "
                  f"(data {data_grad:.4f})", flush=True)
            grid = np.clip((np.concatenate(ims)[:16] + 1) / 2, 0, 1)
            save_image_grid(grid,
                            os.path.join(GALLERY, f"muon_{opt}_heun8.png"),
                            nrow=4)

    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
