"""256px modern-stack capstone: DiT-B/8 + rectified flow, trained on-chip.

Grounds the 34.8 img/s @256px DiT+flow throughput number (PERF.md) in a
*trained* model at the same resolution: trains DiT-B/8 with the
flow-matching objective on synthetic 256px EO tiles through the
device-resident cache (data/device_cache.py — batches gathered on-chip, no
tunnel feed), then scores Euler/Heun step economies with KID + pixel
gradient and writes gallery artifacts.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/capstone_dit256.py \
           [--steps 6000] [--skip_train]
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
CKPT = os.path.join(ROOT, "logs", "capstone_dit256")
GALLERY = os.path.join(ROOT, "gallery")
SIZE, MB, N_DATA, N_EVAL = 256, 16, 512, 128


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--skip_train", action="store_true")
    args = ap.parse_args()

    import optax

    from eo_diffusion_tpu.data.datasets import SyntheticEO
    from eo_diffusion_tpu.data.device_cache import DeviceDataCache, gather_batch
    from eo_diffusion_tpu.diffusion.flow import FlowMatching
    from eo_diffusion_tpu.models.dit import DiT, dit_b
    from eo_diffusion_tpu.train.checkpoint import restore_params, save_checkpoint
    from eo_diffusion_tpu.train.trainer import TrainState, make_train_step
    from eo_diffusion_tpu.utils import metrics as M
    from eo_diffusion_tpu.utils.images import save_image_grid

    os.makedirs(CKPT, exist_ok=True)
    ds = SyntheticEO(size=SIZE, length=N_DATA, data_range=(-1.0, 1.0), seed=0)
    t0 = time.time()
    imgs = np.stack([ds[i]["image"] for i in range(N_DATA)])
    print(f"data: {imgs.shape} in {time.time()-t0:.0f}s", flush=True)

    model = DiT(dit_b(SIZE, dtype=jnp.bfloat16))
    fm = FlowMatching.create(image_size=SIZE, in_channels=3)
    x0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                                 jnp.zeros((1,), jnp.int32))
    print(f"DiT-B/8 {sum(p.size for p in jax.tree.leaves(params))/1e6:.1f}M "
          f"params", flush=True)

    results = {}
    if not args.skip_train:
        sched = optax.warmup_cosine_decay_schedule(0.0, 5e-4, 500,
                                                   args.steps, 1e-5)
        tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(sched))
        state = TrainState.create(params, tx)
        apply_fn = (lambda p, xx, tt, cond=None, y=None, train=False,
                    dropout_rng=None: model.apply(p, xx, tt, cond=cond, y=y))
        step_fn = make_train_step(fm, apply_fn, tx, ema_decay=0.999,
                                  ema_every=10)
        cache = DeviceDataCache({"image": imgs})
        print(f"device cache: {cache.nbytes()/1e6:.0f} MB", flush=True)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def fused_step(state, tensors, rng):
            d_rng, s_rng = jax.random.split(rng)
            batch = gather_batch(tensors, d_rng, MB)
            return step_fn(state, batch, s_rng)

        rng = jax.random.PRNGKey(1)
        t0 = time.time()
        loss0 = loss = None
        for i in range(args.steps):
            rng, srng = jax.random.split(rng)
            state, m = fused_step(state, cache.tensors, srng)
            if i == 0:
                loss0 = float(m["loss"])
                t0 = time.time()  # exclude compile
            if (i + 1) % 1000 == 0:
                loss = float(m["loss"])
                print(f"step {i+1}/{args.steps} loss={loss:.4f} "
                      f"({(time.time()-t0)/i*1e3:.0f} ms/step)", flush=True)
        results["train"] = {"loss_first": loss0, "loss_last": loss,
                            "ms_per_step": (time.time() - t0) / (args.steps - 1) * 1e3}
        save_checkpoint(CKPT, jax.device_get(state), name="final")

    _, ema = restore_params(os.path.join(CKPT, "final"), params)
    ema = jax.tree.map(jnp.asarray, ema)

    extractor = M.tiny_feature_extractor()
    real_feats = np.asarray(extractor(jnp.asarray(imgs[:N_EVAL])))
    data_grad = float(np.mean(np.abs(np.diff(imgs[:N_EVAL], axis=1))))
    results["data_grad"] = data_grad

    for label, steps, method in [("heun8", 8, "heun"), ("euler16", 16, "euler"),
                                 ("heun16", 16, "heun"), ("euler32", 32, "euler")]:
        bs = 32

        def run(p, rng):
            fn = lambda x, t, c, y: model.apply(p, x, t, cond=c, y=y)
            return fm.sample(fn, rng, bs, num_steps=steps, method=method,
                             dtype=jnp.bfloat16).x.astype(jnp.float32)

        j = jax.jit(run)
        feats, ims, t_steady = [], [], None
        for i in range(N_EVAL // bs):
            t0 = time.time()
            x = np.asarray(j(ema, jax.random.PRNGKey(100 + i)), np.float32)
            if i == 1:
                t_steady = time.time() - t0
            ims.append(x)
            feats.append(np.asarray(extractor(jnp.asarray(np.clip(x, -1, 1)))))
        k, _ = M.kid(real_feats, np.concatenate(feats))
        g = float(np.mean(np.abs(np.diff(np.concatenate(ims), axis=1))))
        img_s = bs / t_steady
        results[label] = {"kid": float(k), "grad": g,
                          "img_s_trained": round(img_s, 2)}
        print(f"{label}: KID={k:.4f} grad={g:.4f} (data {data_grad:.4f}) "
              f"{img_s:.1f} img/s", flush=True)
        grid = np.clip((np.concatenate(ims)[:9] + 1.0) / 2.0, 0, 1)
        save_image_grid(grid, os.path.join(GALLERY, f"dit256_{label}.png"),
                        nrow=3)

    out = os.path.join(GALLERY, "dit256_metrics.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
