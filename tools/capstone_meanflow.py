"""MeanFlow capstone (round 3): one-step generation trained FROM SCRATCH.

Trains diffusion/meanflow.MeanFlow (arXiv:2505.13447) on the flow64 UNet
architecture (dual-time variant) over the same SyntheticEO protocol as the
flow/reflow capstones, then scores Euler-1/2/4 KID + wall-clock. The
comparison target is the ReFlow pipeline's 1-NFE student
(gallery/reflow64_metrics.json: teacher 6000 steps + 8192 couplings +
3000 refit steps): MeanFlow reaches 1-NFE with NO teacher and NO coupling
generation — one training run. Each MeanFlow step costs ~2x a flow step
(the loss jvp), so --steps 9000 ~ the reflow pipeline's total optimizer
budget; ms/step is reported for the honest compute comparison.

Data is DEVICE-RESIDENT (data/device_cache.py) with index-only feeds — the
host-feed RSS leak through the axon tunnel is the documented capstone
killer (CLAUDE.md).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/capstone_meanflow.py \
           [--steps 9000] [--skip_train]
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
CKPT = os.path.join(ROOT, "logs", "capstone_meanflow")
GALLERY = os.path.join(ROOT, "gallery")
SIZE, BATCH, N_EVAL = 64, 128, 256


def dataset_images(n_images=2048, seed=0):
    from eo_diffusion_tpu.data.datasets import SyntheticEO

    ds = SyntheticEO(size=SIZE, length=n_images, data_range=(-1.0, 1.0),
                     seed=seed)
    return np.stack([ds[i]["image"] for i in range(n_images)])


def build_model():
    from eo_diffusion_tpu.models.unet import UNet, UNetConfig

    # the flow64 UNet (tools/capstone_dit_flow.py) + dual_time; attention
    # pinned to XLA: forward-mode autodiff (the loss jvp) cannot cross the
    # Pallas kernel's custom_vjp (cli/presets.py applies the same pin)
    cfg = UNetConfig(image_size=SIZE, in_channels=3, model_channels=64,
                     out_channels=3, num_res_blocks=1,
                     attention_resolutions=(4, 8), channel_mult=(1, 2, 3, 4),
                     num_heads=4, dtype=jnp.bfloat16, dual_time=True,
                     attn_impl="xla")
    return UNet(cfg)


def init_params(model):
    x0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    return jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                               jnp.zeros((1, 2), jnp.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=9000)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--tag", type=str, default="meanflow64",
                    help="checkpoint + gallery artifact name (use e.g. "
                         "meanflow64_18k for reruns so the committed 9k "
                         "artifacts survive)")
    args = ap.parse_args()
    tag = args.tag

    import optax

    from eo_diffusion_tpu.data.device_cache import DeviceDataCache, gather_batch
    from eo_diffusion_tpu.diffusion.meanflow import MeanFlow
    from eo_diffusion_tpu.train.checkpoint import restore_params, save_checkpoint
    from eo_diffusion_tpu.train.trainer import TrainState, make_train_step
    from eo_diffusion_tpu.utils import metrics as M
    from eo_diffusion_tpu.utils.images import save_image_grid

    os.makedirs(CKPT, exist_ok=True)
    os.makedirs(GALLERY, exist_ok=True)
    imgs = dataset_images()
    extractor = M.tiny_feature_extractor()
    real_feats = np.asarray(extractor(jnp.asarray(imgs[:256])))
    data_grad = float(np.mean(np.abs(np.diff(imgs[:256], axis=1))))

    mf = MeanFlow.create(image_size=SIZE, in_channels=3)
    model = build_model()
    results = {"data_grad": data_grad, "steps": args.steps}

    if not args.skip_train:
        sched = optax.warmup_cosine_decay_schedule(
            0.0, args.lr, min(500, args.steps // 4 or 1), args.steps, 1e-5)
        tx = optax.adamw(sched)
        params = init_params(model)
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
        print(f"[{tag}] {n_params/1e6:.1f} M params", flush=True)
        state = TrainState.create(params, tx)
        apply_fn = (
            lambda p, xx, tt, cond=None, y=None, train=False,
            dropout_rng=None: model.apply(p, xx, tt, cond=cond, y=y))
        step_fn = make_train_step(mf, apply_fn, tx, ema_decay=0.999,
                                  ema_every=10)
        cache = DeviceDataCache({"image": imgs})

        @functools.partial(jax.jit, donate_argnums=(0,))
        def jstep(state, tensors, rng):
            d_rng, s_rng = jax.random.split(rng)
            batch = gather_batch(tensors, d_rng, BATCH)
            return step_fn(state, batch, s_rng)

        rng = jax.random.PRNGKey(1)
        t0 = time.time()
        loss0 = loss = None
        for i in range(args.steps):
            rng, srng = jax.random.split(rng)
            state, m = jstep(state, cache.tensors, srng)
            if i == 0:
                loss0 = float(m["loss"])
            if (i + 1) % 1000 == 0 or i == args.steps - 1:
                loss = float(m["loss"])
                if (i + 1) % 1000 == 0:
                    print(f"[{tag}] step {i+1}/{args.steps} "
                          f"loss={loss:.4f} "
                          f"({(time.time()-t0)/(i+1)*1e3:.0f} ms/step)",
                          flush=True)
        results["train"] = {"loss_first": loss0, "loss_last": loss,
                            "ms_per_step": (time.time() - t0) / args.steps * 1e3}
        print(f"[{tag}] trained: loss {loss0:.4f} -> {loss:.4f} "
              f"({results['train']['ms_per_step']:.0f} ms/step)")
        save_checkpoint(CKPT, jax.device_get(state), name=tag)

    _, ema = restore_params(os.path.join(CKPT, tag),
                            init_params(model))
    params = jax.tree.map(jnp.asarray, ema)

    for label, steps in (("euler1", 1), ("euler2", 2), ("euler4", 4)):
        j = jax.jit(lambda p, rng, s=steps: mf.sample(
            (lambda x, t, c, y: model.apply(p, x, t, cond=c, y=y)),
            rng, 64, num_steps=s, dtype=jnp.bfloat16).x.astype(jnp.float32))
        feats, ims, t_steady = [], [], None
        for i in range(N_EVAL // 64):
            t0 = time.time()
            x = np.asarray(j(params, jax.random.PRNGKey(100 + i)), np.float32)
            _ = float(x.sum())  # host fetch: real completion barrier
            if i == 1:
                t_steady = time.time() - t0
            ims.append(x)
            feats.append(np.asarray(extractor(jnp.asarray(np.clip(x, -1, 1)))))
        k, _ = M.kid(real_feats, np.concatenate(feats))
        g = float(np.mean(np.abs(np.diff(np.concatenate(ims), axis=1))))
        results[label] = {"kid": float(k), "grad": g,
                          "s_per_batch64": t_steady}
        print(f"[{tag}] {label}: KID={k:.5f} grad={g:.4f} "
              f"(data {data_grad:.4f}) {t_steady:.2f}s/64", flush=True)
        grid = np.clip((np.concatenate(ims)[:16] + 1) / 2, 0, 1)
        save_image_grid(grid, os.path.join(GALLERY, f"{tag}_{label}.png"),
                        nrow=4)

    # pull the comparison rows (teacher-based 1-NFE pipelines) into the JSON
    for src, keys in (("reflow64_metrics.json",
                       ("student_euler1", "teacher_euler1", "teacher_heun8")),
                      ("dit_flow64_metrics.json", ("flow64_euler8",))):
        path = os.path.join(GALLERY, src)
        if os.path.exists(path):
            with open(path) as f:
                d = json.load(f)
            results[f"vs_{src.split('_')[0]}"] = {
                k: d[k] for k in keys if k in d}

    out = os.path.join(GALLERY, f"{tag}_metrics.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
