"""PAG capstone: measure perturbed-attention guidance on a trained model.

PAG (arXiv:2403.17377) claims sample-quality gains WITHOUT any condition or
second model — the regime the EO presets live in (unconditional). This
capstone makes that a measured number on this framework: train one eps-DDPM
UNet (64px, SyntheticEO), then sample DDIM at several guidance scales and
step counts and compare KID against the data. Expected from the paper:
KID improves at moderate s (1-3) with the effect largest at few steps;
too-large s over-sharpens and regresses. Either way the number is recorded
(honest negatives stand, cf. the ToMe/PD entries in PERF.md).

Also records the throughput cost: PAG's perturbed branch skips the
attention matmuls (identity_attention returns V), so a PAG step costs less
than 2x a plain step.

Writes gallery/pag64_*.png + gallery/pag64_metrics.json.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/capstone_pag.py \
           [--steps 4000] [--skip_train] [--smoke]
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
CKPT = os.path.join(ROOT, "logs", "capstone_pag")
GALLERY = os.path.join(ROOT, "gallery")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU config to exercise the script end-to-end")
    args = ap.parse_args()

    import optax

    from eo_diffusion_tpu.data.datasets import SyntheticEO
    from eo_diffusion_tpu.data.device_cache import DeviceDataCache, gather_batch
    from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from eo_diffusion_tpu.diffusion.pag import pag_model_fn
    from eo_diffusion_tpu.models.unet import UNet, UNetConfig
    from eo_diffusion_tpu.train.checkpoint import restore_params, save_checkpoint
    from eo_diffusion_tpu.train.trainer import TrainState, make_train_step
    from eo_diffusion_tpu.utils import metrics as M
    from eo_diffusion_tpu.utils.images import save_image_grid

    if args.smoke:
        size, batch, chans, tsteps, n_eval, n_data = 8, 16, 32, 100, 32, 256
        args.steps = min(args.steps, 30)
        attn, mult, step_grid = (2,), (1, 2), (5,)
        scales = (0.0, 2.0)
    else:
        size, batch, chans, tsteps, n_eval, n_data = 64, 128, 64, 1000, 256, 2048
        attn, mult, step_grid = (4, 8), (1, 2, 3, 4), (10, 50)
        scales = (0.0, 1.0, 2.0, 3.0)

    ds = SyntheticEO(size=size, length=n_data, data_range=(-1.0, 1.0), seed=0)
    imgs = np.stack([ds[i]["image"] for i in range(n_data)])

    cfg = UNetConfig(image_size=size, in_channels=3, model_channels=chans,
                     out_channels=3, num_res_blocks=1,
                     attention_resolutions=attn, channel_mult=mult,
                     num_heads=4, dtype=jnp.bfloat16)
    model = UNet(cfg)
    x0 = jnp.zeros((1, size, size, 3), jnp.float32)
    params0 = jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                                  jnp.zeros((1,), jnp.int32))
    diffusion = GaussianDiffusion.create(timesteps=tsteps, image_size=size,
                                         in_channels=3)

    ck = os.path.join(CKPT, "base")
    if not args.skip_train:
        sched = optax.warmup_cosine_decay_schedule(
            0.0, 1e-3, min(500, args.steps // 4 or 1), args.steps, 1e-5)
        tx = optax.adamw(sched)
        state = TrainState.create(jax.tree.map(jnp.copy, params0), tx)
        apply_fn = (lambda p, xx, tt, cond=None, y=None, train=False,
                    dropout_rng=None: model.apply(p, xx, tt, cond=cond, y=y))
        step_fn = make_train_step(diffusion, apply_fn, tx,
                                  ema_decay=0.999, ema_every=10)
        cache = DeviceDataCache({"image": imgs})

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
            if (i + 1) % 1000 == 0:
                print(f"step {i+1}/{args.steps} loss={float(m['loss']):.4f} "
                      f"({(time.time()-t0)/i*1e3:.0f} ms/step)", flush=True)
        save_checkpoint(ck, jax.device_get(state), name="final")
    _, ema = restore_params(os.path.join(ck, "final"), params0)
    ema = jax.tree.map(jnp.asarray, ema)

    extractor = M.tiny_feature_extractor()
    real_feats = np.asarray(extractor(jnp.asarray(imgs[:512])))

    base_fn = lambda p: (lambda x, t, c, y: model.apply(p, x, t, cond=c, y=y))
    results = {"steps": args.steps, "n_eval": n_eval}
    bs = min(64, n_eval)
    for ddim_steps in step_grid:
        for s in scales:
            tag = f"ddim{ddim_steps}_pag{s:g}"

            def run(p, rng, _s=s, _n=ddim_steps):
                fn = base_fn(p)
                if _s > 0:
                    fn = pag_model_fn(fn, _s)
                return diffusion.ddim_sample(
                    fn, rng, bs, num_steps=_n,
                    dtype=jnp.bfloat16).x.astype(jnp.float32)

            j = jax.jit(run)
            xs, t_draw = [], 0.0
            for i in range(max(n_eval // bs, 1)):
                t1 = time.time()
                out = j(ema, jax.random.PRNGKey(300 + i))
                _ = float(jnp.sum(out))  # host fetch: real completion time
                if i > 0:  # first call pays compile
                    t_draw += time.time() - t1
                xs.append(np.asarray(out))
            x = np.concatenate(xs)
            feats = np.asarray(extractor(jnp.asarray(np.clip(x, -1, 1))))
            k, _ = M.kid(real_feats, feats)
            nb = max(n_eval // bs - 1, 1)
            stats = {"kid": float(k),
                     "img_s": float(nb * bs / t_draw) if t_draw else None}
            results[tag] = stats
            print(f"{tag}: {json.dumps(stats)}", flush=True)
            grid = np.clip((x[:16] + 1) / 2, 0, 1)
            save_image_grid(grid, os.path.join(GALLERY, f"pag64_{tag}.png"),
                            nrow=4)
            # incremental dump: partial sweeps survive preemption
            with open(os.path.join(GALLERY, "pag64_metrics.json"), "w") as f:
                json.dump(results, f, indent=2)

    print(f"wrote {os.path.join(GALLERY, 'pag64_metrics.json')}")


if __name__ == "__main__":
    main()
