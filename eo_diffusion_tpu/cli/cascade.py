"""Cascaded generation: a base model samples low-res, an SR stage upsamples.

``python -m eo_diffusion_tpu.cli.cascade --base_preset tiny \\
      --base_ckpt logs/base/best --sr_preset tiny-sr \\
      --sr_ckpt logs/sr/best --n 16 --outdir results/cascade``

Beyond-reference recipe built from reference capabilities: the reference
vendors ``SuperResModel`` (backbones/unet.py:828-842) but never trains or
chains it; here any ``sr_factor`` preset (trained by ``cli/train.py`` on the
degrade-derived conditioning, data/transforms.sr_cond) composes behind any
base preset whose ``image_size * sr_factor`` matches.

TPU shape: the WHOLE cascade is one jitted program — base trajectory scan,
nearest-upsample, SR trajectory scan — with both param trees threaded as
jit arguments (closed-over trees are the HTTP-413 remote-compile failure
mode, CLAUDE.md). Chunks of ``--batch_size`` stream through the one
executable.

Reported ``cascade_rmse`` is the self-consistency check: avg-pool the SR
output back to the base grid and compare with the base sample — a trained
stage preserves the low-frequency content it was conditioned on.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Cascaded base->SR sampling")
    p.add_argument("--base_preset", type=str, default="synthetic64")
    p.add_argument("--base_ckpt", type=str, required=True)
    p.add_argument("--sr_preset", type=str, default="sr64-256")
    p.add_argument("--sr_ckpt", type=str, required=True)
    p.add_argument("--n", type=int, default=16, help="total samples")
    p.add_argument("--batch_size", type=int, default=None,
                   help="device batch per chunk (default: SR preset's)")
    p.add_argument("--base_steps", type=int, default=50,
                   help="base sampler steps (DDIM for ddpm presets, ODE "
                        "steps for flow/edm presets)")
    p.add_argument("--sr_steps", type=int, default=50,
                   help="SR-stage DDIM steps")
    p.add_argument("--eta", type=float, default=0.0, help="DDIM eta (both)")
    p.add_argument("--ddim_clip", action="store_true",
                   help="clamp pred_x0 in the DDIM steps of both stages "
                        "(stabilizes weak/early checkpoints)")
    p.add_argument("--outdir", type=str, default="results/cascade")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no_bf16", action="store_true")
    p.add_argument("--use_raw_params", action="store_true",
                   help="sample from raw params instead of EMA")
    p.add_argument("--cpu", action="store_true")
    return p.parse_args(argv)


def _load(preset, ckpt, bf16, use_raw, cond_channels=0):
    """(model, params) for a preset checkpoint; params are the EMA tree."""
    import jax
    import jax.numpy as jnp

    from eo_diffusion_tpu.cli.presets import build_denoiser
    from eo_diffusion_tpu.train.checkpoint import restore_params

    mcfg = preset.model_config(bf16=bf16, cond_channels=cond_channels)
    model = build_denoiser(mcfg)
    size = preset.latent_size if preset.is_latent else preset.image_size
    chans = preset.latent_channels if preset.is_latent else preset.in_channels
    x0 = jnp.zeros((1, size, size, chans), jnp.float32)
    kw = ({"cond": jnp.zeros((1, size, size, cond_channels))}
          if cond_channels else {})
    template = jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                                   jnp.zeros((1,), jnp.int32), **kw)
    raw, ema = restore_params(ckpt, template)
    params = jax.tree.map(jnp.asarray, raw if use_raw else ema)
    return model, params


def main(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from eo_diffusion_tpu.cli.presets import build_process, get_preset
    from eo_diffusion_tpu.utils.images import save_image_grid

    base = get_preset(args.base_preset)
    sr = get_preset(args.sr_preset)
    assert sr.sr_factor > 0, (
        f"--sr_preset must be an SR stage (sr_factor > 0); {sr.name} is not "
        f"(see presets 'sr64-256' / 'tiny-sr')")
    assert sr.process == "ddpm", (
        f"the SR stage samples with DDIM; preset {sr.name} trains "
        f"{sr.process}")
    assert not base.is_latent and not sr.is_latent, (
        "cascade chains pixel-space stages (a latent base would decode to "
        "the same pixel grid the SR stage expects — train a pixel base)")
    low = sr.image_size // sr.sr_factor
    assert base.image_size == low, (
        f"grid mismatch: base {base.name} samples {base.image_size}px but "
        f"SR {sr.name} upsamples from {low}px ({sr.image_size}/"
        f"{sr.sr_factor})")
    assert base.cond_type is None, (
        f"the cascade base must be unconditional; {base.name} has "
        f"cond_type={base.cond_type!r}")

    bf16 = not args.no_bf16
    dtype = jnp.bfloat16 if bf16 else jnp.float32
    bsz = args.batch_size or sr.batch_size
    base_model, base_params = _load(base, args.base_ckpt, bf16,
                                    args.use_raw_params)
    sr_model, sr_params = _load(sr, args.sr_ckpt, bf16, args.use_raw_params,
                                cond_channels=sr.in_channels)
    print(f"cascade: {base.name} ({base.image_size}px, {base.process}) -> "
          f"{sr.name} ({sr.image_size}px, x{sr.sr_factor})")

    base_diff = build_process(base, base.timesteps, base.image_size,
                              cond_type=None)
    sr_diff = build_process(sr, sr.timesteps, sr.image_size,
                            cond_type="concat")
    f = sr.sr_factor

    def cascade(bp, sp, rng):
        """base scan -> nearest-upsample -> SR scan, one compiled program."""
        base_fn = lambda x, t, c, y: base_model.apply(bp, x, t, cond=c, y=y)
        sr_fn = lambda x, t, c, y: sr_model.apply(sp, x, t, cond=c, y=y)
        r1, r2 = jax.random.split(rng)
        if base.process in ("flow", "edm"):
            xb = base_diff.sample(base_fn, r1, bsz,
                                  num_steps=args.base_steps, dtype=dtype).x
        else:
            xb = base_diff.ddim_sample(base_fn, r1, bsz,
                                       num_steps=args.base_steps,
                                       eta=args.eta, clip=args.ddim_clip,
                                       dtype=dtype).x
        cond = jnp.repeat(jnp.repeat(xb, f, axis=1), f, axis=2)
        xs = sr_diff.ddim_sample(sr_fn, r2, bsz, num_steps=args.sr_steps,
                                 eta=args.eta, clip=args.ddim_clip,
                                 cond=cond, dtype=dtype).x
        # self-consistency: the SR output avg-pooled back to the base grid
        n, H, _, c = xs.shape
        pooled = xs.reshape(n, H // f, f, H // f, f, c).mean(axis=(2, 4))
        rmse = jnp.sqrt(jnp.mean((pooled - xb) ** 2))
        return xb, xs, rmse

    jcascade = jax.jit(cascade)
    rng = jax.random.PRNGKey(args.seed)
    os.makedirs(args.outdir, exist_ok=True)
    base_all, sr_all, rmses = [], [], []
    t0 = time.time()
    for i in range(-(-args.n // bsz)):
        xb, xs, rmse = jcascade(base_params, sr_params,
                                jax.random.fold_in(rng, i))
        base_all.append(np.asarray(xb, np.float32))
        sr_all.append(np.asarray(xs, np.float32))
        rmses.append(float(rmse))
        print(f"chunk {i}: {bsz} samples, cascade_rmse={rmses[-1]:.4f}")
    wall = time.time() - t0
    base_np = np.concatenate(base_all)[: args.n]
    sr_np = np.concatenate(sr_all)[: args.n]
    assert np.isfinite(sr_np).all(), "non-finite SR samples"

    # grids: base / its nearest-upsample (the SR cond) / the SR output
    rng_view = (-1.0, 1.0)
    save_image_grid(base_np, os.path.join(args.outdir, "base.png"),
                    data_range=rng_view)
    up = np.repeat(np.repeat(base_np, f, axis=1), f, axis=2)
    save_image_grid(up, os.path.join(args.outdir, "base_upsampled.png"),
                    data_range=rng_view)
    save_image_grid(sr_np, os.path.join(args.outdir, "sr.png"),
                    data_range=rng_view)
    np.save(os.path.join(args.outdir, "sr_samples.npy"), sr_np)

    metrics = {
        "n": int(sr_np.shape[0]),
        "base_px": base.image_size,
        "sr_px": sr.image_size,
        "factor": f,
        "base_steps": args.base_steps,
        "sr_steps": args.sr_steps,
        "cascade_rmse": float(np.mean(rmses)),
        "wall_s": wall,
        "img_per_s": args.n / wall,
    }
    with open(os.path.join(args.outdir, "cascade_metrics.json"), "w") as fh:
        json.dump(metrics, fh, indent=2)
    print(json.dumps(metrics))
    return metrics


if __name__ == "__main__":
    args = parse_args()
    if args.cpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    main(args)
