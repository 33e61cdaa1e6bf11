"""Zero-shot restoration CLI (DDNM, arXiv:2212.00490).

``python -m eo_diffusion_tpu.cli.restore --preset eurosat64 --ckpt logs/run
--task sr4 --sampler_steps 100 --metrics --save``

Restores test-split images through a plain unconditional DDPM checkpoint:
super-resolution (``sr2``/``sr4``), inpainting (``inpaint``; uses the
dataset segmentation mask when present, else a random rectangle), and
colorization (``colorize``). No task-specific training — the degradation
operator's null-space projection rides the DDIM scan
(diffusion/inverse.py). The reference has no restoration entry point; its
closest capability is the RePaint composite inside sampling (reference
diffusion/model.py:58-60, inpainting only).

Metrics report the restored-vs-gt SSIM/PSNR next to the naive A+ y
baseline so the diffusion prior's contribution is visible.
"""

from __future__ import annotations

import argparse
import math
import os

import jax
import numpy as np

TASKS = ("sr2", "sr4", "inpaint", "colorize")


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="DDNM zero-shot restoration")
    p.add_argument("--task", type=str, default="sr4", choices=TASKS)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--sampler_steps", type=int, default=100)
    p.add_argument("--eta", type=float, default=0.85,
                   help="DDIM eta inside DDNM (paper default 0.85)")
    p.add_argument("--ensemble", type=int, default=1,
                   help="K>1: sample K stochastic restorations per batch "
                        "(needs eta>0), report the ensemble mean as the "
                        "restoration and the per-pixel std as an "
                        "uncertainty map (saved as *_uncertainty.png; "
                        "metrics add the uncertainty-vs-|error| Pearson "
                        "correlation — calibrated maps correlate)")
    p.add_argument("--outdir", type=str, default="results/restore")
    p.add_argument("--ckpt", type=str, required=True)
    p.add_argument("--timesteps", type=int, default=None)
    p.add_argument("--metrics", action="store_true")
    p.add_argument("--save", action="store_true")
    p.add_argument("--n_iter", type=int, default=None)
    p.add_argument("--preset", type=str, default="inria64")
    p.add_argument("--dataset", type=str, default=None)
    p.add_argument("--data_root", type=str, default=None)
    p.add_argument("--image_size", type=int, default=None)
    p.add_argument("--no_bf16", action="store_true")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def build_operator(task, image_size, batch, mask_rng):
    """The degradation A for one batch -> ``(op, mask)``.

    ``mask`` is the per-batch inpaint mask (None for the array-free sr /
    colorize operators): the jitted restore runner threads it as an input
    so operator data never bakes into the compiled program."""
    import jax.numpy as jnp

    from eo_diffusion_tpu.diffusion import inverse as I

    if task in ("sr2", "sr4"):
        return I.sr_operator(int(task[2:])), None
    if task == "colorize":
        return I.gray_operator(int(np.asarray(batch["image"]).shape[-1])), None
    # inpaint: observed = NON-masked region (segmentation marks the region
    # to regenerate, matching the cond_type='sum' inversion semantics)
    if "segmentation" in batch:
        m = 1.0 - np.asarray(batch["segmentation"], np.float32)
    else:
        from eo_diffusion_tpu.data.transforms import random_rect_mask

        n = np.asarray(batch["image"]).shape[0]
        m = 1.0 - np.stack(
            [random_rect_mask((image_size, image_size), 10, 10, 40, 40,
                              mask_rng) for _ in range(n)])
    m = jnp.asarray(m)
    return I.inpaint_operator(m), m


def main(args):
    import jax.numpy as jnp

    from eo_diffusion_tpu.cli.presets import build_denoiser, build_process, get_preset
    from eo_diffusion_tpu.data.factories import DATASET_FACTORIES
    from eo_diffusion_tpu.diffusion.inverse import ddnm_sample
    from eo_diffusion_tpu.utils import metrics as M
    from eo_diffusion_tpu.utils.images import rescale_to_unit, save_image_grid

    preset = get_preset(args.preset)
    assert preset.process == "ddpm" and not preset.is_latent, (
        "DDNM projects pixel-space x0 predictions along the DDPM chain; "
        f"preset {preset.name} ({preset.process}"
        f"{', latent' if preset.is_latent else ''}) is not wired")
    dataset = args.dataset or preset.dataset
    image_size = args.image_size or preset.image_size
    preset.image_size = image_size
    timesteps = args.timesteps or preset.timesteps

    factory = DATASET_FACTORIES[dataset]
    fkw = dict(batch_size=args.batch_size, test=True)
    if args.data_root:
        fkw["root"] = args.data_root
    if dataset == "synthetic":
        fkw["image_size"] = image_size
        fkw["channels"] = preset.in_channels
        fkw.pop("test")
    _, test_loader = factory(**fkw)
    data_range = test_loader.dataset.data_range

    ucfg = preset.model_config(bf16=not args.no_bf16)
    model = build_denoiser(ucfg)
    diffusion = build_process(preset, timesteps, image_size, cond_type=None)

    x0 = jnp.zeros((1, image_size, image_size, preset.in_channels))
    params = jax.jit(model.init)(jax.random.PRNGKey(args.seed), x0,
                                 jnp.zeros((1,), jnp.int32))
    from eo_diffusion_tpu.train.checkpoint import restore_params

    _, ema_params = restore_params(args.ckpt, params)

    # ONE jitted runner for the whole split (ensemble and single-shot):
    # params / observation / inpaint mask are jit ARGUMENTS, so nothing
    # bakes into the compile payload (CLAUDE.md HTTP-413 gotcha) and no
    # batch retraces. The array-free sr/colorize operator is static; the
    # inpaint operator is rebuilt from the traced mask inside the trace.
    from eo_diffusion_tpu.diffusion import inverse as I

    static_op = (I.sr_operator(int(args.task[2:]))
                 if args.task in ("sr2", "sr4")
                 else I.gray_operator(preset.in_channels)
                 if args.task == "colorize" else None)

    @jax.jit
    def jrestore(p, k, yobs, mask):
        fn = lambda x, t, c, yy: model.apply(p, x, t, cond=c, y=yy)
        op_ = static_op if mask is None else I.inpaint_operator(mask)
        return ddnm_sample(diffusion, fn, k, yobs, op_,
                           num_steps=args.sampler_steps, eta=args.eta).x

    assert args.ensemble == 1 or args.eta > 0, (
        "--ensemble needs stochastic DDNM (eta > 0); eta=0 members are "
        "identical")
    os.makedirs(args.outdir, exist_ok=True)
    rng = jax.random.PRNGKey(args.seed)
    mask_rng = np.random.default_rng(args.seed)
    acc = {"ssim": 0.0, "psnr": 0.0, "ssim_naive": 0.0, "psnr_naive": 0.0}
    if args.ensemble > 1:
        acc["unc_err_corr"] = 0.0
    n = 0
    print(f"restoring: task={args.task}, {args.sampler_steps} steps, "
          f"eta={args.eta}")
    for j, batch in enumerate(test_loader):
        gt = jnp.asarray(np.asarray(batch["image"], np.float32))
        op, mask = build_operator(args.task, image_size, batch, mask_rng)
        y = op.forward(gt)
        naive = op.pinv(y)
        if args.ensemble > 1:
            # K stochastic members through the ONE compiled program (rng is
            # the only changing input); mean = restoration, std = uncertainty
            members = []
            for e in range(args.ensemble):
                rng, srng = jax.random.split(rng)
                members.append(np.asarray(
                    jrestore(ema_params, srng, y, mask), np.float32))
            stack = np.stack(members)
            restored = stack.mean(axis=0)
            unc = stack.std(axis=0)
        else:
            rng, srng = jax.random.split(rng)
            restored = jrestore(ema_params, srng, y, mask)
        gt01 = rescale_to_unit(np.asarray(gt), data_range)
        rest01 = rescale_to_unit(np.asarray(restored), data_range)
        naive01 = np.clip(rescale_to_unit(np.asarray(naive), data_range), 0, 1)
        if args.ensemble > 1:
            err = np.abs(np.asarray(restored) - np.asarray(gt))
            u, e_ = unc.ravel(), err.ravel()
            corr = float(np.corrcoef(u, e_)[0, 1]) if u.std() > 0 else 0.0
            if args.metrics:
                acc["unc_err_corr"] += corr
            if args.save:
                u01 = unc / max(float(unc.max()), 1e-8)
                save_image_grid(
                    u01, os.path.join(
                        args.outdir, f"{args.task}_{j}_uncertainty.png"),
                    nrow=int(math.sqrt(u01.shape[0])) or 1)
        if args.metrics:
            acc["ssim"] += float(M.ssim(jnp.asarray(rest01), jnp.asarray(gt01)))
            acc["psnr"] += float(M.psnr(jnp.asarray(rest01), jnp.asarray(gt01)))
            acc["ssim_naive"] += float(M.ssim(jnp.asarray(naive01), jnp.asarray(gt01)))
            acc["psnr_naive"] += float(M.psnr(jnp.asarray(naive01), jnp.asarray(gt01)))
        n += 1
        if args.save:
            nrow = int(math.sqrt(gt01.shape[0])) or 1
            for tag, img in (("gt", gt01), ("input", naive01), ("restored", rest01)):
                save_image_grid(
                    img, os.path.join(args.outdir, f"{args.task}_{j}_{tag}.png"),
                    nrow=nrow)
        if args.metrics:
            print(f"batch {j}: ssim {acc['ssim']/n:.4f} (naive "
                  f"{acc['ssim_naive']/n:.4f}) psnr {acc['psnr']/n:.2f} "
                  f"(naive {acc['psnr_naive']/n:.2f})")
            with open(os.path.join(args.outdir, "metrics.txt"), "w") as f:
                for k, v in acc.items():
                    f.write(f"{k}: {v / n}\n")
                f.write(f"length: {n}\n")
        if args.n_iter is not None and j >= args.n_iter:
            break


if __name__ == "__main__":
    args = parse_args()
    if args.cpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    main(args)
