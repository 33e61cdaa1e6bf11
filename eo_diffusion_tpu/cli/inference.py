"""Inference/eval CLI with the reference's flag surface.

``python -m eo_diffusion_tpu.cli.inference --preset clouds64-attn
--ckpt logs/run/best --sampler ddim --sampler_steps 250 --metrics --save``

Flags mirror reference ``inference.py:23-47`` (--batch_size --sampler_steps
--outdir --ckpt --model_base_dim --timesteps --no_clip --cpu --metrics
--save --random_label --num_classes --cond_type --sampler --samples_fid
--n_iter) plus preset/dataset selection and --eta.

Behavioral parity notes (and deliberate divergences, SURVEY.md §2.4):
* cond build follows inference.py:101-109: mask inversion for
  ``cond_type=sum``, optional random-rectangle mask (``--random_label``),
  (image|mask) channel-concat;
* sample rescaling uses the dataset's explicit ``data_range`` instead of
  the reference's ``image.min()>=0`` heuristic (inference.py:128);
* SSIM/PSNR accumulate per batch (inference.py:136-138) via the jnp metrics;
* per-class ``samples_fid/`` export for FID (inference.py:144-147);
* the reference's unconditional ``breakpoint()`` (inference.py:130) and its
  broken DDIM-inpaint plumbing are NOT reproduced -- DDIM masking works here
  (fixed x0/noise plumbing in diffusion/gaussian.py).
"""

from __future__ import annotations

import argparse
import math
import os

import jax
import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="EO diffusion inference (TPU-native)")
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--sampler_steps", type=int, default=250)
    parser.add_argument("--outdir", type=str, default="results/run")
    parser.add_argument("--ckpt", type=str, default="")
    parser.add_argument("--model_base_dim", type=int, default=None)
    parser.add_argument("--timesteps", type=int, default=None)
    parser.add_argument("--no_clip", action="store_true")
    parser.add_argument("--dpm_spacing", type=str, default="uniform_lambda",
                        choices=["uniform_lambda", "uniform_t", "karras"],
                        help="DPM-solver step grid: uniform half-log-SNR "
                             "(paper default), DDIM-style t stride, or the "
                             "Karras rho-7 sigma curve (arXiv:2206.00364 "
                             "eq. 5, k-diffusion's DPM++ default)")
    parser.add_argument("--dynamic_threshold", type=float, default=None,
                        metavar="P",
                        help="Imagen dynamic thresholding percentile (e.g. "
                             "0.995, arXiv:2205.11487): per-sample rescale of "
                             "pred_x0 instead of the static [-1,1] clamp — "
                             "the high-guidance saturation fix. "
                             "ddpm/ddim/dpm/unipc samplers only.")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--metrics", action="store_true")
    parser.add_argument("--save", action="store_true")
    parser.add_argument("--random_label", action="store_true")
    parser.add_argument("--wandb", action="store_true")
    parser.add_argument("--num_classes", type=int, default=0)
    parser.add_argument("--class_dropout", type=float, default=0.0,
                        help="must match training: builds the null-class "
                             "embedding row so label-CFG checkpoints load")
    parser.add_argument("--cond_type", type=str, default=None)
    parser.add_argument("--sampler", type=str, default="ddpm",
                        choices=["ddpm", "ddim", "dpm", "unipc", "flow",
                                 "cm", "pd"],
                        help="dpm = DPM-Solver++(2M) second-order multistep "
                             "sampler; unipc = UniPC-2 predictor-corrector "
                             "(arXiv:2302.04867, best at <=10 steps; "
                             "num_steps+1 model calls); "
                             "flow = Euler ODE integration (only for "
                             "flow-process presets, which force it); cm = "
                             "consistency-model few-step sampling (checkpoints "
                             "from cli.distill --method consistency); pd = "
                             "progressive-distillation grid sampling "
                             "(checkpoints from cli.distill --method "
                             "progressive; --sampler_steps = the final "
                             "student's step count)")
    parser.add_argument("--cd_points", type=int, default=18,
                        help="cm sampler: consistency grid points (must "
                             "match distillation)")
    parser.add_argument("--sigma_data", type=float, default=0.5,
                        help="cm sampler: data std for the boundary "
                             "coefficients (must match distillation)")
    parser.add_argument("--flow_method", type=str, default="euler",
                        choices=["euler", "heun"],
                        help="flow sampler integrator (heun = 2nd order, "
                             "2 model calls/step)")
    parser.add_argument("--samples_fid", action="store_true")
    parser.add_argument("--guidance_scale", type=float, default=1.0,
                        help="classifier-free guidance scale (>1 enables). "
                             "Class-conditional models guide against the "
                             "learned null class (train with "
                             "class_dropout_prob > 0); concat-conditioned "
                             "models guide against a zero conditioning "
                             "image. All samplers support it.")
    parser.add_argument("--guidance_rescale", type=float, default=0.0,
                        help="CFG-rescale phi (arXiv:2305.08891 §3.4): mixes "
                             "the guided prediction back toward the cond-"
                             "branch per-sample std to undo over-exposure at "
                             "high --guidance_scale (paper suggests ~0.7; "
                             "0 disables). Pairs with --preset vpred*'s "
                             "zero-terminal-SNR schedule but works on any "
                             "CFG-capable sampler.")
    parser.add_argument("--tome_ratio", type=float, default=0.0,
                        help="token merging (ToMe, arXiv:2303.17604) on DiT "
                             "presets: fraction of tokens merged inside "
                             "every block's attention. Parameter-free, so "
                             "it applies to checkpoints trained without it "
                             "(training-free speedup like --deepcache; "
                             "~0.3-0.5 is the useful range).")
    parser.add_argument("--tome_mlp", action="store_true",
                        help="extend --tome_ratio's merge around the MLP "
                             "branch too (faster, slightly lossier)")
    parser.add_argument("--int8_compute", action="store_true",
                        help="W8A8: large Dense matmuls run on the MXU "
                             "int8 path with in-graph quantization — a "
                             "DiT-preset lever (gallery/"
                             "int8_mxu_probe.json); any checkpoint, no "
                             "conversion")
    parser.add_argument("--freeu", type=str, default=None,
                        metavar="B1,B2,S1,S2",
                        help="FreeU (arXiv:2309.11497) on UNet presets: "
                             "training-free decoder re-weighting — amplify "
                             "backbone features (b>1) and attenuate skip "
                             "low frequencies (s<1) at the two deepest "
                             "stages; e.g. 1.2,1.3,0.9,0.4. Applies to any "
                             "trained checkpoint.")
    parser.add_argument("--guidance_interval", type=str, default=None,
                        metavar="LO,HI",
                        help="limited-interval guidance (arXiv:2404.07724): "
                             "apply CFG only while the normalized noise "
                             "level is inside [LO,HI] (1 = pure noise); "
                             "e.g. 0.2,0.8. Improves FID at equal scale by "
                             "disabling guidance at the extremes.")
    parser.add_argument("--pag_scale", type=float, default=0.0,
                        help="perturbed-attention guidance (arXiv:2403.17377):"
                             " extrapolate away from the same model with "
                             "self-attention replaced by identity, weight s "
                             "(>0 enables; typical 1-5; needs no extra model "
                             "or condition — works unconditionally)")
    parser.add_argument("--autoguide_scale", type=float, default=1.0,
                        help="autoguidance (arXiv:2406.02507): extrapolate "
                             "away from a WORSE variant of the same model "
                             "with this weight (>1 enables; works on fully "
                             "unconditional models, unlike CFG)")
    parser.add_argument("--autoguide_ckpt", type=str, default=None,
                        help="the degraded model's checkpoint (e.g. an "
                             "early steps_* dir of the same run)")
    parser.add_argument("--autoguide_sigma_rel", type=float, default=0.0,
                        help="synthesize the degraded model as a SHORT-EMA "
                             "variant from post-hoc EMA snapshots (pairs "
                             "with cli.train --posthoc_ema; the paper's "
                             "§3.3 EMA-length degradation)")
    parser.add_argument("--phema_sigma_rel", type=float, default=0.0,
                        help="post-hoc EMA (arXiv:2312.02696): synthesize "
                             "the EMA profile of this relative width from "
                             "the power-EMA snapshots saved by cli.train "
                             "--posthoc_ema, instead of the checkpoint's "
                             "baked-in EMA (typical range 0.02-0.15)")
    parser.add_argument("--phema_dir", type=str, default=None,
                        help="snapshot directory (default: <ckpt>/../phema)")
    parser.add_argument("--classifier_ckpt", type=str, default=None,
                        help="classifier guidance (Dhariwal & Nichol 2021): "
                             "directory written by cli.train_classifier "
                             "(classifier/ + classifier.json)")
    parser.add_argument("--classifier_scale", type=float, default=0.0,
                        help="classifier-guidance gradient scale (>0 "
                             "enables; needs --classifier_ckpt)")
    parser.add_argument("--deepcache", type=int, default=1, metavar="K",
                        help="DeepCache (arXiv 2312.00858): recompute the deep "
                             "UNet branch only every K sampler steps (K>1 "
                             "enables; all samplers)")
    parser.add_argument("--sdedit_strength", type=float, default=0.0,
                        help="SDEdit editing (arXiv:2108.01073): noise the "
                             "source image this fraction of the way up the "
                             "chain and denoise back (0 = off; 0.3-0.6 "
                             "edits, ~0.7+ regenerates). Source = the "
                             "dataset's cond_image view when present (e.g. "
                             "the cloudy pair), else the image itself. "
                             "DDPM-chain presets run the DDIM tail; flow "
                             "presets the Euler/Heun tail.")
    parser.add_argument("--n_iter", type=int, default=None)
    parser.add_argument("--jump_len", type=int, default=0,
                        help="RePaint resampling jump length (ddpm sampler; "
                             "arXiv:2201.09865 Alg. 2)")
    parser.add_argument("--jump_n", type=int, default=1,
                        help="RePaint resamplings per jump point (1 = the "
                             "reference's single-descent composite)")
    parser.add_argument("--eta", type=float, default=0.0)
    parser.add_argument("--ddim_spacing", type=str, default="uniform",
                        choices=["uniform", "quad", "trailing"],
                        help="DDIM timestep spacing; 'trailing' starts at "
                             "t=T-1 (Lin et al. 2023 — pair with the "
                             "zero-terminal-SNR presets, e.g. vpred64)")
    parser.add_argument("--ddim_clip", action="store_true",
                        help="clamp pred_x0 in DDIM steps (stabilizes weak models; "
                             "the reference DDIM never clips)")
    parser.add_argument("--lora", type=str, default=None,
                        help="merge a LoRA adapter (directory written by "
                             "cli.finetune) into the loaded params before "
                             "sampling")
    parser.add_argument("--controlnet", type=str, default=None,
                        help="ControlNet adapter directory (cli.finetune "
                             "--method controlnet): the dataset's paired "
                             "hint view steers the FROZEN base checkpoint "
                             "through the zero-init control branch "
                             "(arXiv:2302.05543; UNet presets)")
    parser.add_argument("--ae_ckpt", type=str, default=None,
                        help="latent presets: trained first-stage directory "
                             "(default: 'ae' beside --ckpt)")
    parser.add_argument("--preset", type=str, default="inria64")
    parser.add_argument("--dataset", type=str, default=None)
    parser.add_argument("--data_root", type=str, default=None)
    parser.add_argument("--image_size", type=int, default=None)
    parser.add_argument("--no_bf16", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    return parser.parse_args(argv)


def _build_cond(batch, cond_type, image_size, random_label=False, mask_rng=None,
                sr_factor=0):
    """Build (cond, mask) for one test batch.

    Mirrors reference inference.py:98-109 -- mask inversion for
    ``cond_type=sum`` (known region = non-cloud), optional random-rectangle
    mask, (image|mask) channel-concat -- extended with the paired-view path:
    when the dataset supplies a "cond_image" (e.g. the cloudy SEN12MS-CR S2
    view), that image IS the concat conditioning and there is no mask.
    ``sr_factor`` presets condition on the degraded view of the ground
    truth itself (data/transforms.sr_cond), so the loop's SSIM/PSNR become
    a true super-resolution reconstruction score.
    """
    if cond_type is None:
        return None, None
    image = np.asarray(batch["image"], np.float32)
    if cond_type == "spade":
        # the segmap itself is the conditioning (SPADE norms consume it)
        if "segmentation" not in batch:
            return None, None
        return np.asarray(batch["segmentation"], np.float32), None
    if cond_type == "concat" and sr_factor:
        from eo_diffusion_tpu.data.transforms import sr_cond

        return sr_cond(image, sr_factor), None
    if cond_type == "concat" and "cond_image" in batch:
        return np.asarray(batch["cond_image"], np.float32), None
    mask = (np.asarray(batch["segmentation"], np.float32)
            if "segmentation" in batch else None)
    if cond_type == "sum" and mask is not None:
        mask = 1.0 - mask  # invert: known region = non-cloud (inference.py:101)
    if random_label and cond_type == "sum":
        from eo_diffusion_tpu.data.transforms import random_rect_mask

        mask = np.stack(
            [random_rect_mask((image_size, image_size), 10, 10, 40, 40, mask_rng)
             for _ in range(image.shape[0])]
        )
    if mask is None:
        return None, None
    return np.concatenate([image, mask], axis=-1), mask


def main(args):
    import contextlib

    import jax.numpy as jnp

    from eo_diffusion_tpu.cli.presets import build_denoiser, build_process, get_preset
    from eo_diffusion_tpu.data.factories import DATASET_FACTORIES
    from eo_diffusion_tpu.utils import metrics as M
    from eo_diffusion_tpu.utils.images import rescale_to_unit, save_image_grid

    if getattr(args, "int8_compute", False):
        # trace-time routing: every sampler jit traced inside this context
        # takes the W8A8 Dense path (nn/primitives.int8_dense_compute)
        from eo_diffusion_tpu.nn.primitives import int8_dense_compute

        with int8_dense_compute():
            args.int8_compute = False  # re-entry guard
            return main(args)

    preset = get_preset(args.preset)
    dataset = args.dataset or preset.dataset
    image_size = args.image_size or preset.image_size
    preset.image_size = image_size  # keep preset.latent_size consistent
    timesteps = args.timesteps or preset.timesteps
    if args.model_base_dim:
        preset.base_dim = args.model_base_dim
    cond_type = args.cond_type or preset.cond_type
    if args.controlnet:
        # the hint rides the concat-cond DATA plumbing (paired view build,
        # sampler cond pass-through, SSIM/PSNR vs gt) but the MODEL stays
        # unconditional — cond_channels is zeroed below and model_fn routes
        # the cond tensor into the control branch instead of the stem
        assert preset.backbone == "unet" and not preset.is_latent, (
            "--controlnet adapters are wired for pixel-space UNet presets")
        assert cond_type in (None, "concat"), (
            f"--controlnet replaces '{cond_type}' conditioning; use an "
            "unconditional or concat-data preset")
        assert args.deepcache <= 1, (
            "DeepCache wraps (model, params) directly and would bypass "
            "the control residuals; drop one of the two")
        assert args.autoguide_scale == 1.0, (
            "autoguidance's degraded branch applies raw params without "
            "the control residuals (and would mis-concat the hint); "
            "drop one of the two")
        cond_type = "concat"
    num_classes = args.num_classes if args.num_classes > 0 else None
    assert not (args.classifier_scale and not args.classifier_ckpt), (
        "--classifier_scale needs --classifier_ckpt (train one with "
        "cli.train_classifier)")


    factory = DATASET_FACTORIES[dataset]
    fkw = dict(batch_size=args.batch_size, test=True)
    if args.data_root:
        fkw["root"] = args.data_root
    if dataset == "synthetic":
        fkw["image_size"] = image_size
        fkw["channels"] = preset.in_channels
        if cond_type == "concat":
            if not preset.sr_factor:  # SR presets derive cond from gt
                fkw["with_cond_image"] = True  # synthetic cloudy view as cond
        fkw.pop("test")
    _, test_loader = factory(**fkw)
    data_range = test_loader.dataset.data_range

    # derive cond width from one dataset item (cli/train.py derives from the
    # batch the same way): the sen12mscr-style "cond_image" is 3 channels,
    # image|mask is 4. Peeking dataset[0] directly avoids spinning up (and
    # abandoning) a prefetch worker + a full decoded batch just for a shape.
    peek_item = {k: np.asarray(v)[None] for k, v in test_loader.dataset[0].items()}
    peek_cond, _ = _build_cond(peek_item, cond_type, image_size,
                               sr_factor=preset.sr_factor)
    # "spade" differs from "concat" only in how the cond tensor is BUILT
    # (the segmap itself, _build_cond above) and which backbone consumes it
    # (model_config); every downstream cond-passing decision is identical,
    # so normalize here and keep the build-side name for the loop
    build_cond_type = cond_type
    if cond_type == "spade":
        cond_type = "concat"
    has_cond = cond_type == "concat" and peek_cond is not None
    # latent presets: concat cond is first-stage-encoded -> latent_channels
    cond_channels = ((preset.latent_channels if preset.is_latent
                      else peek_cond.shape[-1]) if has_cond else 0)
    ctrl_hint_channels = 0
    if args.controlnet:
        assert has_cond, (
            "--controlnet needs a paired hint view from the dataset "
            "(cond_image / image|mask)")
        ctrl_hint_channels, cond_channels = cond_channels, 0
    ucfg = preset.model_config(num_classes=num_classes, bf16=not args.no_bf16,
                               cond_channels=cond_channels,
                               class_dropout_prob=args.class_dropout)
    if args.tome_ratio:
        import dataclasses as _dc

        assert preset.backbone == "dit", (
            "--tome_ratio merges transformer tokens (DiT presets); the UNet "
            "has no token axis — use --deepcache there")
        # parameter-free: the param tree is unchanged, so any trained
        # checkpoint loads under the merged config (ops/tome.py)
        ucfg = _dc.replace(ucfg, tome_ratio=args.tome_ratio,
                           tome_mlp=args.tome_mlp)
    if args.freeu:
        import dataclasses as _dc

        assert preset.backbone == "unet", (
            "--freeu re-weights the UNet decoder's skip joins; the DiT has "
            "no decoder ladder (use --tome_ratio there)")
        vals = tuple(float(v) for v in args.freeu.split(","))
        assert len(vals) == 4, "--freeu needs B1,B2,S1,S2"
        ucfg = _dc.replace(ucfg, freeu=vals)  # parameter-free, like ToMe
    model = build_denoiser(ucfg)
    diffusion = build_process(preset, timesteps, image_size, cond_type=cond_type)
    # an explicit cm request on a non-DDPM preset is an error, not a
    # coercion target (review finding: the flow/edm coercion below used to
    # swallow it into ordinary ODE sampling with only a print)
    assert not (args.sampler == "cm" and preset.process != "ddpm"), (
        "--sampler cm samples a consistency-distilled DDPM-chain student "
        f"(cli.distill --method consistency); {preset.name} trains "
        f"{preset.process}")
    assert not (args.sampler == "pd" and preset.process != "ddpm"), (
        "--sampler pd samples a progressively-distilled DDPM-chain student "
        f"(cli.distill --method progressive); {preset.name} trains "
        f"{preset.process}")
    # "flow" here means "the process's native sampler": FlowMatching's
    # Euler/Heun velocity integration, EDM's Karras-grid Heun, or the
    # Brownian bridge's posterior walk — all expose the same .sample surface
    if (preset.process in ("flow", "edm", "bridge", "meanflow")
            and args.sampler != "flow"):
        print(f"preset {preset.name} is a {preset.process} process; "
              f"using --sampler flow (its native sampler)")
        args.sampler = "flow"
    if preset.process == "meanflow" and args.flow_method != "euler":
        print("note: MeanFlow applies its own average-velocity displacement; "
              "ignoring --flow_method " + args.flow_method)
        args.flow_method = "euler"
    if preset.process == "bridge" and args.guidance_scale != 1.0:
        print("note: the bridge is endpoint-conditional; no CFG combine — "
              "ignoring --guidance_scale")
        args.guidance_scale = 1.0
    assert not (args.sampler == "flow" and preset.process == "ddpm"), (
        f"--sampler flow requires a flow/edm-process preset; {preset.name} "
        f"trained the DDPM chain (use ddpm/ddim/dpm)")
    if args.sdedit_strength:
        assert preset.process in ("ddpm", "flow", "meanflow"), (
            f"SDEdit is wired for DDPM-chain and flow/meanflow presets; "
            f"{preset.name} trains {preset.process}")
        assert cond_type != "sum", (
            "SDEdit starts FROM the source image; RePaint 'sum' masking is a "
            "different mechanism (drop --sdedit_strength or use cond_type "
            "concat/None)")
        if args.sampler in ("ddpm", "dpm", "unipc"):
            print("note: SDEdit runs the DDIM tail; using --sampler ddim")
            args.sampler = "ddim"
        assert args.sampler in ("ddim", "flow"), (
            f"--sdedit_strength does not compose with --sampler {args.sampler}")
    assert args.dynamic_threshold is None or args.sampler in (
        "ddpm", "ddim", "dpm", "unipc"), (
        f"--dynamic_threshold rescales the DDPM-family pred-x0 clamp "
        f"(ddpm/ddim/dpm/unipc); the {args.sampler} sampler has no such "
        "site")
    assert not (args.sampler in ("cm", "pd") and args.deepcache > 1), (
        f"{args.sampler} is already 1-4 evaluations; DeepCache does not apply")
    assert not (args.sampler in ("cm", "pd") and args.controlnet), (
        f"the {args.sampler} sampler builds its distilled-student fn "
        "directly from params; --controlnet wraps the plain denoiser "
        "(use ddpm/ddim/dpm/unipc)")
    assert not (args.sampler in ("cm", "pd") and cond_type == "sum"), (
        f"{args.sampler} has no RePaint mask plumbing; cond_type='sum' "
        "metrics would silently compare unconditional samples against gt "
        "(use ddim/dpm)")
    if args.sampler in ("cm", "pd") and args.guidance_scale != 1.0:
        print(f"note: the {args.sampler} sampler has no guidance combine; "
              "ignoring --guidance_scale")
        args.guidance_scale = 1.0
    assert args.deepcache <= 1 or preset.backbone == "unet", (
        "DeepCache caches the UNet's deep/shallow split; the DiT backbone "
        "has no resolution ladder to split")
    if preset.is_latent:
        from eo_diffusion_tpu.diffusion.latent import LatentDiffusion
        from eo_diffusion_tpu.train import ae_trainer as AET

        assert cond_type != "sum", (
            "latent presets do not support RePaint-'sum' conditioning "
            "(pixel-space mask composite); use cond_type='concat'"
        )
        ae_dir = args.ae_ckpt or os.path.join(os.path.dirname(args.ckpt), "ae")
        assert AET.ae_exists(ae_dir), (
            f"latent preset {preset.name} needs a trained first stage; none at "
            f"{ae_dir} (train one with cli.train, or pass --ae_ckpt)"
        )
        ae_model, ae_params, ae_scale = AET.load_ae(ae_dir)
        enc, dec = AET.make_codec(ae_model, ae_params)
        diffusion = LatentDiffusion(diffusion, enc, dec, scale_factor=ae_scale,
                                    cond_via_encoder=True)

    # model-facing grid (latent for latent presets, pixels otherwise)
    gsize = preset.latent_size if preset.is_latent else image_size
    gchan = preset.latent_channels if preset.is_latent else preset.in_channels
    x0 = jnp.zeros((1, gsize, gsize, gchan))
    init_kw = ({"cond": jnp.zeros((1, gsize, gsize, cond_channels))}
               if cond_channels else {})
    if num_classes:
        init_kw["y"] = jnp.zeros((1,), jnp.int32)
    from eo_diffusion_tpu.models import time_template

    params = jax.jit(model.init)(jax.random.PRNGKey(args.seed), x0,
                                 time_template(model), **init_kw)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"Diffusion with {n_params/1e6} M params")

    ema_params = params
    if args.ckpt:
        print("loading checkpoint...")
        if os.path.isdir(args.ckpt):
            from eo_diffusion_tpu.train.checkpoint import restore_params

            params, ema_params = restore_params(args.ckpt, params)
        else:
            from eo_diffusion_tpu.tools.convert_ckpt import load_torch_checkpoint

            params = ema_params = load_torch_checkpoint(args.ckpt, ucfg)
        print("loaded!")

    if args.phema_sigma_rel:
        # post-hoc EMA synthesis (arXiv:2312.02696; train/posthoc_ema.py):
        # rebuild the EMA of the requested length from the power-EMA
        # snapshots written by cli.train --posthoc_ema, replacing the
        # checkpoint's baked-in EMA for this run only
        from eo_diffusion_tpu.train.posthoc_ema import synthesize_from_dir

        phema_dir = args.phema_dir or os.path.join(
            os.path.dirname(os.path.abspath(args.ckpt)), "phema")
        ema_params = synthesize_from_dir(phema_dir, params,
                                         args.phema_sigma_rel)
        print(f"posthoc-ema: synthesized sigma_rel={args.phema_sigma_rel} "
              f"from {phema_dir}")

    if args.lora:
        from eo_diffusion_tpu.cli.finetune import load_lora
        from eo_diffusion_tpu.train.lora import lora_merge

        lora, lmeta = load_lora(args.lora)
        lora = jax.tree.map(jnp.asarray, lora)
        params = ema_params = lora_merge(ema_params, lora,
                                         alpha=lmeta.get("alpha", 8.0))
        print(f"LoRA adapter merged: {len(lora)} kernels from {args.lora}")

    if args.controlnet:
        import jax.numpy as jnp_

        from eo_diffusion_tpu.models.controlnet import (
            ControlNet,
            load_controlnet,
        )

        cnet = ControlNet(ucfg, hint_channels=ctrl_hint_channels)
        ctrl_template = jax.jit(cnet.init)(
            jax.random.PRNGKey(0), x0, jnp_.zeros((1,), jnp_.int32),
            jnp_.zeros((1, gsize, gsize, ctrl_hint_channels)),
            **({"y": jnp_.zeros((1,), jnp_.int32)} if num_classes else {}))
        ctrl_params, cmeta = load_controlnet(args.controlnet, ctrl_template)
        print(f"ControlNet adapter loaded from {args.controlnet} "
              f"(hint_channels={ctrl_hint_channels})")

        def model_fn(x, t, c, y):
            control = cnet.apply(ctrl_params, x, t, c, y=y)
            return model.apply(ema_params, x, t, y=y, control=control)
    else:
        model_fn = lambda x, t, c, y: model.apply(ema_params, x, t, cond=c, y=y)

    if args.autoguide_scale > 1.0:
        # autoguidance (arXiv:2406.02507): extrapolate away from a worse
        # variant of the same model. The degraded params come from either
        # an explicit checkpoint (--autoguide_ckpt: e.g. an early steps_*
        # dir) or a short-EMA post-hoc synthesis (--autoguide_sigma_rel,
        # needs cli.train --posthoc_ema snapshots) — the paper's §3.3
        # EMA-length degradation, free after training here.
        from eo_diffusion_tpu.diffusion.autoguide import autoguided_model_fn

        assert args.guidance_scale == 1.0, (
            "autoguidance and classifier-free guidance both own the "
            "guided combine; pick one (--autoguide_scale xor "
            "--guidance_scale)")
        assert args.deepcache <= 1, (
            "DeepCache's stateful fn wraps (model, params) directly and "
            "would bypass the autoguided combine; drop one of the two")
        assert args.sampler not in ("cm", "pd"), (
            f"the {args.sampler} student is already a distilled few-step "
            "map; autoguidance does not apply")
        if args.autoguide_ckpt:
            from eo_diffusion_tpu.train.checkpoint import restore_params as _rpa

            _, bad_params = _rpa(args.autoguide_ckpt, params)
        else:
            assert args.autoguide_sigma_rel, (
                "--autoguide_scale needs a degraded model: pass "
                "--autoguide_ckpt or --autoguide_sigma_rel")
            from eo_diffusion_tpu.train.posthoc_ema import synthesize_from_dir

            phema_dir = args.phema_dir or os.path.join(
                os.path.dirname(os.path.abspath(args.ckpt)), "phema")
            bad_params = synthesize_from_dir(phema_dir, params,
                                             args.autoguide_sigma_rel)
            print(f"autoguide: bad model = sigma_rel="
                  f"{args.autoguide_sigma_rel} from {phema_dir}")
        bad_fn = lambda x, t, c, y: model.apply(bad_params, x, t, cond=c, y=y)
        giv = None
        if args.guidance_interval:
            lo, hi = (float(v) for v in args.guidance_interval.split(","))
            giv = (lo, hi)
        # the interval gate sees the MODEL-facing t; invert it to the
        # process's normalized noise level (flow: t*time_scale; EDM:
        # ln(sigma)/4*time_scale -> sigma/sigma_max, the same convention
        # edm.py's native CFG gate uses; DDPM chains: index/(T-1))
        proc = diffusion.diffusion if preset.is_latent else diffusion
        if preset.process in ("flow", "meanflow"):
            # meanflow packs t as [N, 2]=(t, r); row 0 of either layout is
            # the CURRENT time the gate should see
            nf = lambda t: jnp.reshape(t, (t.shape[0], -1))[0, 0] / proc.time_scale
        elif preset.process == "edm":
            nf = lambda t: (jnp.exp(4.0 * t[0] / proc.time_scale)
                            / proc.sigma_max)
        else:
            nf = None  # default t[0]/(timesteps-1)
        model_fn = autoguided_model_fn(
            model_fn, bad_fn, args.autoguide_scale,
            guidance_rescale=args.guidance_rescale, guidance_interval=giv,
            timesteps=timesteps, noise_frac_fn=nf)

    if args.pag_scale > 0.0:
        # perturbed-attention guidance (arXiv:2403.17377): the "bad" branch
        # is the SAME model with self-attention -> identity; no extra
        # checkpoint, no condition. Wraps under any DDPM-chain/flow/EDM
        # sampler; the distilled students are already few-step maps.
        from eo_diffusion_tpu.diffusion.pag import pag_model_fn

        assert args.deepcache <= 1, (
            "DeepCache's stateful fn wraps (model, params) directly and "
            "would bypass the PAG combine; drop one of the two")
        assert args.sampler not in ("cm", "pd"), (
            f"the {args.sampler} student is already a distilled few-step "
            "map; PAG does not apply")
        model_fn = pag_model_fn(model_fn, args.pag_scale)
        print(f"PAG enabled: scale={args.pag_scale}")

    # classifier guidance (Dhariwal & Nichol 2021): wrap the denoiser with a
    # noisy-image classifier's input gradient. The reference vendors the
    # EncoderUNetModel (backbones/unet.py:845+) but never trains or wires
    # it; cli.train_classifier produces the checkpoint consumed here.
    classifier_fn, clf_classes = None, 0
    if args.classifier_ckpt:
        import json

        from eo_diffusion_tpu.cli.presets import get_preset as _gp
        from eo_diffusion_tpu.cli.train_classifier import build_classifier
        from eo_diffusion_tpu.train.checkpoint import restore_params as _rp

        assert not preset.is_latent, (
            "classifier guidance reads pixels; latent presets are not wired")
        assert args.sampler in ("ddpm", "ddim", "dpm", "unipc"), (
            "classifier guidance steers the DDPM chain via an eps-space "
            f"gradient; --sampler {args.sampler} does not apply")
        assert args.deepcache <= 1, (
            "classifier guidance wraps the plain denoiser fn; it is not "
            "composed with DeepCache's stateful fn")
        assert args.guidance_scale == 1.0, (
            "classifier guidance and classifier-FREE guidance are separate "
            "steering mechanisms (CFG doubles the batch under the wrapper, "
            "breaking the classifier's per-sample labels); pick one")
        with open(os.path.join(args.classifier_ckpt, "classifier.json")) as f:
            cmeta = json.load(f)
        clf_preset = _gp(cmeta["preset"])
        assert clf_preset.image_size == image_size, (
            f"classifier was trained at {clf_preset.image_size}px "
            f"(preset {cmeta['preset']}); sampling at {image_size}px")
        clf_classes = int(cmeta["num_classes"])
        clf = build_classifier(clf_preset, clf_classes)
        _, clf_params = _rp(os.path.join(args.classifier_ckpt, "classifier"),
                            None)
        classifier_fn = lambda x, t: clf.apply(clf_params, x, t)
        print(f"classifier guidance: scale={args.classifier_scale}, "
              f"{clf_classes} classes from {args.classifier_ckpt}")

    # per-dataset class vocabulary for samples_fid naming (the reference
    # hardcodes the Inria cities for every dataset, inference.py:110-111)
    from eo_diffusion_tpu.data.datasets import class_names

    classes = class_names(dataset, num_classes or 0)

    dir_samples = os.path.join(args.outdir, "samples")
    dir_fid = os.path.join(args.outdir, "samples_fid")
    os.makedirs(dir_samples, exist_ok=True)
    os.makedirs(dir_fid, exist_ok=True)
    offset = len(os.listdir(dir_samples)) if cond_type is None else len(os.listdir(dir_samples)) // 3

    print("start inference")
    rng = jax.random.PRNGKey(args.seed)
    mask_rng = np.random.default_rng(args.seed)
    ssim_sum, psnr_sum, n = 0.0, 0.0, 0
    # cm/pd runners are memoized by batch size: jax.jit's cache keys on
    # function identity, so a fresh closure per batch would re-trace (and
    # re-compile through the remote-compile tunnel) every iteration
    jit_cache = {}
    for j, batch in enumerate(test_loader):
        print(f"data {j}")
        image = np.asarray(batch["image"], np.float32)
        bsz = image.shape[0]
        cond, mask = _build_cond(batch, build_cond_type, image_size,
                                 random_label=args.random_label, mask_rng=mask_rng,
                                 sr_factor=preset.sr_factor)

        # class rotation like inference.py:110 (guarded: the reference
        # divides by zero when num_classes == 1)
        y = (np.full((bsz,), min(j % max(num_classes - 1, 1), num_classes - 1))
             if num_classes else None)
        catg = classes[int(y[0])] if y is not None else "sample"

        # classifier-free guidance kwargs (shared combine, gaussian.py
        # cfg_double_inputs): label-CFG against the learned null class when
        # class-conditional, else image-CFG against a zero conditioning view
        gkw = {}
        if args.guidance_scale != 1.0:
            gkw["guidance_scale"] = args.guidance_scale
            if args.guidance_rescale:
                gkw["guidance_rescale"] = args.guidance_rescale
            if args.guidance_interval:
                lo, hi = (float(v) for v in args.guidance_interval.split(","))
                assert 0.0 <= lo < hi <= 1.0, (
                    f"--guidance_interval {args.guidance_interval}: need "
                    "0 <= LO < HI <= 1 (normalized noise level)")
                gkw["guidance_interval"] = (lo, hi)
            if num_classes and y is not None:
                # label-CFG needs the learned null row (index num_classes),
                # which only exists when the model was built/trained with
                # class_dropout_prob > 0 (--class_dropout here must match)
                if (getattr(ucfg, "label_vocab", 0) or 0) <= num_classes:
                    print("note: label-CFG needs a null-class row (train "
                          "with --class_dropout > 0); guidance ignored")
                    gkw = {}
                else:
                    gkw["y_uncond"] = np.full((bsz,), num_classes, np.int64)
            elif cond_type == "concat" and cond is not None:
                if args.sampler == "ddpm":
                    print("note: ddpm has no image-CFG path; guidance ignored")
                    gkw = {}
                else:
                    gkw["uncond"] = np.zeros_like(cond)
            else:
                print("note: --guidance_scale needs class- or concat-"
                      "conditioning; ignored")
                gkw = {}

        rng, srng = jax.random.split(rng)
        fn_j, st0 = model_fn, None
        if args.deepcache > 1:
            from eo_diffusion_tpu.diffusion.deepcache import deepcache_model_fn

            # the cached model sees the diffusion grid (latent for latent
            # presets) and, in latent mode, the first-stage-encoded cond.
            # CFG batch-doubling flows THROUGH the stateful fn, so the
            # cached-feature batch must be built doubled when guidance is on
            ex_b = bsz * (2 if gkw else 1)
            ex_cond = None
            if cond_type == "concat" and cond is not None:
                ex_cond = (jnp.zeros((bsz, gsize, gsize, cond_channels))
                           if preset.is_latent else jnp.asarray(cond))
                if gkw:
                    ex_cond = jnp.concatenate([ex_cond, ex_cond], axis=0)
            fn_j, st0 = deepcache_model_fn(
                model, ema_params,
                jnp.zeros((ex_b, gsize, gsize, gchan)),
                example_y=jnp.zeros((ex_b,), jnp.int32) if y is not None else None,
                example_cond=ex_cond,
                refresh_every=args.deepcache,
            )
        if classifier_fn is not None and args.classifier_scale:
            from eo_diffusion_tpu.diffusion.classifier_guidance import (
                classifier_guided,
            )

            # unconditional denoisers still get per-batch guidance targets:
            # rotate through the classifier's vocabulary like the y rotation
            clf_y = y if y is not None else np.full((bsz,), j % clf_classes)
            fn_j = classifier_guided(diffusion, fn_j, classifier_fn,
                                     jnp.asarray(clf_y, jnp.int32),
                                     scale=args.classifier_scale)
            if y is None:
                catg = class_names(dataset, clf_classes)[int(clf_y[0])]
        if args.sdedit_strength:
            from eo_diffusion_tpu.diffusion.edit import sdedit_sample

            # source = the paired view when the dataset has one (cloudy S2,
            # degraded SR input, ...), else the gt image itself; metrics
            # below then score edit fidelity against the gt
            source = np.asarray(batch["cond_image"], np.float32) \
                if "cond_image" in batch else image
            out = sdedit_sample(
                diffusion, fn_j, srng, jnp.asarray(source),
                args.sdedit_strength, num_steps=args.sampler_steps,
                eta=args.eta,
                method=(args.flow_method if args.sampler == "flow"
                        else args.ddim_spacing),
                cond=jnp.asarray(cond) if cond_type == "concat" and cond is not None else None,
                y=jnp.asarray(y) if y is not None else None,
                model_state=st0, **gkw,
            )
            samples = np.asarray(out.x, np.float32)
        elif args.sampler == "cm":
            from eo_diffusion_tpu.diffusion.consistency import (
                ConsistencyDistillation,
            )

            # latent presets: the student was distilled on the INNER chain
            # (cli/distill.py runs entirely on the latent grid), so cm hops
            # happen in latent space and the first stage decodes the result
            # — same division as every other sampler, done here explicitly
            # because ConsistencyDistillation reads schedule tables the
            # LatentDiffusion wrapper doesn't forward
            inner = diffusion.diffusion if preset.is_latent else diffusion
            cd = ConsistencyDistillation.create(inner,
                                                n_points=args.cd_points,
                                                sigma_data=args.sigma_data)

            # one jitted program with params THREADED (a closed-over tree
            # is the HTTP-413 remote-compile failure mode, CLAUDE.md), and
            # the f-hops compile as one computation instead of per-call
            # dispatches through the tunnel
            if ("cm", bsz) not in jit_cache:
                def _cm_run(params, rng, cc, yy, _bsz=bsz, _cd=cd):
                    fn = lambda x, t, c, yv: model.apply(params, x, t,
                                                         cond=c, y=yv)
                    if preset.is_latent and cc is not None:
                        cc = diffusion.encode(cc)  # cond rides first stage
                    z = _cd.sample(fn, rng, _bsz, steps=args.sampler_steps,
                                   cond=cc, y=yy).x
                    return diffusion.decode(z) if preset.is_latent else z

                jit_cache[("cm", bsz)] = jax.jit(_cm_run)
            out_x = jit_cache[("cm", bsz)](
                ema_params, srng,
                jnp.asarray(cond) if cond_type == "concat" and cond is not None else None,
                jnp.asarray(y) if y is not None else None)
            samples = np.asarray(out_x, np.float32)
        elif args.sampler == "pd":
            import dataclasses as _dc

            from eo_diffusion_tpu.diffusion.progressive import pd_sample

            # same latent division as cm: the student was distilled on the
            # INNER chain, so pd hops run in latent space and the first
            # stage decodes the result. PD students are v-parameterized
            # (cli.distill --method progressive; diffusion/progressive.py)
            inner = diffusion.diffusion if preset.is_latent else diffusion
            inner = _dc.replace(inner, objective="v")

            if ("pd", bsz) not in jit_cache:
                def _pd_run(params, rng, cc, yy, _bsz=bsz, _inner=inner):
                    fn = lambda x, t, c, yv: model.apply(params, x, t,
                                                         cond=c, y=yv)
                    if preset.is_latent and cc is not None:
                        cc = diffusion.encode(cc)
                    z = pd_sample(_inner, fn, rng, _bsz,
                                  steps=args.sampler_steps,
                                  cond=cc, y=yy).x
                    return diffusion.decode(z) if preset.is_latent else z

                jit_cache[("pd", bsz)] = jax.jit(_pd_run)
            out_x = jit_cache[("pd", bsz)](
                ema_params, srng,
                jnp.asarray(cond) if cond_type == "concat" and cond is not None else None,
                jnp.asarray(y) if y is not None else None)
            samples = np.asarray(out_x, np.float32)
        elif args.sampler == "flow":
            if preset.process == "bridge":
                # paired translation: cond is the bridge endpoint (required)
                assert cond_type == "concat" and cond is not None, (
                    "bridge sampling needs the source image (a dataset with "
                    "cond_image and cond_type='concat')")
                out = diffusion.sample(
                    fn_j, srng, bsz, num_steps=args.sampler_steps,
                    cond=jnp.asarray(cond),
                    y=jnp.asarray(y) if y is not None else None,
                    # --eta governs posterior noise exactly like DDIM's
                    # (default 0 = deterministic mean path)
                    clip=not args.no_clip, eta=args.eta,
                    model_state=st0,
                )
            else:
                mask_j = jnp.asarray(mask) if (cond_type == "sum" and mask is not None) else None
                out = diffusion.sample(
                    fn_j, srng, bsz, num_steps=args.sampler_steps,
                    method=args.flow_method,
                    cond=jnp.asarray(cond) if cond_type == "concat" and cond is not None else None,
                    y=jnp.asarray(y) if y is not None else None,
                    mask=mask_j,
                    x0=jnp.asarray(image) if mask_j is not None else None,
                    model_state=st0, **gkw,
                )
            samples = np.asarray(out.x, np.float32)
        elif args.sampler == "dpm":
            mask_j = jnp.asarray(mask) if (cond_type == "sum" and mask is not None) else None
            out = diffusion.dpm_sample(
                fn_j, srng, bsz, num_steps=args.sampler_steps,
                cond=jnp.asarray(cond) if cond_type == "concat" and cond is not None else None,
                y=jnp.asarray(y) if y is not None else None,
                mask=mask_j,
                x0=jnp.asarray(image) if mask_j is not None else None,
                dynamic_threshold=args.dynamic_threshold,
                time_spacing=args.dpm_spacing,
                model_state=st0, **gkw,
            )
            samples = np.asarray(out.x, np.float32)
        elif args.sampler == "unipc":
            mask_j = jnp.asarray(mask) if (cond_type == "sum" and mask is not None) else None
            out = diffusion.unipc_sample(
                fn_j, srng, bsz, num_steps=args.sampler_steps,
                cond=jnp.asarray(cond) if cond_type == "concat" and cond is not None else None,
                y=jnp.asarray(y) if y is not None else None,
                mask=mask_j,
                x0=jnp.asarray(image) if mask_j is not None else None,
                dynamic_threshold=args.dynamic_threshold,
                model_state=st0, **gkw,
            )
            samples = np.asarray(out.x, np.float32)
        elif args.sampler == "ddpm":
            out = diffusion.ddpm_sample(
                fn_j, srng, bsz,
                cond=jnp.asarray(cond) if cond is not None else None,
                y=jnp.asarray(y) if y is not None else None,
                clip=not args.no_clip,
                dynamic_threshold=args.dynamic_threshold,
                jump_len=args.jump_len, jump_n=args.jump_n,
                model_state=st0, **gkw,
            )
            samples = np.asarray(out.x, np.float32)
        else:
            mask_j = jnp.asarray(mask) if (cond_type == "sum" and mask is not None) else None
            out = diffusion.ddim_sample(
                fn_j, srng, bsz, num_steps=args.sampler_steps, eta=args.eta,
                method=args.ddim_spacing,
                cond=jnp.asarray(cond) if cond_type == "concat" and cond is not None else None,
                y=jnp.asarray(y) if y is not None else None,
                mask=mask_j,
                x0=jnp.asarray(image) if mask_j is not None else None,
                clip=args.ddim_clip,
                dynamic_threshold=args.dynamic_threshold,
                model_state=st0, **gkw,
            )
            samples = np.asarray(out.x, np.float32)

        samples01 = rescale_to_unit(samples, data_range)
        idx = j + offset
        if cond is not None:
            # visualize cond: dimmed-out masked image when a mask drives it
            # (inference.py:134), else the conditioning view itself (cloudy)
            cond_vis = (image * np.clip(mask + 0.7, 0, 1) if mask is not None
                        else cond[..., : image.shape[-1]])
            gt01 = rescale_to_unit(image, data_range)
            cond01 = rescale_to_unit(cond_vis, data_range)
            if args.metrics:
                s = float(M.ssim(jnp.asarray(samples01), jnp.asarray(gt01)))
                p = float(M.psnr(jnp.asarray(samples01), jnp.asarray(gt01)))
                ssim_sum, psnr_sum = ssim_sum + s, psnr_sum + p
            if args.save:
                nrow = int(math.sqrt(bsz)) or 1
                save_image_grid(gt01, os.path.join(dir_samples, f"sample_{idx}_gt.png"), nrow=nrow)
                save_image_grid(cond01, os.path.join(dir_samples, f"sample_{idx}_cond.png"), nrow=nrow)
        if args.samples_fid:
            for i in range(samples01.shape[0]):
                save_image_grid(samples01[i], os.path.join(dir_fid, f"{catg}_{idx}-{i}.png"))
        if args.save:
            save_image_grid(samples01, os.path.join(dir_samples, f"sample_{idx}.png"),
                            nrow=int(math.sqrt(bsz)) or 1)
        n += 1
        if args.metrics and n:
            print("metrics: ", ssim_sum / n, psnr_sum / n)
            with open(os.path.join(args.outdir, "metrics.txt"), "w") as f:
                f.write(f"ssim: {ssim_sum / n}\n")
                f.write(f"psnr: {psnr_sum / n}\n")
                f.write(f"length: {n}\n")
        if args.n_iter is not None and j >= args.n_iter:
            break


if __name__ == "__main__":
    args = parse_args()
    if args.cpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    main(args)
