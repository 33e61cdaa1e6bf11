"""Serving CLI: always-warm batched sampling behind an HTTP API.

``python -m eo_diffusion_tpu.cli.serve --preset clouds64-attn
--ckpt logs/run/best --sampler ddim --sampler_steps 50 --port 8000``

Beyond-reference subsystem (the reference's inference.py is an offline
eval script, SURVEY.md §2 #5): compiles ONE fixed-shape sampler at
startup, then coalesces concurrent ``POST /v1/generate`` requests into
full device batches (``serving/engine.py``). Conditioning matches the
inference CLI: class labels (``"y"``), concat cond images
(``"cond_b64"``), optional classifier-free guidance fixed at startup.
"""

from __future__ import annotations

import argparse
import os


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="EO diffusion serving (TPU-native)")
    p.add_argument("--preset", type=str, default="clouds64-attn")
    p.add_argument("--ckpt", type=str, default="",
                   help="Orbax checkpoint dir (EMA params are served) or "
                        "torch .pt file; empty = random init (smoke only)")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--batch_size", type=int, default=8,
                   help="fixed device batch; requests coalesce into it")
    p.add_argument("--batch_window_ms", type=float, default=20.0,
                   help="max wait after the first request to fill a batch")
    p.add_argument("--sampler", type=str, default="ddim",
                   choices=["ddpm", "ddim", "dpm", "unipc", "flow", "bridge"])
    p.add_argument("--sampler_steps", type=int, default=50)
    p.add_argument("--eta", type=float, default=0.0)
    p.add_argument("--ddim_spacing", type=str, default="uniform",
                   choices=["uniform", "quad", "trailing"])
    p.add_argument("--flow_method", type=str, default="euler",
                   choices=["euler", "heun"])
    p.add_argument("--guidance_scale", type=float, default=1.0)
    p.add_argument("--pag_scale", type=float, default=0.0,
                   help="perturbed-attention guidance (arXiv:2403.17377): "
                        "self-attention->identity degraded branch, no "
                        "condition needed; ddpm/ddim/dpm/unipc/flow")
    p.add_argument("--int8", action="store_true",
                   help="weight-only int8 serving (utils/quantize.py): "
                        "kernels stored as per-channel int8 + scales, "
                        "dequantized inside the compiled program (W8A16)")
    p.add_argument("--int8_compute", action="store_true",
                   help="W8A8: large Dense matmuls run on the MXU int8 "
                        "path (nn/primitives.int8_dense_compute) — a "
                        "DiT-preset lever (2x on the proj GEMM, ~1x on "
                        "convs; gallery/int8_mxu_probe.json)")
    p.add_argument("--guidance_rescale", type=float, default=0.0,
                   help="CFG-rescale phi (arXiv:2305.08891 §3.4)")
    p.add_argument("--guidance_interval", type=str, default=None,
                   metavar="LO,HI",
                   help="limited guidance interval (arXiv:2404.07724), "
                        "normalized noise level in [0,1]")
    p.add_argument("--dynamic_threshold", type=float, default=None,
                   metavar="P",
                   help="Imagen dynamic thresholding percentile "
                        "(arXiv:2205.11487): per-sample pred-x0 rescale "
                        "instead of the static clamp; ddpm/ddim/dpm/unipc")
    p.add_argument("--num_classes", type=int, default=0)
    p.add_argument("--class_dropout", type=float, default=0.0,
                   help="must match training (builds the null-class row "
                        "label-CFG guides against)")
    p.add_argument("--cond_type", type=str, default=None)
    p.add_argument("--timesteps", type=int, default=None)
    p.add_argument("--image_size", type=int, default=None)
    p.add_argument("--no_bf16", action="store_true")
    p.add_argument("--dp", action="store_true",
                   help="shard each device batch over all visible chips "
                        "(data-parallel serving; the device count must "
                        "divide batch_size)")
    p.add_argument("--ae_ckpt", type=str, default=None,
                   help="latent presets: trained first-stage directory "
                        "(default: 'ae' beside --ckpt)")
    p.add_argument("--data_range", type=float, nargs=2, default=None,
                   metavar=("LO", "HI"),
                   help="training data range for PNG rescale (default: the "
                        "dataset's registry entry)")
    p.add_argument("--request_timeout", type=float, default=300.0)
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def build_engine(args):
    """Construct (SamplerEngine, BatchingEngine, meta) from the preset."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from eo_diffusion_tpu.cli.presets import (build_denoiser, build_process,
                                              get_preset)
    from eo_diffusion_tpu.serving.engine import (BatchingEngine, SamplerEngine,
                                                 ServingConfig)

    preset = get_preset(args.preset)
    image_size = args.image_size or preset.image_size
    preset.image_size = image_size
    timesteps = args.timesteps or preset.timesteps
    cond_type = args.cond_type if args.cond_type is not None else preset.cond_type
    if cond_type == "none":  # explicit unconditional override: presets whose
        cond_type = None     # default is RePaint-"sum" can still be served
    num_classes = args.num_classes if args.num_classes > 0 else 0
    assert cond_type in (None, "concat"), (
        "serving supports unconditional or concat conditioning; RePaint-"
        "'sum' needs a per-request gt/mask protocol (use cli.inference)")
    if preset.process in ("flow", "edm", "meanflow"):
        args.sampler = "flow"  # the process's native sampler surface
        if preset.process == "meanflow" and args.flow_method != "euler":
            # MeanFlow's displacement IS the step; no higher-order corrector
            print("note: meanflow serving ignores --flow_method "
                  + args.flow_method)
            args.flow_method = "euler"
    elif preset.process == "bridge":
        # translation serving: the request's cond image IS the source the
        # bridge starts from (x_{T-1} = y); no other sampler applies
        assert cond_type == "concat", (
            "bridge presets translate the concat-cond source image; "
            "--cond_type none makes no sense here")
        assert args.guidance_scale == 1.0, (
            "the Brownian bridge has no CFG path (no uncond branch)")
        args.sampler = "bridge"

    # concat serving: the request supplies the PIXEL conditioning view
    # (e.g. the cloudy image for cloud removal); latent presets encode it
    # through the first stage (cond_via_encoder), so the model-facing cond
    # width is the latent channel count while requests stay pixel-wide
    cond_channels = preset.in_channels if cond_type == "concat" else 0
    model_cond_ch = ((preset.latent_channels if preset.is_latent
                      else cond_channels) if cond_channels else 0)
    ucfg = preset.model_config(num_classes=num_classes or None,
                               bf16=not args.no_bf16,
                               cond_channels=model_cond_ch,
                               class_dropout_prob=args.class_dropout)
    model = build_denoiser(ucfg)
    diffusion = build_process(preset, timesteps, image_size,
                              cond_type=cond_type)
    if preset.is_latent:
        from eo_diffusion_tpu.diffusion.latent import LatentDiffusion
        from eo_diffusion_tpu.train import ae_trainer as AET

        ae_dir = args.ae_ckpt or (os.path.join(os.path.dirname(args.ckpt), "ae")
                                  if args.ckpt else "")
        assert ae_dir and AET.ae_exists(ae_dir), (
            f"latent preset {preset.name} needs a trained first stage; none "
            f"at {ae_dir!r} (train one with cli.train, or pass --ae_ckpt)")
        ae_model, ae_params, ae_scale = AET.load_ae(ae_dir)
        enc, dec = AET.make_codec(ae_model, ae_params)
        diffusion = LatentDiffusion(diffusion, enc, dec,
                                    scale_factor=ae_scale,
                                    cond_via_encoder=True)

    # model init happens on the diffusion grid (latent for latent presets)
    gsize = preset.latent_size if preset.is_latent else image_size
    gchan = preset.latent_channels if preset.is_latent else preset.in_channels
    x0 = jnp.zeros((1, gsize, gsize, gchan))
    init_kw = ({"cond": jnp.zeros((1, gsize, gsize, model_cond_ch))}
               if model_cond_ch else {})
    if num_classes:
        init_kw["y"] = jnp.zeros((1,), jnp.int32)
    from eo_diffusion_tpu.models import time_template

    params = jax.jit(model.init)(jax.random.PRNGKey(args.seed), x0,
                                 time_template(model), **init_kw)
    if args.ckpt:
        if os.path.isdir(args.ckpt):
            from eo_diffusion_tpu.train.checkpoint import restore_params

            _, params = restore_params(args.ckpt, params)  # serve the EMA
        else:
            from eo_diffusion_tpu.tools.convert_ckpt import load_torch_checkpoint

            params = load_torch_checkpoint(args.ckpt, ucfg)
        params = jax.tree.map(jnp.asarray, params)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

    has_null = bool(num_classes
                    and (getattr(ucfg, "label_vocab", 0) or 0) > num_classes)
    if args.guidance_scale != 1.0 and num_classes and not has_null:
        print("note: label-CFG needs a null-class row (--class_dropout > 0 "
              "to match training); serving unguided")
        args.guidance_scale = 1.0
    if args.guidance_scale != 1.0 and not (num_classes or cond_channels):
        print("note: --guidance_scale needs class- or concat-conditioning; "
              "serving unguided")
        args.guidance_scale = 1.0

    scfg = ServingConfig(
        batch_size=args.batch_size, sampler=args.sampler,
        steps=args.sampler_steps, eta=args.eta,
        ddim_spacing=args.ddim_spacing, flow_method=args.flow_method,
        guidance_scale=args.guidance_scale,
        pag_scale=args.pag_scale,
        guidance_rescale=args.guidance_rescale,
        dynamic_threshold=args.dynamic_threshold,
        guidance_interval=(tuple(float(v) for v in
                                 args.guidance_interval.split(","))
                           if args.guidance_interval else None),
        num_classes=num_classes,
        has_null_class=has_null, cond_channels=cond_channels,
        bf16=not args.no_bf16, batch_window_ms=args.batch_window_ms,
        request_timeout_s=args.request_timeout, dp=args.dp, int8=args.int8,
        int8_compute=args.int8_compute)
    engine = SamplerEngine(model, params, diffusion, image_size,
                           preset.in_channels, scfg)
    batcher = BatchingEngine(engine, base_seed=args.seed)
    from eo_diffusion_tpu.data.datasets import get_metadata

    if args.data_range is not None:
        lo, hi = args.data_range
    else:
        try:
            lo, hi = get_metadata(preset.dataset)["data_range"]
        except Exception:
            # the synthetic factory's default; EO presets train in [-1, 1]
            lo, hi = ((0.0, 1.0) if preset.dataset == "synthetic"
                      else (-1.0, 1.0))
    meta = {"preset": preset.name, "sampler": args.sampler,
            "steps": args.sampler_steps, "batch_size": args.batch_size,
            "image_size": image_size, "channels": preset.in_channels,
            "num_classes": num_classes, "cond_channels": cond_channels,
            "guidance_scale": args.guidance_scale,
            "pag_scale": args.pag_scale,
            "params_m": round(n_params / 1e6, 3),
            "data_range": (float(lo), float(hi))}
    return engine, batcher, meta


def main(args):
    from eo_diffusion_tpu.serving.http import make_server, serve_forever

    engine, batcher, meta = build_engine(args)
    print(f"serving {meta['params_m']}M params | {meta}")
    warm_s = engine.warmup()
    print(f"warmup (compile + first batch): {warm_s:.1f}s")
    def reload_fn(path):
        import jax
        import jax.numpy as jnp

        from eo_diffusion_tpu.train.checkpoint import restore_params

        assert os.path.isdir(path), f"not a checkpoint directory: {path}"
        _, ema = restore_params(path, engine.params)  # serve the EMA
        engine.swap_params(jax.tree.map(jnp.asarray, ema))
        return {"ckpt": path}

    srv, port = make_server(batcher, meta, host=args.host, port=args.port,
                            verbose=args.verbose, reload_fn=reload_fn)
    print(f"listening on http://{args.host}:{port}  "
          f"(POST /v1/generate, POST /v1/reload, GET /healthz, GET /stats)")
    try:
        serve_forever(srv)
    except KeyboardInterrupt:
        pass
    finally:
        srv.shutdown()
        batcher.shutdown()


if __name__ == "__main__":
    main(parse_args())
