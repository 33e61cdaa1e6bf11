"""Export CLI: package a trained model as a self-contained AOT artifact.

``python -m eo_diffusion_tpu.cli.export_model --preset clouds64-attn
--ckpt logs/run/best --out artifacts/clouds64 --sampler ddim
--sampler_steps 50``

Builds the exact serving engine ``cli.serve`` would run (same preset
registry, checkpoint loading, guidance wiring, int8 packing), then
serializes its one compiled sampler + weights via ``serving/export.py``.
``--run`` reloads the artifact from disk and executes a batch through the
deserialized program (writes ``smoke.png``), proving the artifact is
complete. Beyond-reference: the reference has no deployment packaging
(SURVEY.md §2 #5 is an offline eval script).
"""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Export a compiled sampler as a StableHLO artifact")
    p.add_argument("--preset", type=str, default="clouds64-attn")
    p.add_argument("--ckpt", type=str, default="",
                   help="Orbax checkpoint dir (EMA exported) or torch .pt; "
                        "empty = random init (smoke only)")
    p.add_argument("--out", type=str, required=True,
                   help="artifact directory to write")
    p.add_argument("--batch_size", type=int, default=8)
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
                   help="bake perturbed-attention guidance "
                        "(arXiv:2403.17377) into the exported program")
    p.add_argument("--guidance_rescale", type=float, default=0.0)
    p.add_argument("--guidance_interval", type=str, default=None,
                   metavar="LO,HI")
    p.add_argument("--num_classes", type=int, default=0)
    p.add_argument("--class_dropout", type=float, default=0.0)
    p.add_argument("--cond_type", type=str, default=None)
    p.add_argument("--timesteps", type=int, default=None)
    p.add_argument("--image_size", type=int, default=None)
    p.add_argument("--no_bf16", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="export weight-only int8 params (W8A16): the packed "
                        "int8 leaves + scales land in params.npz and the "
                        "dequant runs inside the exported program")
    p.add_argument("--int8_compute", action="store_true",
                   help="bake W8A8 int8 MXU compute into the exported "
                        "program (nn/primitives.int8_dense_compute; "
                        "DiT-preset lever)")
    p.add_argument("--ae_ckpt", type=str, default=None)
    p.add_argument("--platforms", type=str, default=None,
                   help="comma list (e.g. 'tpu,cpu'); default = current "
                        "backend")
    p.add_argument("--run", action="store_true",
                   help="reload the artifact from disk and run one batch "
                        "through the deserialized program (writes smoke.png)")
    p.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def main(args):
    import os

    from eo_diffusion_tpu.cli import serve as serve_cli
    from eo_diffusion_tpu.serving.export import export_engine, load_model

    # the export engine IS the serving engine: reuse its builder with the
    # serve CLI's defaults for everything this CLI doesn't expose
    base = serve_cli.parse_args(["--preset", args.preset])
    for k, v in vars(args).items():
        if hasattr(base, k):
            setattr(base, k, v)
    engine, batcher, meta = serve_cli.build_engine(base)
    batcher.shutdown()  # packaging only — no request worker needed

    platforms = (tuple(s.strip() for s in args.platforms.split(","))
                 if args.platforms else None)
    manifest = export_engine(engine, args.out, extra_meta=meta,
                             platforms=platforms)
    print(f"exported {manifest['param_bytes'] / 1e6:.1f} MB params + "
          f"{manifest['sampler']}-{manifest['steps']} sampler "
          f"(platforms {manifest['platforms']}) -> {args.out}")

    if args.run:
        from eo_diffusion_tpu.utils.images import save_image_grid

        generate, man = load_model(args.out)
        out = generate(args.seed)
        lo, hi = man.get("data_range", (0.0, 1.0))
        png = os.path.join(args.out, "smoke.png")
        save_image_grid(out, png, data_range=(lo, hi))
        print(f"smoke batch {out.shape} from the deserialized program -> "
              f"{png}")
    return args.out


if __name__ == "__main__":
    main(parse_args())
