"""EDM capstone (round 3): trained Karras-formulation model on the chip.

Trains the same 64px UNet / synthetic-EO protocol as the flow64 capstone
(tools/capstone_dit_flow.py) under the EDM objective (diffusion/edm.py)
and scores the Karras-grid sampler at Heun-10/18 (+ the stochastic-churn
variant) and Euler-20 with the same KID/grad/extractor pipeline, so the
three process families (DDPM chain / rectified flow / EDM) are directly
comparable on one dataset: gallery/edm64_*.png + gallery/edm64_metrics.json.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/capstone_edm.py \
           [--steps 6000] [--skip_train] [--smoke]
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(ROOT, "logs", "capstone_edm")
GALLERY = os.path.join(ROOT, "gallery")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--skip_train", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny CPU config to exercise the script end-to-end")
    args = ap.parse_args()

    import tools.capstone_dit_flow as C

    from eo_diffusion_tpu.diffusion.edm import EDMProcess
    from eo_diffusion_tpu.models.unet import UNet, UNetConfig
    from eo_diffusion_tpu.utils import metrics as M

    if args.smoke:
        C.SIZE, C.BATCH, C.N_EVAL = 8, 16, 32
        args.steps = min(args.steps, 30)
    C.CKPT = CKPT  # checkpoints land under logs/capstone_edm
    size = C.SIZE

    os.makedirs(CKPT, exist_ok=True)
    os.makedirs(GALLERY, exist_ok=True)
    imgs = C.dataset_images(256 if args.smoke else 2048)
    extractor = M.tiny_feature_extractor()
    real_feats = np.asarray(extractor(jnp.asarray(imgs[:256])))
    data_grad = float(np.mean(np.abs(np.diff(imgs[:256], axis=1))))

    edm = EDMProcess.create(image_size=size, in_channels=3)
    if args.smoke:
        model = UNet(UNetConfig(image_size=size, in_channels=3,
                                model_channels=32, out_channels=3,
                                num_res_blocks=1, attention_resolutions=(),
                                channel_mult=(1, 2), num_heads=1,
                                dtype=jnp.float32))
    else:
        model = C.build_flow_unet()  # identical arch to the flow64 capstone

    results = {"data_grad": data_grad, "steps": args.steps}
    if not args.skip_train:
        results["edm_train"] = C.train("edm64", model, edm, imgs, args.steps)
    params = C.load_ema("edm64", model)

    def run_edm(model, p, rng, bs, steps, method, churn=0.0):
        fn = lambda x, t, c, y: model.apply(p, x, t, cond=c, y=y)
        return edm.sample(fn, rng, bs, num_steps=steps, method=method,
                          s_churn=churn,
                          dtype=jnp.bfloat16).x.astype(jnp.float32)

    C.evaluate("edm64", model, params, run_edm,
               [("heun10", {"steps": 10, "method": "heun"}),
                ("heun18", {"steps": 18, "method": "heun"}),
                ("heun18churn", {"steps": 18, "method": "heun",
                                 "churn": 10.0}),
                ("euler20", {"steps": 20, "method": "euler"})],
               real_feats, data_grad, results)

    out = os.path.join(GALLERY, "edm64_metrics.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
