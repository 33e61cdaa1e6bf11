"""Matched-NFE control for the PD capstone: the teacher's own DDIM-2/DDIM-1
KID on the restore64 protocol, merged into gallery/restore64_metrics.json.

capstone_restore.py compares pd2/pd4 against teacher DDIM-4/DDIM-25; the
apples-to-apples comparison for a 2-step student is teacher DDIM-2.
"""

from __future__ import annotations

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


def main():
    import tools.capstone_dit_flow as C
    from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from eo_diffusion_tpu.utils import metrics as M

    C.CKPT = os.path.join(ROOT, "logs", "capstone_restore")
    imgs = C.dataset_images(2048)
    extractor = M.tiny_feature_extractor()
    real_feats = np.asarray(extractor(jnp.asarray(imgs[:256])))
    data_grad = float(np.mean(np.abs(np.diff(imgs[:256], axis=1))))

    diffusion = GaussianDiffusion.create(timesteps=1000, image_size=C.SIZE,
                                         in_channels=3)
    model = C.build_flow_unet()
    teacher = C.load_ema("restore_teacher", model)
    fn_of = lambda p: (lambda x, t, c, y: model.apply(p, x, t, cond=c, y=y))

    def run_ddim(model, p, rng, bs, steps):
        return diffusion.ddim_sample(fn_of(p), rng, bs, num_steps=steps,
                                     dtype=jnp.bfloat16).x.astype(jnp.float32)

    results = {}
    C.evaluate("restore64_teacher", model, teacher, run_ddim,
               [("ddim1", {"steps": 1}), ("ddim2", {"steps": 2})],
               real_feats, data_grad, results)

    path = os.path.join(ROOT, "gallery", "restore64_metrics.json")
    with open(path) as f:
        merged = json.load(f)
    merged.update(results)
    with open(path, "w") as f:
        json.dump(merged, f, indent=2)
    print(f"merged {list(results)} into {path}", flush=True)


if __name__ == "__main__":
    main()
