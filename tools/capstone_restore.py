"""Round-3 capstone for the zero-shot/editing/distillation additions:

one 64px unconditional DDPM teacher on the shared synthetic-EO protocol
(tools/capstone_dit_flow.py harness), then — with NO further training on
the first two —

1. **DDNM restoration** (diffusion/inverse.py): SR4 / rect-inpaint /
   colorize on held-out images; SSIM/PSNR vs gt next to the naive A+y
   baseline, gallery grids per task.
2. **SDEdit** (diffusion/edit.py): blurred sources edited at strengths
   0.3/0.5/0.8 — SSIM-to-gt + KID per strength (low strength = faithful,
   high = regenerated).
3. **Progressive distillation** (diffusion/progressive.py): 16->8->4->2
   halving rounds; pd-2/pd-4 KID vs the teacher's own DDIM-4/DDIM-25.

Writes gallery/restore64_*.png + gallery/restore64_metrics.json.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/capstone_restore.py \
           [--teacher_steps 6000] [--pd_steps 2000] [--skip_teacher] [--smoke]
"""

from __future__ import annotations

import argparse
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
CKPT = os.path.join(ROOT, "logs", "capstone_restore")
GALLERY = os.path.join(ROOT, "gallery")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--teacher_steps", type=int, default=6000)
    ap.add_argument("--pd_steps", type=int, default=2000,
                    help="distill steps per halving round")
    ap.add_argument("--pd_rounds", type=int, default=3)
    ap.add_argument("--ddnm_steps", type=int, default=100)
    ap.add_argument("--skip_teacher", action="store_true")
    ap.add_argument("--skip_pd", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    import optax

    import tools.capstone_dit_flow as C
    from eo_diffusion_tpu.diffusion import inverse as I
    from eo_diffusion_tpu.diffusion.edit import sdedit_sample
    from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from eo_diffusion_tpu.diffusion.progressive import (
        ProgressiveDistillation,
        pd_sample,
    )
    from eo_diffusion_tpu.models.unet import UNet, UNetConfig
    from eo_diffusion_tpu.train.checkpoint import restore_params, save_checkpoint
    from eo_diffusion_tpu.train.trainer import TrainState
    from eo_diffusion_tpu.utils import metrics as M
    from eo_diffusion_tpu.utils.images import save_image_grid

    if args.smoke:
        C.SIZE, C.BATCH, C.N_EVAL = 8, 16, 32
        args.teacher_steps = min(args.teacher_steps, 30)
        args.pd_steps = min(args.pd_steps, 10)
        args.pd_rounds = 2
        args.ddnm_steps = 5
    C.CKPT = CKPT
    size = C.SIZE
    os.makedirs(CKPT, exist_ok=True)
    os.makedirs(GALLERY, exist_ok=True)

    imgs = C.dataset_images(256 if args.smoke else 2048)
    held = C.dataset_images(64 if args.smoke else 128, seed=77)  # never trained on
    extractor = M.tiny_feature_extractor()
    real_feats = np.asarray(extractor(jnp.asarray(imgs[:256])))
    data_grad = float(np.mean(np.abs(np.diff(imgs[:256], axis=1))))

    T = 100 if args.smoke else 1000
    diffusion = GaussianDiffusion.create(timesteps=T, image_size=size,
                                         in_channels=3)
    if args.smoke:
        model = UNet(UNetConfig(image_size=size, in_channels=3,
                                model_channels=32, out_channels=3,
                                num_res_blocks=1, attention_resolutions=(),
                                channel_mult=(1, 2), num_heads=1,
                                dtype=jnp.float32))
    else:
        model = C.build_flow_unet()
    dtype = jnp.float32 if args.smoke else jnp.bfloat16

    results = {"data_grad": data_grad}
    if not args.skip_teacher:
        results["teacher_train"] = C.train("restore_teacher", model,
                                           diffusion, imgs,
                                           args.teacher_steps)
    teacher = C.load_ema("restore_teacher", model)
    fn_of = lambda p: (lambda x, t, c, y: model.apply(p, x, t, cond=c, y=y))

    def grid_png(name, x01):
        save_image_grid(np.clip(x01, 0, 1)[:16],
                        os.path.join(GALLERY, name), nrow=4)

    to01 = lambda x: (np.asarray(x, np.float32) + 1.0) / 2.0

    # ---- 1. DDNM restoration ------------------------------------------------
    gt = jnp.asarray(held[:32])
    rect = np.zeros((1, size, size, 1), np.float32)
    q = size // 4
    rect[:, q: size - q, q: size - q] = 1.0  # center hole to regenerate
    tasks = {
        "sr4": I.sr_operator(4 if size % 4 == 0 else 2),
        "inpaint": I.inpaint_operator(jnp.asarray(1.0 - rect)),
        "colorize": I.gray_operator(3),
    }
    for name, op in tasks.items():
        y = op.forward(gt)
        naive = np.asarray(op.pinv(y))
        t0 = time.time()
        restored = jax.jit(
            lambda p, rng, yy: I.ddnm_sample(
                diffusion, fn_of(p), rng, yy, op,
                num_steps=args.ddnm_steps, dtype=dtype).x
        )(teacher, jax.random.PRNGKey(11), y)
        dt = time.time() - t0
        g01, r01, n01 = to01(gt), to01(restored), np.clip(to01(naive), 0, 1)
        results[f"ddnm_{name}"] = {
            "ssim": float(M.ssim(jnp.asarray(r01), jnp.asarray(g01))),
            "psnr": float(M.psnr(jnp.asarray(r01), jnp.asarray(g01))),
            "ssim_naive": float(M.ssim(jnp.asarray(n01), jnp.asarray(g01))),
            "psnr_naive": float(M.psnr(jnp.asarray(n01), jnp.asarray(g01))),
            "s_per_batch32": dt,
        }
        print(f"[ddnm] {name}: ssim {results[f'ddnm_{name}']['ssim']:.4f} "
              f"(naive {results[f'ddnm_{name}']['ssim_naive']:.4f}) psnr "
              f"{results[f'ddnm_{name}']['psnr']:.2f} "
              f"(naive {results[f'ddnm_{name}']['psnr_naive']:.2f}) "
              f"{dt:.1f}s", flush=True)
        grid_png(f"restore64_{name}_input.png", n01)
        grid_png(f"restore64_{name}_restored.png", r01)
        if name == "sr4":
            grid_png("restore64_gt.png", g01)

    # ---- 2. SDEdit strength sweep -------------------------------------------
    blur = I.sr_operator(4 if size % 4 == 0 else 2)
    src = blur.pinv(blur.forward(gt))  # blurred source to refine
    grid_png("restore64_sdedit_source.png", to01(src))
    for s in (0.3, 0.5, 0.8):
        out = jax.jit(
            lambda p, rng, ss: sdedit_sample(
                diffusion, fn_of(p), rng, ss, s, num_steps=50, dtype=dtype).x
        )(teacher, jax.random.PRNGKey(13), src)
        o01 = to01(out)
        feats = np.asarray(extractor(jnp.asarray(np.clip(out, -1, 1))))
        k, _ = M.kid(real_feats, feats)
        results[f"sdedit_{s}"] = {
            "ssim_gt": float(M.ssim(jnp.asarray(o01), jnp.asarray(to01(gt)))),
            "ssim_src": float(M.ssim(jnp.asarray(o01), jnp.asarray(np.clip(to01(src), 0, 1)))),
            "kid": float(k),
        }
        print(f"[sdedit] strength {s}: {results[f'sdedit_{s}']}", flush=True)
        grid_png(f"restore64_sdedit_{s}.png", o01)

    # ---- 3. Progressive distillation ----------------------------------------
    if not args.skip_pd:
        student = teacher
        n_teacher = 16
        drng = np.random.default_rng(5)
        for r in range(args.pd_rounds):
            n_student = n_teacher // 2
            # round 1: eps teacher -> v student; later rounds v -> v
            pd = ProgressiveDistillation.create(
                diffusion, n_student,
                teacher_objective=None if r == 0 else "v")
            teacher_r = student
            student = jax.tree.map(jnp.copy, teacher_r)
            sched = optax.warmup_cosine_decay_schedule(
                0.0, 1e-4, max(args.pd_steps // 20, 1), args.pd_steps, 1e-6)
            tx = optax.adamw(sched)
            opt = tx.init(student)

            @jax.jit
            def jstep(student, teacher_p, opt, rng, x0, pd=pd, tx=tx):
                loss, grads = jax.value_and_grad(
                    lambda sp: pd.distill_loss(fn_of(sp), fn_of(teacher_p),
                                               rng, x0))(student)
                up, opt = tx.update(grads, opt, student)
                return optax.apply_updates(student, up), opt, loss

            key = jax.random.PRNGKey(20 + r)
            t0 = time.time()
            for i in range(args.pd_steps):
                key, k = jax.random.split(key)
                idx = drng.integers(0, len(imgs), C.BATCH)
                student, opt, loss = jstep(student, teacher_r, opt, k,
                                           jnp.asarray(imgs[idx]))
                if (i + 1) % 1000 == 0:
                    print(f"[pd] round {r+1} ({n_teacher}->{n_student}) "
                          f"step {i+1}/{args.pd_steps} "
                          f"loss={float(loss):.5f} "
                          f"({(time.time()-t0)/(i+1)*1e3:.0f} ms/step)",
                          flush=True)
            results[f"pd_round{r+1}_loss"] = float(loss)
            n_teacher = n_student
        st = TrainState.create(jax.device_get(student),
                               optax.adamw(1e-4))
        st = st.replace(ema_params=jax.device_get(student))
        save_checkpoint(CKPT, st, name="pd_student")
    _, pd_params = restore_params(os.path.join(CKPT, "pd_student"), teacher)
    pd_params = jax.tree.map(jnp.asarray, pd_params)

    import dataclasses as _dc

    v_process = _dc.replace(diffusion, objective="v")

    def run_pd(model, p, rng, bs, steps):
        return pd_sample(v_process, fn_of(p), rng, bs, steps=steps,
                         dtype=dtype).x.astype(jnp.float32)

    def run_ddim(model, p, rng, bs, steps):
        return diffusion.ddim_sample(fn_of(p), rng, bs, num_steps=steps,
                                     dtype=dtype).x.astype(jnp.float32)

    C.evaluate("restore64_pd", model, pd_params, run_pd,
               [("pd2", {"steps": 2}), ("pd4", {"steps": 4})],
               real_feats, data_grad, results)
    C.evaluate("restore64_teacher", model, teacher, run_ddim,
               [("ddim4", {"steps": 4}), ("ddim25", {"steps": 25})],
               real_feats, data_grad, results)

    out = os.path.join(GALLERY, "restore64_metrics.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
