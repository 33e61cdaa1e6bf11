"""Consistency-distillation capstone: few-step KID from a DDPM teacher.

Trains (or reuses) the 64px UNet DDPM teacher on the shared synthetic-EO
protocol (same data/extractor as tools/capstone_dit_flow.py), distills a
consistency student (diffusion/consistency.py, data-free: teacher DDIM
samples as the x0 pool), and scores teacher vs student on the few-step
frontier: teacher DDIM-1/2/4/25 vs student cm-1/2/4. Writes
gallery/cm64_*.png + gallery/cm64_metrics.json.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/capstone_cm.py \
           [--teacher_steps 6000] [--distill_steps 4000] [--skip_teacher]
           [--skip_distill] [--smoke]
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
CKPT = os.path.join(ROOT, "logs", "capstone_cm")
GALLERY = os.path.join(ROOT, "gallery")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--teacher_steps", type=int, default=6000)
    ap.add_argument("--distill_steps", type=int, default=4000)
    ap.add_argument("--n_pool", type=int, default=4096)
    ap.add_argument("--cd_points", type=int, default=18)
    ap.add_argument("--skip_teacher", action="store_true")
    ap.add_argument("--skip_distill", action="store_true")
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()

    import optax

    import tools.capstone_dit_flow as C
    from eo_diffusion_tpu.diffusion.consistency import ConsistencyDistillation
    from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from eo_diffusion_tpu.models.unet import UNet, UNetConfig
    from eo_diffusion_tpu.train.checkpoint import restore_params, save_checkpoint
    from eo_diffusion_tpu.train.trainer import TrainState
    from eo_diffusion_tpu.utils import metrics as M

    if args.smoke:
        C.SIZE, C.BATCH, C.N_EVAL = 8, 16, 32
        args.teacher_steps = min(args.teacher_steps, 30)
        args.distill_steps = min(args.distill_steps, 20)
        args.n_pool, args.cd_points = 64, 6
    C.CKPT = CKPT
    size = C.SIZE
    os.makedirs(CKPT, exist_ok=True)

    imgs = C.dataset_images(256 if args.smoke else 2048)
    extractor = M.tiny_feature_extractor()
    real_feats = np.asarray(extractor(jnp.asarray(imgs[:256])))
    data_grad = float(np.mean(np.abs(np.diff(imgs[:256], axis=1))))

    diffusion = GaussianDiffusion.create(timesteps=1000 if not args.smoke
                                         else 100, image_size=size,
                                         in_channels=3)
    if args.smoke:
        model = UNet(UNetConfig(image_size=size, in_channels=3,
                                model_channels=32, out_channels=3,
                                num_res_blocks=1, attention_resolutions=(),
                                channel_mult=(1, 2), num_heads=1,
                                dtype=jnp.float32))
    else:
        model = C.build_flow_unet()

    results = {"data_grad": data_grad}
    if not args.skip_teacher:
        results["teacher_train"] = C.train("cm_teacher", model, diffusion,
                                           imgs, args.teacher_steps)
    teacher = C.load_ema("cm_teacher", model)
    fn_of = lambda p: (lambda x, t, c, y: model.apply(p, x, t, cond=c, y=y))
    dtype = jnp.float32 if args.smoke else jnp.bfloat16

    cd = ConsistencyDistillation.create(diffusion, n_points=args.cd_points)

    student_ck = os.path.join(CKPT, "cm_student")
    if not args.skip_distill:
        # x0 pool: teacher DDIM-25 samples
        t0 = time.time()
        bs = C.BATCH

        # teacher threaded as a jit arg (remote-compile 413, CLAUDE.md)
        jgen = jax.jit(lambda tp, k: diffusion.ddim_sample(
            fn_of(tp), k, bs, num_steps=25, dtype=dtype).x)
        pool = np.concatenate([
            np.asarray(jgen(teacher, jax.random.PRNGKey(500 + i)), np.float32)
            for i in range(-(-args.n_pool // bs))])[:args.n_pool]
        print(f"{len(pool)} teacher DDIM-25 pool samples in "
              f"{time.time()-t0:.1f}s", flush=True)

        student = jax.tree.map(jnp.copy, teacher)
        target = jax.tree.map(jnp.copy, teacher)
        sched = optax.warmup_cosine_decay_schedule(
            0.0, 1e-4, max(args.distill_steps // 20, 1), args.distill_steps,
            1e-6)
        tx = optax.adamw(sched)
        opt = tx.init(student)

        @jax.jit
        def jstep(student, target, teacher_p, opt, rng, x0):
            loss, grads = jax.value_and_grad(
                lambda sp: cd.distill_loss(fn_of(sp), fn_of(target),
                                           fn_of(teacher_p), rng, x0))(student)
            up, opt = tx.update(grads, opt, student)
            student = optax.apply_updates(student, up)
            target = ConsistencyDistillation.update_target(target, student,
                                                           0.95)
            return student, target, opt, loss

        drng = np.random.default_rng(1)
        key = jax.random.PRNGKey(2)
        t0 = time.time()
        for i in range(args.distill_steps):
            key, k = jax.random.split(key)
            idx = drng.integers(0, len(pool), C.BATCH)
            student, target, opt, loss = jstep(student, target, teacher,
                                               opt, k,
                                               jnp.asarray(pool[idx]))
            if (i + 1) % 1000 == 0:
                print(f"distill {i+1}/{args.distill_steps} "
                      f"loss={float(loss):.5f} "
                      f"({(time.time()-t0)/(i+1)*1e3:.0f} ms/step)",
                      flush=True)
        st = TrainState.create(jax.device_get(student), tx)
        st = st.replace(ema_params=jax.device_get(target))
        save_checkpoint(CKPT, st, name="cm_student")
        results["distill_loss_last"] = float(loss)
    _, cm_params = restore_params(student_ck, teacher)
    cm_params = jax.tree.map(jnp.asarray, cm_params)

    def run_cm(model, p, rng, bs, steps):
        return cd.sample(fn_of(p), rng, bs, steps=steps,
                         dtype=dtype).x.astype(jnp.float32)

    def run_ddim(model, p, rng, bs, steps):
        return diffusion.ddim_sample(fn_of(p), rng, bs, num_steps=steps,
                                     dtype=dtype).x.astype(jnp.float32)

    C.evaluate("cm64", model, cm_params, run_cm,
               [("cm1", {"steps": 1}), ("cm2", {"steps": 2}),
                ("cm4", {"steps": 4})],
               real_feats, data_grad, results)
    C.evaluate("cm64_teacher", model, teacher, run_ddim,
               [("ddim1", {"steps": 1}), ("ddim2", {"steps": 2}),
                ("ddim4", {"steps": 4}), ("ddim25", {"steps": 25})],
               real_feats, data_grad, results)

    out = os.path.join(GALLERY, "cm64_metrics.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
