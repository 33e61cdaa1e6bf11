"""ReFlow distillation capstone (round 3): 1-4-step sampling on the chip.

Takes a trained flow teacher — `--model unet64` (the flow64 UNet from
tools/capstone_dit_flow.py) or `--model dit256` (the 256px DiT-B/8 from
tools/capstone_dit256.py, the modern-stack configuration) — generates
teacher ODE couplings, re-fits via the distill machinery
(diffusion/distill.py), and scores teacher vs student at Euler-1/2/4 and
Heun-8 on KID + few-step endpoint gap vs the training distribution.
Writes gallery/reflow{64,256}_*.png + gallery/reflow{64,256}_metrics.json.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/capstone_reflow.py \
           [--model unet64|dit256] [--n_pairs 8192] [--steps 3000] \
           [--skip_distill]
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
GALLERY = os.path.join(ROOT, "gallery")

CONFIGS = {
    # tag -> (teacher ckpt, student dir, image size, sampling batch, n_eval)
    "unet64": dict(
        teacher=os.path.join(ROOT, "logs", "capstone_dit_flow", "flow64"),
        student=os.path.join(ROOT, "logs", "capstone_reflow"),
        size=64, batch=64, n_eval=256, prefix="reflow64"),
    "dit256": dict(
        teacher=os.path.join(ROOT, "logs", "capstone_dit256", "final"),
        student=os.path.join(ROOT, "logs", "capstone_reflow_dit256"),
        size=256, batch=32, n_eval=128, prefix="reflow256", refit_mb=16,
        # 256px refit: host-fed batches leak ~25 MB/step through the axon
        # tunnel (the bridge-capstone OOM, PERF.md); keep the couplings
        # DEVICE-resident (f32, 4096 pairs = 6.4 GB HBM) and ship indices
        max_pairs=4096, device_couplings=True),
}
SIZE, BATCH, N_EVAL = 64, 64, 256  # rebound from CONFIGS in main()


def build_model(kind):
    if kind == "dit256":
        from eo_diffusion_tpu.models.dit import DiT, dit_b

        return DiT(dit_b(SIZE, dtype=jnp.bfloat16))
    from eo_diffusion_tpu.models.unet import UNet, UNetConfig

    cfg = UNetConfig(image_size=SIZE, in_channels=3, model_channels=64,
                     out_channels=3, num_res_blocks=1,
                     attention_resolutions=(4, 8), channel_mult=(1, 2, 3, 4),
                     num_heads=4, dtype=jnp.bfloat16)
    return UNet(cfg)


def load_params(path, kind):
    from eo_diffusion_tpu.train.checkpoint import restore_params

    model = build_model(kind)
    x0 = jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    template = jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                                   jnp.zeros((1,), jnp.int32))
    _, ema = restore_params(path, template)
    return model, jax.tree.map(jnp.asarray, ema)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", choices=sorted(CONFIGS), default="unet64")
    ap.add_argument("--n_pairs", type=int, default=8192)
    ap.add_argument("--pair_steps", type=int, default=32)
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--skip_distill", action="store_true")
    args = ap.parse_args()

    global SIZE, BATCH, N_EVAL
    cfgd = CONFIGS[args.model]
    SIZE, BATCH, N_EVAL = cfgd["size"], cfgd["batch"], cfgd["n_eval"]
    TEACHER_CKPT, STUDENT_DIR, PREFIX = (cfgd["teacher"], cfgd["student"],
                                         cfgd["prefix"])

    import optax

    from eo_diffusion_tpu.data.datasets import SyntheticEO
    from eo_diffusion_tpu.diffusion.distill import (
        coupling_batches, endpoint_gap, generate_couplings, straightness)
    from eo_diffusion_tpu.diffusion.flow import FlowMatching
    from eo_diffusion_tpu.train.checkpoint import restore_params, save_checkpoint
    from eo_diffusion_tpu.train.trainer import TrainState, make_train_step
    from eo_diffusion_tpu.utils import metrics as M
    from eo_diffusion_tpu.utils.images import save_image_grid

    os.makedirs(GALLERY, exist_ok=True)
    fm = FlowMatching.create(image_size=SIZE, in_channels=3)
    model, teacher = load_params(TEACHER_CKPT, args.model)
    fn_of = lambda p: (lambda x, t, c, y: model.apply(p, x, t, cond=c, y=y))
    # 5-arg form for the threaded-params jit paths (a closed-over tree is
    # the remote-compile HTTP-413 failure mode, CLAUDE.md)
    apply5 = lambda p, x, t, c, y: model.apply(p, x, t, cond=c, y=y)

    # real-side features for KID (same protocol as capstone_dit_flow)
    ds = SyntheticEO(size=SIZE, length=N_EVAL, data_range=(-1.0, 1.0), seed=0)
    real = np.stack([ds[i]["image"] for i in range(N_EVAL)])
    extractor = M.tiny_feature_extractor()
    real_feats = np.asarray(extractor(jnp.asarray(real)))

    results = {}

    if not args.skip_distill:
        t0 = time.time()
        args.n_pairs = min(args.n_pairs, cfgd.get("max_pairs", args.n_pairs))
        eps, x1 = generate_couplings(fm, apply5, jax.random.PRNGKey(0),
                                     args.n_pairs, num_steps=args.pair_steps,
                                     method="heun", batch_size=BATCH,
                                     dtype=jnp.bfloat16, params=teacher)
        results["coupling_s"] = time.time() - t0
        print(f"{args.n_pairs} couplings in {results['coupling_s']:.1f}s")

        sched = optax.warmup_cosine_decay_schedule(
            0.0, args.lr, max(args.steps // 20, 1), args.steps, args.lr * 0.01)
        tx = optax.adamw(sched)
        # copy: step() donates the state; teacher is scored again below
        state = TrainState.create(jax.tree.map(jnp.copy, teacher), tx)
        apply_fn = (lambda p, xx, tt, cond=None, y=None, train=False,
                    dropout_rng=None: model.apply(p, xx, tt, cond=cond, y=y))
        step_fn = make_train_step(fm, apply_fn, tx, ema_decay=0.999,
                                  ema_every=1, ema_warmup=False)
        refit_mb = cfgd.get("refit_mb", BATCH)
        rng = jax.random.PRNGKey(2)
        t0 = time.time()
        if cfgd.get("device_couplings"):
            # device-resident couplings: only a [mb] index array crosses the
            # tunnel per step (the host-feed leak killed the bridge capstone)
            eps_d, x1_d = jnp.asarray(eps), jnp.asarray(x1)
            gstep = jax.jit(
                lambda state, ea, xa, idx, rng: step_fn(
                    state, {"image": xa[idx], "noise": ea[idx]}, rng),
                donate_argnums=(0,))
            rnp = np.random.default_rng(1)
            for i in range(args.steps):
                rng, srng = jax.random.split(rng)
                idx = jnp.asarray(rnp.integers(0, len(x1), refit_mb))
                state, m = gstep(state, eps_d, x1_d, idx, srng)
                if (i + 1) % 500 == 0:
                    print(f"step {i+1}/{args.steps} "
                          f"loss={float(m['loss']):.5f} "
                          f"({(time.time()-t0)/(i+1)*1e3:.0f} ms/step)",
                          flush=True)
        else:
            step = jax.jit(step_fn, donate_argnums=(0,))
            it = coupling_batches(eps, x1, refit_mb, seed=1)
            for i in range(args.steps):
                rng, srng = jax.random.split(rng)
                state, m = step(state, jax.tree.map(jnp.asarray, next(it)),
                                srng)
                if (i + 1) % 500 == 0:
                    print(f"step {i+1}/{args.steps} "
                          f"loss={float(m['loss']):.5f} "
                          f"({(time.time()-t0)/(i+1)*1e3:.0f} ms/step)",
                          flush=True)
        results["refit_ms_per_step"] = (time.time() - t0) / args.steps * 1e3
        save_checkpoint(STUDENT_DIR, jax.device_get(state), name="student")

    _, student = load_params(os.path.join(STUDENT_DIR, "student"), args.model)

    # functionals on held-out noise (teacher-transport reference)
    held = jax.random.normal(jax.random.PRNGKey(99), (64, SIZE, SIZE, 3))
    jtransport = jax.jit(lambda p, xT: fm.sample(
        (lambda x, t, c, y: model.apply(p, x, t, cond=c, y=y)),
        jax.random.PRNGKey(0), 64, num_steps=32, method="heun", x_T=xT,
        dtype=jnp.bfloat16).x)
    held_x1 = jtransport(teacher, held)
    for tag, p in (("teacher", teacher), ("student", student)):
        x1s = held_x1 if tag == "teacher" else jtransport(p, held)
        r = {"straightness": float(straightness(fm, apply5, held, x1s,
                                                params=p))}
        for k in (1, 2, 4):
            r[f"euler{k}_gap"] = float(endpoint_gap(fm, apply5, held,
                                                    few_steps=k,
                                                    dtype=jnp.bfloat16,
                                                    params=p))
        print(f"[{tag}] " + "  ".join(f"{k}={v:.4f}" for k, v in r.items()))
        results[tag] = r

    # KID + wall-clock at few-step configs, both models
    for tag, p in (("teacher", teacher), ("student", student)):
        for label, steps, method in (("euler1", 1, "euler"),
                                     ("euler2", 2, "euler"),
                                     ("euler4", 4, "euler"),
                                     ("heun8", 8, "heun")):
            j = jax.jit(lambda pp, r, steps=steps, method=method: fm.sample(
                fn_of(pp), r, BATCH, num_steps=steps, method=method,
                dtype=jnp.bfloat16).x.astype(jnp.float32))
            feats, ims, t_steady = [], [], None
            for i in range(N_EVAL // BATCH):
                t0 = time.time()
                x = np.asarray(j(p, jax.random.PRNGKey(200 + i)), np.float32)
                _ = float(x.sum())  # host fetch: real completion barrier
                if i == 1:
                    t_steady = time.time() - t0
                ims.append(x)
                feats.append(np.asarray(extractor(
                    jnp.asarray(np.clip(x, -1, 1)))))
            k, _ = M.kid(real_feats, np.concatenate(feats))
            g = float(np.mean(np.abs(np.diff(np.concatenate(ims), axis=1))))
            key = f"{tag}_{label}"
            results[key] = {"kid": float(k), "grad": g,
                            f"s_per_batch{BATCH}": t_steady}
            print(f"[{key}] KID={k:.4f} grad={g:.4f} {t_steady:.2f}s/64",
                  flush=True)
            if tag == "student" or label == "heun8":
                grid = np.clip((np.concatenate(ims)[:16] + 1) / 2, 0, 1)
                save_image_grid(grid, os.path.join(
                    GALLERY, f"{PREFIX}_{key}.png"), nrow=4)

    out = os.path.join(GALLERY, f"{PREFIX}_metrics.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
