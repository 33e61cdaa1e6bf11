"""Conditional latent256 few-step distillation (ROADMAP r6 item 3, started
late r5): ReFlow the trained cloud-removal flow (tools/
capstone_latent256_cond.py) into a 1-NFE student.

Couplings are CONDITIONAL triples on the latent grid: eps ~ N(0,I),
cond = an AE-encoded cloudy view from the train fixture, z1 = the teacher
ODE endpoint given that cond (diffusion/distill.generate_couplings
threads cond through the chunks; the refit batches carry it via
coupling semantics {"image": z1, "noise": eps, "cond": cond} —
make_train_step(use_cond=True) pins the pairing exactly like the
unconditional ReFlow).

Eval on HELD-OUT pairs (seed 7, the capstone_latent256_cond protocol):
student euler-1 paired SSIM/PSNR + decoded img/s vs the teacher's
euler-2 production row (SSIM 0.681 @ 254.8 img/s).

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/capstone_cond_distill.py \
           [--stage all|couplings|refit|eval] [--smoke] [--force]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import capstone_latent256 as cl
import capstone_latent256_cond as cc

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GALLERY = os.path.join(ROOT, "gallery")
STAGES = ("couplings", "refit", "eval")


class Ctx:
    def __init__(self, smoke: bool):
        self.cc = cc.CCtx(smoke)
        self.smoke = smoke
        if smoke:
            self.n_pairs, self.pair_steps = 32, 2
            self.refit_steps, self.refit_mb, self.lr = 16, 8, 1e-4
        else:
            self.n_pairs, self.pair_steps = 8192, 8
            self.refit_steps, self.refit_mb, self.lr = 12000, 32, 1e-4
        self.ckpt = cl.CKPT

    @property
    def couplings_npz(self):
        return os.path.join(self.ckpt, "cond_couplings.npz")

    @property
    def student_dir(self):
        return os.path.join(self.ckpt, "cond_reflow")

    def teacher(self):
        from eo_diffusion_tpu.train.checkpoint import restore_params

        b = self.cc.base
        model = self.cc.cond_dit()
        template = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, b.lat, b.lat, 2 * b.zc)),
            jnp.zeros((1,), jnp.int32))
        _, ema = restore_params(os.path.join(self.cc.cond_dir, "final"),
                                template)
        return model, jax.tree.map(jnp.asarray, ema)


def stage_couplings(ctx, results):
    from eo_diffusion_tpu.diffusion.distill import generate_couplings

    b = ctx.cc.base
    with np.load(os.path.join(ctx.ckpt, "cond_latents.npz")) as z:
        z_cloudy = z["z_cloudy"]
    # conditioning marginal = the training cloudy latents, tiled to n_pairs
    idx = np.arange(ctx.n_pairs) % len(z_cloudy)
    cond = z_cloudy[idx]
    model, teacher = ctx.teacher()
    flow = b.flow()
    apply5 = lambda p, x, t, c, y: model.apply(p, x, t, cond=c, y=y)
    t0 = time.time()
    eps, z1 = generate_couplings(
        flow, apply5, jax.random.PRNGKey(0), ctx.n_pairs,
        num_steps=ctx.pair_steps, method="heun", batch_size=32,
        cond=cond, dtype=jnp.bfloat16, params=teacher)
    np.savez(ctx.couplings_npz, eps=eps.astype(np.float32),
             z1=z1.astype(np.float32), cond=cond.astype(np.float32))
    results["couplings"] = {"n_pairs": ctx.n_pairs,
                            "pair_steps": ctx.pair_steps,
                            "wall_s": time.time() - t0,
                            "z1_std": float(z1.std())}
    print(f"cond couplings: {ctx.n_pairs} in {time.time()-t0:.0f}s",
          flush=True)


def stage_refit(ctx, results):
    import optax

    from eo_diffusion_tpu.train.checkpoint import save_checkpoint
    from eo_diffusion_tpu.train.trainer import TrainState, make_train_step

    b = ctx.cc.base
    model, teacher = ctx.teacher()
    flow = b.flow()
    with np.load(ctx.couplings_npz) as z:
        eps_d = jnp.asarray(z["eps"])
        z1_d = jnp.asarray(z["z1"])
        cond_d = jnp.asarray(z["cond"])
    steps = ctx.refit_steps
    sched = optax.warmup_cosine_decay_schedule(
        0.0, ctx.lr, max(steps // 20, 1), steps, ctx.lr * 0.01)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(sched))
    state = TrainState.create(jax.tree.map(jnp.copy, teacher), tx)
    apply_fn = (lambda p, xx, tt, cond=None, y=None, train=False,
                dropout_rng=None: model.apply(p, xx, tt, cond=cond, y=y))
    step_fn = make_train_step(flow, apply_fn, tx, ema_decay=0.999,
                              ema_every=1, ema_warmup=False, use_cond=True)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def gstep(state, ea, za, ca, idx, rng):
        return step_fn(state, {"image": za[idx], "noise": ea[idx],
                               "cond": ca[idx]}, rng)

    rng = jax.random.PRNGKey(3)
    rnp = np.random.default_rng(1)
    t0 = time.time()
    for i in range(steps):
        rng, srng = jax.random.split(rng)
        idx = jnp.asarray(rnp.integers(0, z1_d.shape[0], ctx.refit_mb))
        state, m = gstep(state, eps_d, z1_d, cond_d, idx, srng)
        if i == 0:
            t0 = time.time()
        if (i + 1) % max(steps // 16, 1) == 0:
            print(f"refit {i+1}/{steps} loss={float(m['loss']):.5f} "
                  f"({(time.time()-t0)/max(i,1)*1e3:.0f} ms/step)",
                  flush=True)
    save_checkpoint(ctx.student_dir, jax.device_get(state), name="final")
    results["refit"] = {"steps": steps, "mb": ctx.refit_mb,
                        "loss_final": float(m["loss"])}
    print(f"refit done -> {ctx.student_dir}", flush=True)


def stage_eval(ctx, results):
    from eo_diffusion_tpu.train.checkpoint import restore_params
    from eo_diffusion_tpu.utils import metrics as M
    from eo_diffusion_tpu.utils.images import save_image_grid

    b = ctx.cc.base
    c = ctx.cc
    clean, cloudy = c.paired_fixture(seed=7, n=c.n_eval)
    encode, (ae_model, ae_params, scale) = cc._encoder(c)
    z_cloudy = encode(cloudy)
    model, teacher = ctx.teacher()
    template = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, b.lat, b.lat, 2 * b.zc)),
        jnp.zeros((1,), jnp.int32))
    _, student = restore_params(os.path.join(ctx.student_dir, "final"),
                                template)
    student = jax.tree.map(jnp.asarray, student)
    flow = b.flow()

    imgs, _ = b.data
    real = b.feats(imgs[:b.n_data // 2])
    dr = 2.0
    out = {}

    def run(p, ap, zc, r, num_steps, method):
        z = flow.sample(
            lambda x, t, cnd, y: model.apply(p, x, t, cond=cnd, y=y), r,
            zc.shape[0], num_steps=num_steps, method=method, cond=zc,
            dtype=jnp.bfloat16).x
        return ae_model.apply(ap, z / scale,
                              method="decode").astype(jnp.float32)

    rows = ([("student_euler1", student, 1, "euler")] if ctx.smoke else
            [("student_euler1", student, 1, "euler"),
             ("student_euler2", student, 2, "euler"),
             ("teacher_euler2", teacher, 2, "euler")])
    for tag, p, n, method in rows:
        j = jax.jit(functools.partial(run, num_steps=n, method=method))
        xs, t_draw = [], 0.0
        for i in range(max(c.n_eval // c.bs, 1)):
            zc = jnp.asarray(z_cloudy[i * c.bs:(i + 1) * c.bs])
            t1 = time.time()
            x = j(p, ae_params, zc, jax.random.PRNGKey(1700 + i))
            _ = float(jnp.sum(x))
            if i > 0:
                t_draw += time.time() - t1
            xs.append(np.asarray(x))
        x = np.concatenate(xs)
        gt = clean[:len(x)]
        k, ks = b.kid_vs(x, real)
        nb = max(c.n_eval // c.bs - 1, 1)
        out[tag] = {
            "ssim": float(M.ssim(jnp.asarray(x), jnp.asarray(gt),
                                 data_range=dr)),
            "psnr": float(M.psnr(jnp.asarray(x), jnp.asarray(gt),
                                 data_range=dr)),
            "kid": k, "kid_std": ks,
            "img_s": nb * c.bs / t_draw if t_draw else None}
        print(f"eval {tag}: ssim={out[tag]['ssim']:.3f} "
              f"psnr={out[tag]['psnr']:.2f} kid={k:.4g} "
              f"{out[tag]['img_s'] or 0:.1f} img/s", flush=True)
        if tag == "student_euler1":
            sfx = "_smoke" if ctx.smoke else ""
            panel = np.clip((np.concatenate(
                [cloudy[:6], x[:6], gt[:6]]) + 1) / 2, 0, 1)
            save_image_grid(panel, os.path.join(
                GALLERY, f"latent256_cond_reflow{sfx}.png"), nrow=6)
    results["eval"] = out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all", choices=STAGES + ("all",))
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()

    metrics_path = os.path.join(
        GALLERY, "latent256_cond_distill_metrics"
        + ("_smoke" if args.smoke else "") + ".json")
    if args.smoke:
        cl.METRICS = cl.METRICS.replace(".json", "_smoke.json")
        cl.EXT_NPZ = cl.EXT_NPZ.replace(".npz", "_smoke.npz")
        cl.CKPT = cl.CKPT + "_smoke"

    ctx = Ctx(args.smoke)
    ctx.ckpt = cl.CKPT
    ctx.cc.ckpt = cl.CKPT

    results = {}
    if os.path.exists(metrics_path):
        with open(metrics_path) as f:
            results = json.load(f)
    fns = {"couplings": stage_couplings, "refit": stage_refit,
           "eval": stage_eval}
    for s in (STAGES if args.stage == "all" else (args.stage,)):
        if s in results and not args.force:
            print(f"stage {s}: already recorded, skipping")
            continue
        print(f"=== stage {s} ===", flush=True)
        fns[s](ctx, results)
        os.makedirs(GALLERY, exist_ok=True)
        with open(metrics_path, "w") as f:
            json.dump(results, f, indent=2)
    print(f"wrote {metrics_path}")


if __name__ == "__main__":
    main()
