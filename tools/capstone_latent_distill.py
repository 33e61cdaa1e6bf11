"""Latent few-step distillation capstone (VERDICT r4 next-round item 1).

ReFlow-distills the trained latent256 production stack (the 24k DiT-B/4
rectified flow on the 64x64x4 latent grid from tools/capstone_latent256.py)
into a 1-2 step Euler student — couplings are generated ON THE LATENT GRID
(256-token calls; the f4 AE is never touched during distillation), which is
exactly where the distillation literature says couplings are cheapest
(cli/distill.py's latent-composability contract, reference north-star
BASELINE.json >=5x DDIM-50).

Pipeline (resumable per-stage via gallery/latent256_distill_metrics.json):

  1. couplings — teacher heun-16 ODE endpoints from fixed noise, saved to
     logs/capstone_latent256/couplings.npz (a dataset, not activations).
  2. refit    — student init = teacher EMA; flow-matching MSE on the PAIRED
     (eps, z1) batches (diffusion/distill.py ReFlow objective), couplings
     device-resident with index-only feeds (host-feed RSS leak, CLAUDE.md).
  3. eval     — student euler-1/2/4 + heun-8 vs the teacher rows
     (gallery/latent256_metrics.json eval24k): KID under the SAME tiled
     256px extractor, decoded img/s at batch 32, straightness + endpoint
     gap teacher-vs-student.
  4. export   — the 1-NFE student through cli.export_model (StableHLO
     artifact, deserialize-and-run) + a serving-engine generate smoke.

Teacher reference (r4, chip): heun16 KID 0.0645 @ 85.4 img/s; euler1 KID
5.77 @ 465 img/s. Done = student euler-1/2 at KID <= ~0.1 in the 400-500
img/s band at 256px.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/capstone_latent_distill.py \
           [--stage all|couplings|refit|eval|export] [--smoke] [--force]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import subprocess
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
import capstone_latent256 as cl  # shared Ctx: fixture, extractor, models

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GALLERY = os.path.join(ROOT, "gallery")

STAGES = ("couplings", "refit", "eval", "export")


class DCtx:
    """Distillation-run shapes on top of the shared capstone Ctx."""

    def __init__(self, smoke: bool):
        self.base = cl.Ctx(smoke)
        self.smoke = smoke
        if smoke:
            self.n_pairs, self.pair_steps = 64, 4
            self.refit_steps, self.refit_mb, self.lr = 20, 16, 1e-4
            self.teacher_name = "final"
        else:
            self.n_pairs, self.pair_steps = 16384, 16
            self.refit_steps, self.refit_mb, self.lr = 16000, 64, 1e-4
            self.teacher_name = "final24k"
        self.ckpt = cl.CKPT  # rebound after --smoke suffixing in main()
        # --tag isolates a rerun at a different budget (e.g. round2: 2x
        # pairs + 1.5x refit — the first round's student was refit-limited,
        # KID flat ~0.55 across 1-8 NFE); couplings are a deterministic
        # prefix-superset (generate_couplings folds the key per chunk), so
        # a bigger tagged run reuses the round-1 transport plus fresh pairs
        self.tag = ""

    @property
    def couplings_npz(self):
        sfx = f"_{self.tag}" if self.tag else ""
        return os.path.join(self.ckpt, f"couplings{sfx}.npz")

    @property
    def student_dir(self):
        sfx = f"_{self.tag}" if self.tag else ""
        return os.path.join(self.ckpt, f"reflow{sfx}")

    def teacher(self):
        from eo_diffusion_tpu.train.checkpoint import restore_params

        model = self.base.dit()
        b = self.base
        template = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, b.lat, b.lat, b.zc)),
            jnp.zeros((1,), jnp.int32))
        _, ema = restore_params(
            os.path.join(self.ckpt, self.teacher_name), template)
        return model, jax.tree.map(jnp.asarray, ema)

    def student(self):
        from eo_diffusion_tpu.train.checkpoint import restore_params

        model = self.base.dit()
        b = self.base
        template = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, b.lat, b.lat, b.zc)),
            jnp.zeros((1,), jnp.int32))
        _, ema = restore_params(os.path.join(self.student_dir, "final"),
                                template)
        return model, jax.tree.map(jnp.asarray, ema)


def stage_couplings(ctx, results):
    from eo_diffusion_tpu.diffusion.distill import generate_couplings

    model, teacher = ctx.teacher()
    flow = ctx.base.flow()
    apply5 = lambda p, x, t, c, y: model.apply(p, x, t, cond=c, y=y)
    t0 = time.time()
    eps, z1 = generate_couplings(
        flow, apply5, jax.random.PRNGKey(0), ctx.n_pairs,
        num_steps=ctx.pair_steps, method="heun", batch_size=64,
        dtype=jnp.bfloat16, params=teacher)
    dt = time.time() - t0
    np.savez(ctx.couplings_npz, eps=eps.astype(np.float32),
             z1=z1.astype(np.float32))
    results["couplings"] = {
        "n_pairs": ctx.n_pairs, "pair_steps": ctx.pair_steps,
        "wall_s": dt, "z1_std": float(z1.std()),
        "gb": (eps.nbytes + z1.nbytes) / 1e9}
    print(f"couplings: {ctx.n_pairs} heun-{ctx.pair_steps} pairs in "
          f"{dt:.0f}s (z1 std {z1.std():.3f})", flush=True)


def stage_refit(ctx, results):
    import optax

    from eo_diffusion_tpu.train.checkpoint import save_checkpoint
    from eo_diffusion_tpu.train.trainer import TrainState, make_train_step

    model, teacher = ctx.teacher()
    flow = ctx.base.flow()
    with np.load(ctx.couplings_npz) as z:
        eps_d, z1_d = jnp.asarray(z["eps"]), jnp.asarray(z["z1"])

    steps = ctx.refit_steps
    sched = optax.warmup_cosine_decay_schedule(
        0.0, ctx.lr, max(steps // 20, 1), steps, ctx.lr * 0.01)
    tx = optax.adamw(sched)
    state = TrainState.create(jax.tree.map(jnp.copy, teacher), tx)
    apply_fn = (lambda p, xx, tt, cond=None, y=None, train=False,
                dropout_rng=None: model.apply(p, xx, tt, cond=cond, y=y))
    step_fn = make_train_step(flow, apply_fn, tx, ema_decay=0.999,
                              ema_every=1, ema_warmup=False)

    # device-resident couplings, index-only feeds (host-feed leak, CLAUDE.md)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def gstep(state, ea, za, idx, rng):
        return step_fn(state, {"image": za[idx], "noise": ea[idx]}, rng)

    rng = jax.random.PRNGKey(3)
    rnp = np.random.default_rng(1)
    t0 = time.time()
    for i in range(steps):
        rng, srng = jax.random.split(rng)
        idx = jnp.asarray(rnp.integers(0, z1_d.shape[0], ctx.refit_mb))
        state, m = gstep(state, eps_d, z1_d, idx, srng)
        if i == 0:
            t0 = time.time()
        if (i + 1) % max(steps // 16, 1) == 0:
            print(f"refit {i+1}/{steps} loss={float(m['loss']):.5f} "
                  f"({(time.time()-t0)/max(i,1)*1e3:.0f} ms/step)",
                  flush=True)
    save_checkpoint(ctx.student_dir, jax.device_get(state), name="final")
    results["refit"] = {"steps": steps, "mb": ctx.refit_mb, "lr": ctx.lr,
                        "loss_final": float(m["loss"]),
                        "ms_per_step": (time.time() - t0) / max(steps - 1, 1)
                        * 1e3}
    print(f"refit done -> {ctx.student_dir}", flush=True)


def stage_eval(ctx, results):
    from eo_diffusion_tpu.diffusion.distill import endpoint_gap, straightness
    from eo_diffusion_tpu.train.ae_trainer import load_ae
    from eo_diffusion_tpu.utils.images import save_image_grid

    b = ctx.base
    imgs, _ = b.data
    ae_model, ae_params, scale = load_ae(os.path.join(ctx.ckpt, "ae"))
    ae_params = jax.tree.map(jnp.asarray, ae_params)
    model, teacher = ctx.teacher()
    _, student = ctx.student()
    flow = b.flow()
    apply5 = lambda p, x, t, c, y: model.apply(p, x, t, cond=c, y=y)

    half = b.n_data // 2
    real = b.feats(imgs[:half])

    # field functionals on held-out noise: how straight did the flow get?
    with np.load(ctx.couplings_npz) as z:
        held_eps = jnp.asarray(z["eps"][:64])
    out = {}
    for tag, p in (("teacher", teacher), ("student", student)):
        jt = jax.jit(lambda pp, xT: flow.sample(
            (lambda x, t, c, y: model.apply(pp, x, t, cond=c, y=y)),
            jax.random.PRNGKey(0), held_eps.shape[0],
            num_steps=max(ctx.pair_steps, 4), method="heun", x_T=xT,
            dtype=jnp.bfloat16).x)
        z1s = jt(p, held_eps)
        out[f"{tag}_straightness"] = float(
            straightness(flow, apply5, held_eps, z1s, params=p))
        out[f"{tag}_euler1_gap"] = float(endpoint_gap(
            flow, apply5, held_eps, few_steps=1,
            ref_steps=max(ctx.pair_steps * 2, 8), dtype=jnp.bfloat16,
            params=p))
        print(f"[{tag}] straightness={out[f'{tag}_straightness']:.4f} "
              f"euler1_gap={out[f'{tag}_euler1_gap']:.4f}", flush=True)

    def run(p, ap, r, num_steps, method):
        z = flow.sample(
            lambda x, t, c, y: model.apply(p, x, t, cond=c, y=y), r, b.bs,
            num_steps=num_steps, method=method,
            dtype=jnp.bfloat16).x
        return ae_model.apply(ap, z / scale,
                              method="decode").astype(jnp.float32)

    grid = ([("euler", 1), ("euler", 2)] if ctx.smoke else
            [("euler", 1), ("euler", 2), ("euler", 4), ("heun", 8)])
    for method, n in grid:
        j = jax.jit(functools.partial(run, num_steps=n, method=method))
        xs, t_draw = [], 0.0
        for i in range(max(b.n_eval // b.bs, 1)):
            t1 = time.time()
            x = j(student, ae_params, jax.random.PRNGKey(700 + i))
            _ = float(jnp.sum(x))  # host fetch: completion barrier (CLAUDE.md)
            if i > 0:
                t_draw += time.time() - t1
            xs.append(np.asarray(x))
        x = np.concatenate(xs)
        k, ks = b.kid_vs(x, real)
        g = float(np.mean(np.abs(np.diff(x, axis=1))))
        nb = max(b.n_eval // b.bs - 1, 1)
        tag = f"student_{method}{n}"
        out[tag] = {"kid": k, "kid_std": ks, "grad": g,
                    "img_s": nb * b.bs / t_draw if t_draw else None}
        print(f"eval {tag}: kid={k:.4g} grad={g:.4f} "
              f"{out[tag]['img_s'] or 0:.1f} img/s", flush=True)
        if n <= 2:
            sfx = (f"_{ctx.tag}" if ctx.tag else "") + \
                ("_smoke" if ctx.smoke else "")
            save_image_grid(np.clip((x[:16] + 1) / 2, 0, 1),
                            os.path.join(
                                GALLERY,
                                f"latent256_reflow_{method}{n}{sfx}.png"),
                            nrow=4)
    # teacher comparison rows ride along for the table
    try:
        with open(cl.METRICS) as f:
            ev = json.load(f).get("eval24k" if not ctx.smoke else "eval", {})
        out["teacher_ref"] = {k: ev[k] for k in ("euler1", "heun8", "heun16")
                              if k in ev}
    except OSError:
        pass
    results["eval"] = out


def stage_export(ctx, results):
    """1-NFE student -> StableHLO artifact + serving-engine smoke."""
    out_dir = os.path.join(
        ROOT, "artifacts",
        "latent256_reflow" + (f"_{ctx.tag}" if ctx.tag else "")
        + ("_smoke" if ctx.smoke else ""))
    preset = "tiny-latent-dit" if ctx.smoke else "latent256"
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    cmd = [sys.executable, "-m", "eo_diffusion_tpu.cli.export_model",
           "--preset", preset,
           "--ckpt", os.path.join(ctx.student_dir, "final"),
           "--out", out_dir, "--batch_size", "8",
           "--sampler", "flow", "--flow_method", "euler",
           "--sampler_steps", "1", "--run",
           "--ae_ckpt", os.path.join(ctx.ckpt, "ae")]
    if ctx.smoke:
        # the smoke Ctx trains at 32px (tiny-latent-dit defaults to 16)
        cmd += ["--no_bf16", "--image_size", "32"]
    t0 = time.time()
    r = subprocess.run(cmd, env=env, capture_output=True, text=True)
    if r.returncode != 0:
        print(r.stdout[-3000:], r.stderr[-3000:])
        raise RuntimeError("export failed")
    results["export"] = {"out": out_dir, "wall_s": time.time() - t0,
                         "tail": r.stdout.strip().splitlines()[-3:]}
    print(f"export OK -> {out_dir}", flush=True)

    # serving smoke: the student under the batching engine at 1 NFE
    from eo_diffusion_tpu.cli import serve as serve_cli

    sargs = serve_cli.parse_args([
        "--preset", preset, "--ckpt", os.path.join(ctx.student_dir, "final"),
        "--sampler", "flow", "--flow_method", "euler", "--sampler_steps",
        "1", "--batch_size", "4", "--seed", "0",
        "--ae_ckpt", os.path.join(ctx.ckpt, "ae")]
        + (["--no_bf16", "--image_size", "32"] if ctx.smoke else []))
    _, batcher, _ = serve_cli.build_engine(sargs)
    try:
        arr = np.asarray(batcher.submit(2, seed=1))
        assert np.isfinite(arr).all() and arr.shape[0] == 2, arr.shape
    finally:
        batcher.shutdown()
    results["serve_smoke"] = {"shape": list(arr.shape)}
    print(f"serve smoke OK {arr.shape}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all", choices=STAGES + ("all",))
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--refit_steps", type=int, default=0)
    ap.add_argument("--n_pairs", type=int, default=0)
    ap.add_argument("--tag", default="",
                    help="isolated rerun (couplings/student/metrics "
                         "suffixed), e.g. --tag round2 --n_pairs 32768 "
                         "--refit_steps 24000")
    args = ap.parse_args()

    metrics_path = os.path.join(
        GALLERY, "latent256_distill_metrics"
        + (f"_{args.tag}" if args.tag else "")
        + ("_smoke" if args.smoke else "") + ".json")
    if args.smoke:
        cl.METRICS = cl.METRICS.replace(".json", "_smoke.json")
        cl.EXT_NPZ = cl.EXT_NPZ.replace(".npz", "_smoke.npz")
        cl.CKPT = cl.CKPT + "_smoke"

    ctx = DCtx(args.smoke)
    ctx.ckpt = cl.CKPT
    ctx.tag = args.tag
    if args.refit_steps:
        ctx.refit_steps = args.refit_steps
    if args.n_pairs:
        ctx.n_pairs = args.n_pairs

    results = {}
    if os.path.exists(metrics_path):
        with open(metrics_path) as f:
            results = json.load(f)
    fns = {"couplings": stage_couplings, "refit": stage_refit,
           "eval": stage_eval, "export": stage_export}
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
