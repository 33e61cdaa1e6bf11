"""Few-step distillation CLI: ReFlow (flow teachers) or consistency
distillation (DDPM teachers).

``python -m eo_diffusion_tpu.cli.distill --preset flow64 \\
      --ckpt logs/flow_run/best --steps 2000 --n_pairs 4096``
``python -m eo_diffusion_tpu.cli.distill --preset synthetic64 \\
      --method consistency --ckpt logs/run/best --steps 4000``

Beyond-reference entry points (the reference's fastest path is DDIM-250,
inference.py:27):

* **reflow** (flow-process presets): simulate deterministic (eps, x1)
  couplings with the teacher ODE, re-fit the same model on the paired
  endpoints (diffusion/distill.py). Serve with ``cli/inference.py
  --sampler flow --sampler_steps 1..4``.
* **consistency** (ddpm-process presets, diffusion/consistency.py):
  data-free consistency distillation — the x0 pool is teacher DDIM
  samples, the student learns f(x_t, t) -> x0 against its slow-EMA target
  along teacher ODE steps. Serve with ``cli/inference.py --sampler cm
  --sampler_steps 1..4``.

Both methods compose with latent presets: everything runs on the inner
latent grid (couplings / the x0 pool are latents), the first stage is never
loaded here, and the student decodes through ``--ae_ckpt`` at inference —
latent consistency students pair with ``--sigma_data 1.0`` (scaled latents
are ~unit std).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="ReFlow few-step distillation")
    p.add_argument("--preset", type=str, default="flow64",
                   help="flow-process preset the teacher was trained with")
    p.add_argument("--ckpt", type=str, required=True,
                   help="teacher TrainState checkpoint directory")
    p.add_argument("--method", type=str, default="reflow",
                   choices=["reflow", "consistency", "progressive", "guided"],
                   help="reflow = flow-teacher straightening; consistency = "
                        "DDPM-teacher consistency distillation; progressive "
                        "= Salimans-Ho halving rounds (DDPM teachers); "
                        "guided = fold the CFG-combined teacher into a "
                        "single-call student (arXiv:2210.03142; class-"
                        "conditional flow or DDPM teachers)")
    p.add_argument("--guidance_scale", type=float, default=3.0,
                   help="guided: the CFG scale w baked into the student")
    p.add_argument("--pool_n", type=int, default=4096,
                   help="guided+ddpm: teacher-sample x0 pool size (the "
                        "regression stays data-free like consistency)")
    p.add_argument("--pool_steps", type=int, default=50,
                   help="guided+ddpm: teacher DDIM steps for the pool")
    p.add_argument("--pd_base_steps", type=int, default=16,
                   help="progressive: round-1 teacher grid size (halves "
                        "each round; final student = base/2^rounds steps)")
    p.add_argument("--pd_rounds", type=int, default=2,
                   help="progressive: halving rounds")
    p.add_argument("--cd_points", type=int, default=18,
                   help="consistency: grid points over the teacher chain")
    p.add_argument("--huber_c", type=float, default=0.0,
                   help="consistency: pseudo-Huber c (0 = squared L2)")
    p.add_argument("--sigma_data", type=float, default=0.5,
                   help="consistency: data std for the boundary "
                        "coefficients (pixel data in [-1,1] ~ 0.5; latent "
                        "presets scale latents to ~unit std, use 1.0)")
    p.add_argument("--target_decay", type=float, default=0.95,
                   help="consistency: slow-EMA target network decay")
    p.add_argument("--dir", type=str, default="results/distill",
                   help="output directory (metrics + student checkpoint)")
    p.add_argument("--n_pairs", type=int, default=4096,
                   help="teacher ODE couplings to generate")
    p.add_argument("--pair_steps", type=int, default=32,
                   help="teacher sampler steps per coupling")
    p.add_argument("--pair_method", type=str, default="heun",
                   choices=["euler", "heun"])
    p.add_argument("--steps", type=int, default=2000,
                   help="student re-fit steps")
    p.add_argument("--batch_size", type=int, default=None,
                   help="default: preset batch size")
    p.add_argument("--lr", type=float, default=1e-4,
                   help="re-fit peak LR (fine-tuning: ~10x below training)")
    p.add_argument("--ema_decay", type=float, default=0.999)
    p.add_argument("--few_steps", type=int, nargs="+", default=[1, 2, 4],
                   help="Euler step counts to score before/after")
    p.add_argument("--eval_n", type=int, default=64,
                   help="held-out noise draws for the eval functionals")
    p.add_argument("--image_size", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no_bf16", action="store_true")
    p.add_argument("--use_raw_params", action="store_true",
                   help="distill from the teacher's raw params instead of EMA")
    p.add_argument("--cpu", action="store_true")
    return p.parse_args(argv)


def main(args):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from eo_diffusion_tpu.cli.presets import build_denoiser, build_process, get_preset
    from eo_diffusion_tpu.diffusion.distill import (
        coupling_batches,
        endpoint_gap,
        generate_couplings,
        straightness,
    )
    from eo_diffusion_tpu.train.checkpoint import restore_params, save_checkpoint
    from eo_diffusion_tpu.train.trainer import TrainState, make_train_step

    preset = get_preset(args.preset)
    if args.method == "guided":
        assert preset.num_classes > 0, (
            "guidance distillation folds CLASSIFIER-FREE guidance — the "
            f"teacher preset must be class-conditional (preset "
            f"{preset.name!r} has num_classes=0; use cflow64/cddpm64)")
        assert preset.process in ("flow", "ddpm"), preset.process
        return _guided_main(args, preset)
    if args.method in ("consistency", "progressive"):
        assert preset.process == "ddpm", (
            f"{args.method} distillation needs a DDPM-chain teacher; preset "
            f"{preset.name!r} trains {preset.process!r} (flow teachers "
            f"use --method reflow)")
        if args.method == "progressive":
            return _progressive_main(args, preset)
        return _consistency_main(args, preset)
    assert preset.process == "flow", (
        f"ReFlow distills rectified flows; preset {preset.name!r} trains "
        f"process {preset.process!r} (use a flow preset, e.g. flow64, or "
        f"--method consistency for DDPM teachers)")
    if args.image_size:
        preset.image_size = args.image_size
    batch_size = args.batch_size or preset.batch_size

    # build_process returns the INNER flow on the model-facing grid (the
    # latent grid for latent presets) — distillation runs entirely in that
    # space: couplings, re-fit and the eval functionals never touch the
    # first stage, so no AE checkpoint is needed here. The student serves
    # through cli/inference.py, which wraps the same denoiser in
    # LatentDiffusion (+ --ae_ckpt) exactly as it did the teacher.
    flow = build_process(preset, preset.timesteps, preset.image_size,
                         cond_type=None)
    if preset.is_latent:
        print(f"latent preset: distilling the inner flow on the "
              f"{flow.image_size}x{flow.image_size}x{flow.in_channels} "
              f"latent grid")
    mcfg = preset.model_config(bf16=not args.no_bf16)
    model = build_denoiser(mcfg)

    x0 = jnp.zeros((1, flow.image_size, flow.image_size,
                    flow.in_channels), jnp.float32)
    template = jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                                   jnp.zeros((1,), jnp.int32))
    raw, ema = restore_params(args.ckpt, template)
    teacher = jax.tree.map(jnp.asarray, raw if args.use_raw_params else ema)
    print(f"teacher loaded from {args.ckpt} "
          f"({'raw' if args.use_raw_params else 'ema'} params)")

    def fn_of(params):
        return lambda x, t, c, y: model.apply(params, x, t, cond=c, y=y)

    # threaded-params form for all jitted paths (closed-over trees hit the
    # remote-compile HTTP-413 payload limit on the chip, CLAUDE.md)
    apply5 = lambda p, x, t, c, y: model.apply(p, x, t, cond=c, y=y)

    dtype = jnp.float32 if args.no_bf16 else jnp.bfloat16
    rng = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    eps, x1 = generate_couplings(
        flow, apply5, rng, args.n_pairs, num_steps=args.pair_steps,
        method=args.pair_method, batch_size=batch_size, dtype=dtype,
        params=teacher)
    print(f"{args.n_pairs} couplings via {args.pair_method}-{args.pair_steps} "
          f"in {time.time()-t0:.1f}s")

    # held-out evaluation noise (never in the training couplings)
    eval_eps = jax.random.normal(
        jax.random.fold_in(rng, 10_007),
        (args.eval_n, flow.image_size, flow.image_size,
         flow.in_channels), jnp.float32)
    eval_x1 = jax.jit(lambda tp, e: flow.sample(
        fn_of(tp), rng, args.eval_n, num_steps=args.pair_steps,
        method=args.pair_method, x_T=e, dtype=dtype).x)(teacher, eval_eps)

    def score(params, label):
        out = {"straightness": float(straightness(
            flow, apply5, eval_eps, eval_x1, params=params))}
        for k in args.few_steps:
            out[f"euler{k}_gap"] = float(endpoint_gap(
                flow, apply5, eval_eps, few_steps=k, dtype=dtype,
                params=params))
        print(f"[{label}] " + "  ".join(f"{k}={v:.4f}" for k, v in out.items()))
        return out

    results = {"teacher": score(teacher, "teacher")}

    # student re-fit: init = teacher, cosine fine-tune on paired batches
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, max(args.steps // 20, 1), args.steps, args.lr * 0.01)
    tx = optax.adamw(sched)
    # copy: the donated train step consumes the state buffers; keep the
    # teacher's own params alive (scored above, and callers may reuse them)
    state = TrainState.create(jax.tree.map(jnp.copy, teacher), tx)
    step_fn = make_train_step(flow, lambda p, x, t, cond=None, y=None,
                              train=False, dropout_rng=None:
                              model.apply(p, x, t, cond=cond, y=y),
                              tx, ema_decay=args.ema_decay, ema_every=1,
                              ema_warmup=False)
    jstep = jax.jit(step_fn, donate_argnums=(0,))
    it = coupling_batches(eps, x1, batch_size, seed=args.seed + 1)
    t0 = time.time()
    loss0 = loss = None
    for i in range(args.steps):
        rng, srng = jax.random.split(rng)
        state, m = jstep(state, jax.tree.map(jnp.asarray, next(it)), srng)
        if i == 0:
            loss0 = float(m["loss"])
        if (i + 1) % max(args.steps // 10, 1) == 0:
            loss = float(m["loss"])
            print(f"step {i+1}/{args.steps} loss={loss:.5f} "
                  f"({(time.time()-t0)/(i+1)*1e3:.0f} ms/step)")
    print(f"re-fit: loss {loss0:.5f} -> {loss:.5f}")

    student = state.ema_params
    results["student"] = score(student, "student")
    for k in args.few_steps:
        key = f"euler{k}_gap"
        assert results["student"][key] == results["student"][key], "nan gap"

    os.makedirs(args.dir, exist_ok=True)
    ckpt_path = save_checkpoint(os.path.abspath(args.dir),
                                jax.device_get(state), name="student")
    results["config"] = {k: v for k, v in vars(args).items()}
    with open(os.path.join(args.dir, "distill_metrics.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(f"student checkpoint: {ckpt_path}")
    print(json.dumps({k: results[k] for k in ("teacher", "student")}))
    return results


def _consistency_main(args, preset):
    """Consistency distillation of a DDPM-chain teacher (data-free: the x0
    pool is the teacher's own DDIM samples)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from eo_diffusion_tpu.cli.presets import build_denoiser, build_process
    from eo_diffusion_tpu.diffusion.consistency import ConsistencyDistillation
    from eo_diffusion_tpu.train.checkpoint import restore_params, save_checkpoint
    from eo_diffusion_tpu.train.trainer import TrainState

    if args.image_size:
        preset.image_size = args.image_size
    batch_size = args.batch_size or preset.batch_size
    # build_process returns the INNER chain on the model-facing grid (the
    # latent grid for latent presets). Like ReFlow above, the whole
    # distillation runs in that space — the x0 pool is teacher DDIM samples,
    # which for latent presets ARE latents, so the first stage is never
    # touched here. The student serves through cli/inference.py --sampler cm
    # (+ --ae_ckpt), which decodes exactly as it did for the teacher.
    diffusion = build_process(preset, preset.timesteps, preset.image_size,
                              cond_type=None)
    if preset.is_latent:
        print(f"latent preset: consistency-distilling the inner chain on "
              f"the {diffusion.image_size}x{diffusion.image_size}x"
              f"{diffusion.in_channels} latent grid (sigma_data="
              f"{args.sigma_data}; scaled latents are ~unit std — "
              f"consider --sigma_data 1.0)")
    mcfg = preset.model_config(bf16=not args.no_bf16)
    model = build_denoiser(mcfg)
    size, chans = diffusion.image_size, diffusion.in_channels

    x0_tmpl = jnp.zeros((1, size, size, chans), jnp.float32)
    template = jax.jit(model.init)(jax.random.PRNGKey(0), x0_tmpl,
                                   jnp.zeros((1,), jnp.int32))
    raw, ema = restore_params(args.ckpt, template)
    teacher = jax.tree.map(jnp.asarray, raw if args.use_raw_params else ema)
    print(f"teacher loaded from {args.ckpt}")

    def fn_of(params):
        return lambda x, t, c, y: model.apply(params, x, t, cond=c, y=y)

    dtype = jnp.float32 if args.no_bf16 else jnp.bfloat16
    rng = jax.random.PRNGKey(args.seed)
    cd = ConsistencyDistillation.create(diffusion, n_points=args.cd_points,
                                        huber_c=args.huber_c,
                                        sigma_data=args.sigma_data)

    # x0 pool: teacher DDIM samples (data-free distillation). The teacher
    # tree is THREADED as a jit argument everywhere below — closing over it
    # is the HTTP-413 remote-compile failure mode (CLAUDE.md)
    t0 = time.time()
    pool = []

    def gen_chunk(tp, k):
        return diffusion.ddim_sample(fn_of(tp), k, batch_size,
                                     num_steps=args.pair_steps,
                                     dtype=dtype).x

    jgen = jax.jit(gen_chunk)
    for i in range(-(-args.n_pairs // batch_size)):
        pool.append(np.asarray(jgen(teacher, jax.random.fold_in(rng, i)),
                               np.float32))
    pool = np.concatenate(pool)[:args.n_pairs]
    print(f"{len(pool)} teacher DDIM-{args.pair_steps} samples as the x0 "
          f"pool in {time.time()-t0:.1f}s")

    # eval: endpoint gap of k-evaluation consistency sampling vs the
    # teacher's DDIM-{pair_steps} PF-ODE endpoint from the SAME noise
    eval_eps = jax.random.normal(jax.random.fold_in(rng, 10_007),
                                 (args.eval_n, size, size, chans), jnp.float32)
    ref = np.asarray(jax.jit(lambda tp, e: diffusion.ddim_sample(
        fn_of(tp), rng, args.eval_n, num_steps=args.pair_steps,
        x_T=e, dtype=dtype).x)(teacher, eval_eps))
    ref_norm = float(np.sqrt((ref**2).mean()))

    def _cm_k(params, eps, k):
        return cd.sample(fn_of(params), jax.random.PRNGKey(99),
                         args.eval_n, steps=k, x_T=eps, dtype=dtype).x

    jcm = {k: jax.jit(lambda p, e, k=k: _cm_k(p, e, k))
           for k in args.few_steps}

    def score(params, label):
        out = {}
        for k in args.few_steps:
            x = np.asarray(jcm[k](params, eval_eps))
            out[f"cm{k}_gap"] = float(
                np.sqrt(((x - ref) ** 2).mean())) / ref_norm
        print(f"[{label}] " + "  ".join(f"{k}={v:.4f}" for k, v in out.items()))
        return out

    results = {"teacher_init": score(teacher, "teacher-init")}

    student = jax.tree.map(jnp.copy, teacher)
    target = jax.tree.map(jnp.copy, teacher)
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, max(args.steps // 20, 1), args.steps, args.lr * 0.01)
    tx = optax.adamw(sched)
    opt = tx.init(student)

    @jax.jit
    def jstep(student, target, teacher_p, opt, rng, x0):
        def loss_fn(sp):
            return cd.distill_loss(fn_of(sp), fn_of(target),
                                   fn_of(teacher_p), rng, x0)

        loss, grads = jax.value_and_grad(loss_fn)(student)
        up, opt = tx.update(grads, opt, student)
        student = optax.apply_updates(student, up)
        target = ConsistencyDistillation.update_target(
            target, student, args.target_decay)
        return student, target, opt, loss

    data_rng = np.random.default_rng(args.seed + 1)
    t0 = time.time()
    loss0 = loss = None
    for i in range(args.steps):
        rng, srng = jax.random.split(rng)
        idx = data_rng.integers(0, len(pool), batch_size)
        student, target, opt, l = jstep(student, target, teacher, opt, srng,
                                        jnp.asarray(pool[idx]))
        if i == 0:
            loss0 = float(l)
        if (i + 1) % max(args.steps // 10, 1) == 0:
            loss = float(l)
            print(f"step {i+1}/{args.steps} loss={loss:.5f} "
                  f"({(time.time()-t0)/(i+1)*1e3:.0f} ms/step)")
    print(f"distilled: loss {loss0:.5f} -> {loss:.5f}")

    results["student"] = score(target, "student")  # serve the slow-EMA

    os.makedirs(args.dir, exist_ok=True)
    state = TrainState.create(student, tx)
    state = state.replace(ema_params=target)
    ckpt_path = save_checkpoint(os.path.abspath(args.dir),
                                jax.device_get(state), name="student")
    results["config"] = {k: v for k, v in vars(args).items()}
    with open(os.path.join(args.dir, "distill_metrics.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(f"student checkpoint: {ckpt_path}")
    print(json.dumps({k: results[k] for k in ("teacher_init", "student")}))
    return results


def _progressive_main(args, preset):
    """Progressive distillation (Salimans & Ho, diffusion/progressive.py):
    ``--pd_rounds`` halving rounds starting from a ``--pd_base_steps``
    teacher grid. Students are v-parameterized (paper §4; see the module
    docstring for the measured eps-head failure) — round 1 re-calibrates
    the head from the teacher's weights, later rounds distill v -> v.
    Like the consistency path, the x0 pool is teacher DDIM samples
    (data-free; also keeps latent presets AE-free here — the paper
    distills on real data, a ``cli.train`` data pipe can be swapped in when
    real datasets are mounted). Serve with ``cli.inference --sampler pd``
    (which reads the checkpoint as a v head on the PD grid)."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from eo_diffusion_tpu.cli.presets import build_denoiser, build_process
    from eo_diffusion_tpu.diffusion.progressive import (
        ProgressiveDistillation,
        pd_sample,
    )
    from eo_diffusion_tpu.train.checkpoint import restore_params, save_checkpoint
    from eo_diffusion_tpu.train.trainer import TrainState

    if args.image_size:
        preset.image_size = args.image_size
    batch_size = args.batch_size or preset.batch_size
    diffusion = build_process(preset, preset.timesteps, preset.image_size,
                              cond_type=None)
    if preset.is_latent:
        print(f"latent preset: progressive rounds on the "
              f"{diffusion.image_size}px latent grid")
    mcfg = preset.model_config(bf16=not args.no_bf16)
    model = build_denoiser(mcfg)
    size, chans = diffusion.image_size, diffusion.in_channels

    template = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, chans), jnp.float32),
        jnp.zeros((1,), jnp.int32))
    raw, ema = restore_params(args.ckpt, template)
    teacher = jax.tree.map(jnp.asarray, raw if args.use_raw_params else ema)
    print(f"teacher loaded from {args.ckpt}")

    def fn_of(params):
        return lambda x, t, c, y: model.apply(params, x, t, cond=c, y=y)

    dtype = jnp.float32 if args.no_bf16 else jnp.bfloat16
    rng = jax.random.PRNGKey(args.seed)

    # x0 pool: teacher DDIM samples (params threaded, CLAUDE.md HTTP-413)
    t0 = time.time()
    jgen = jax.jit(lambda tp, k: diffusion.ddim_sample(
        fn_of(tp), k, batch_size, num_steps=args.pair_steps, dtype=dtype).x)
    pool = np.concatenate([
        np.asarray(jgen(teacher, jax.random.fold_in(rng, i)), np.float32)
        for i in range(-(-args.n_pairs // batch_size))])[:args.n_pairs]
    print(f"{len(pool)} teacher DDIM-{args.pair_steps} samples as the x0 "
          f"pool in {time.time()-t0:.1f}s")

    eval_eps = jax.random.normal(jax.random.fold_in(rng, 10_007),
                                 (args.eval_n, size, size, chans), jnp.float32)
    ref = np.asarray(jax.jit(lambda tp, e: diffusion.ddim_sample(
        fn_of(tp), rng, args.eval_n, num_steps=args.pair_steps,
        x_T=e, dtype=dtype).x)(teacher, eval_eps))
    ref_norm = float(np.sqrt((ref**2).mean()))

    v_process = dataclasses.replace(diffusion, objective="v")

    def score(params, label, process):
        out = {}
        for k in args.few_steps:
            x = np.asarray(jax.jit(
                lambda p, e, k=k: pd_sample(process, fn_of(p),
                                            jax.random.PRNGKey(99),
                                            args.eval_n, steps=k, x_T=e,
                                            dtype=dtype).x)(params, eval_eps))
            out[f"pd{k}_gap"] = float(np.sqrt(((x - ref) ** 2).mean())) / ref_norm
        print(f"[{label}] " + "  ".join(f"{k}={v:.4f}" for k, v in out.items()))
        return out

    results = {"teacher_init": score(teacher, "teacher-init", diffusion)}
    data_rng = np.random.default_rng(args.seed + 1)
    student = teacher
    n_teacher = args.pd_base_steps
    for r in range(args.pd_rounds):
        n_student = n_teacher // 2
        assert n_student >= 1, (
            f"--pd_base_steps {args.pd_base_steps} halves below 1 step at "
            f"round {r+1}; fewer --pd_rounds or a larger base")
        # round 1 distills the preset's head into a v student; later
        # rounds are v -> v
        pd = ProgressiveDistillation.create(
            diffusion, n_student,
            teacher_objective=None if r == 0 else "v")
        teacher_r = student
        student = jax.tree.map(jnp.copy, teacher_r)
        sched = optax.warmup_cosine_decay_schedule(
            0.0, args.lr, max(args.steps // 20, 1), args.steps, args.lr * 0.01)
        tx = optax.adamw(sched)
        opt = tx.init(student)

        @jax.jit
        def jstep(student, teacher_p, opt, rng, x0, pd=pd, tx=tx):
            loss, grads = jax.value_and_grad(
                lambda sp: pd.distill_loss(fn_of(sp), fn_of(teacher_p),
                                           rng, x0))(student)
            up, opt = tx.update(grads, opt, student)
            return optax.apply_updates(student, up), opt, loss

        t0 = time.time()
        loss0 = loss = None
        for i in range(args.steps):
            rng, srng = jax.random.split(rng)
            idx = data_rng.integers(0, len(pool), batch_size)
            student, opt, l = jstep(student, teacher_r, opt, srng,
                                    jnp.asarray(pool[idx]))
            if i == 0:
                loss0 = float(l)
            if (i + 1) % max(args.steps // 5, 1) == 0:
                loss = float(l)
                print(f"round {r+1} ({n_teacher}->{n_student} steps) "
                      f"step {i+1}/{args.steps} loss={loss:.5f} "
                      f"({(time.time()-t0)/(i+1)*1e3:.0f} ms/step)")
        print(f"round {r+1}: loss {loss0:.5f} -> {loss:.5f}")
        results[f"round{r+1}"] = score(student, f"round{r+1} ({n_student}-step)",
                                       v_process)
        n_teacher = n_student

    os.makedirs(args.dir, exist_ok=True)
    state = TrainState.create(student, optax.adamw(args.lr))
    state = state.replace(ema_params=student)
    ckpt_path = save_checkpoint(os.path.abspath(args.dir),
                                jax.device_get(state), name="student")
    results["config"] = {k: v for k, v in vars(args).items()}
    results["final_steps"] = n_teacher
    results["student_objective"] = "v"
    with open(os.path.join(args.dir, "distill_metrics.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(f"student checkpoint: {ckpt_path}")
    print(json.dumps({k: v for k, v in results.items()
                      if k.startswith(("teacher", "round"))}))
    return results


def _guided_main(args, preset):
    """Guidance distillation (Meng et al., arXiv:2210.03142): fold the
    CFG-combined class-conditional teacher into a single-call student, so
    guided sampling stops paying the doubled batch.

    * flow teachers: couplings are simulated from the GUIDED probability-
      flow ODE (``cfg_model_fn`` wraps the teacher; both CFG branches live
      in one jaxpr) and the class-conditional student re-fits on the paired
      endpoints — one stage buys BOTH the CFG fold and ReFlow's few-step
      straightening, so the student samples guided-quality classes at 1-4
      unguided Euler calls.
    * ddpm teachers: single-call regression — the student matches the
      guided eps-prediction at q-sampled points of a teacher-sample pool
      (data-free, like the consistency path); same-NFE sampling at half
      the per-step cost.

    The student keeps a fixed w (the paper's w-conditioned variant needs a
    w-embedding input the backbones don't carry; a per-w student is the
    fixed-scale row of the paper's Table 2).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from eo_diffusion_tpu.cli.presets import build_denoiser, build_process
    from eo_diffusion_tpu.diffusion.distill import (
        cfg_model_fn,
        endpoint_gap,
        generate_couplings,
        straightness,
    )
    from eo_diffusion_tpu.train.checkpoint import restore_params, save_checkpoint
    from eo_diffusion_tpu.train.trainer import TrainState, make_train_step

    if args.image_size:
        preset.image_size = args.image_size
    batch_size = args.batch_size or preset.batch_size
    n_classes = preset.num_classes
    w = args.guidance_scale
    process = build_process(preset, preset.timesteps, preset.image_size,
                            cond_type=None)
    # the null embedding row MUST exist (cfg_model_fn indexes class
    # num_classes); teachers are trained with CFG label dropout (the
    # class-conditional presets default class_dropout=0.15) — a teacher
    # without the row would NaN on the unconditional branch
    mcfg = preset.model_config(bf16=not args.no_bf16,
                               class_dropout_prob=preset.class_dropout or 0.1)
    model = build_denoiser(mcfg)
    dtype = jnp.float32 if args.no_bf16 else jnp.bfloat16

    x0 = jnp.zeros((1, process.image_size, process.image_size,
                    process.in_channels), jnp.float32)
    template = jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                                   jnp.zeros((1,), jnp.int32),
                                   y=jnp.zeros((1,), jnp.int32))
    try:
        raw, ema = restore_params(args.ckpt, template)
    except Exception as e:
        raise SystemExit(
            f"failed to restore the guided teacher from {args.ckpt}: {e}\n"
            "guidance distillation needs a teacher trained WITH CFG label "
            "dropout (the null class row) — train with --preset cflow64/"
            "cddpm64 (class_dropout defaults on) or pass --class_dropout")
    teacher = jax.tree.map(jnp.asarray, raw if args.use_raw_params else ema)
    print(f"teacher loaded from {args.ckpt} (w={w:g}, {n_classes} classes)")

    apply5 = lambda p, x, t, c, y: model.apply(p, x, t, cond=c, y=y)
    # the guided teacher: CFG folded into one fn (two calls in one jaxpr)
    apply5g = lambda p, x, t, c, y: cfg_model_fn(
        lambda xx, tt, cc, yy: model.apply(p, xx, tt, cond=cc, y=yy),
        w, n_classes)(x, t, c, y)

    rng = jax.random.PRNGKey(args.seed)
    npr = np.random.default_rng(args.seed)
    results = {"guidance_scale": w, "process": preset.process}

    if preset.process == "flow":
        y_pairs = npr.integers(0, n_classes, args.n_pairs).astype(np.int32)
        t0 = time.time()
        eps, x1 = generate_couplings(
            process, apply5g, rng, args.n_pairs, num_steps=args.pair_steps,
            method=args.pair_method, batch_size=batch_size, dtype=dtype,
            y=y_pairs, params=teacher)
        print(f"{args.n_pairs} GUIDED couplings via {args.pair_method}-"
              f"{args.pair_steps} in {time.time()-t0:.1f}s")

        eval_eps = jax.random.normal(
            jax.random.fold_in(rng, 10_007),
            (args.eval_n, process.image_size, process.image_size,
             process.in_channels), jnp.float32)
        eval_y = jnp.asarray(np.arange(args.eval_n) % n_classes, jnp.int32)
        eval_x1 = jax.jit(lambda tp, e, yy: process.sample(
            lambda x, t, c, y: apply5g(tp, x, t, c, y), rng, args.eval_n,
            num_steps=args.pair_steps, method=args.pair_method, x_T=e,
            y=yy, dtype=dtype).x)(teacher, eval_eps, eval_y)

        def score(params, fn5, label):
            out = {"straightness": float(straightness(
                process, fn5, eval_eps, eval_x1, y=eval_y, params=params))}
            for k in args.few_steps:
                out[f"euler{k}_gap"] = float(endpoint_gap(
                    process, fn5, eval_eps, few_steps=k, dtype=dtype,
                    y=eval_y, params=params))
            print(f"[{label}] " + "  ".join(f"{k}={v:.4f}"
                                            for k, v in out.items()))
            return out

        results["teacher"] = score(teacher, apply5g, "guided teacher")

        sched = optax.warmup_cosine_decay_schedule(
            0.0, args.lr, max(args.steps // 20, 1), args.steps,
            args.lr * 0.01)
        tx = optax.adamw(sched)
        state = TrainState.create(jax.tree.map(jnp.copy, teacher), tx)
        step_fn = make_train_step(
            process, lambda p, x, t, cond=None, y=None, train=False,
            dropout_rng=None: model.apply(p, x, t, cond=cond, y=y),
            tx, ema_decay=args.ema_decay, ema_every=1, ema_warmup=False,
            class_conditional=True, class_dropout_prob=0.0,
            num_classes=n_classes)
        # device-resident couplings with index-only feeds: per-step host
        # batch feeds leak host RSS through the axon tunnel (CLAUDE.md)
        import functools

        from eo_diffusion_tpu.data.device_cache import DeviceDataCache

        cache = DeviceDataCache({"image": x1, "noise": eps,
                                 "label": y_pairs})

        @functools.partial(jax.jit, donate_argnums=(0,))
        def jstep(state, tensors, r):
            i_rng, s_rng = jax.random.split(r)
            idx = jax.random.randint(i_rng, (batch_size,), 0,
                                     tensors["image"].shape[0])
            mb = {k: v[idx] for k, v in tensors.items()}
            return step_fn(state, mb, s_rng)

        t0 = time.time()
        loss0 = loss = None
        for i in range(args.steps):
            rng, srng = jax.random.split(rng)
            state, m = jstep(state, cache.tensors, srng)
            if i == 0:
                loss0 = float(m["loss"])
            if (i + 1) % max(args.steps // 10, 1) == 0:
                loss = float(m["loss"])
                print(f"step {i+1}/{args.steps} loss={loss:.5f} "
                      f"({(time.time()-t0)/(i+1)*1e3:.0f} ms/step)")
        print(f"re-fit: loss {loss0:.5f} -> {loss:.5f}")
        results["student"] = score(state.ema_params, apply5,
                                   "single-call student")
    else:  # ddpm: single-call guided-eps regression on a teacher pool
        n_pool = args.pool_n
        y_pool = npr.integers(0, n_classes, n_pool).astype(np.int32)
        y_null = jnp.full((batch_size,), n_classes, jnp.int32)

        def draw(tp, r, yy):
            return process.ddim_sample(
                lambda x, t, c, y: apply5(tp, x, t, c, y), r, batch_size,
                num_steps=args.pool_steps, y=yy, guidance_scale=w,
                y_uncond=y_null, clip=True, dtype=dtype,
            ).x.astype(jnp.float32)

        jd = jax.jit(draw)
        pool = []
        t0 = time.time()
        for i in range(-(-n_pool // batch_size)):
            yy = jnp.asarray(np.resize(y_pool[i * batch_size:(i + 1) * batch_size],
                                       batch_size))
            pool.append(np.asarray(jd(teacher, jax.random.PRNGKey(700 + i), yy)))
        pool = np.concatenate(pool)[:n_pool]
        print(f"{n_pool} guided teacher samples (DDIM-{args.pool_steps}, "
              f"w={w:g}) in {time.time()-t0:.1f}s")

        T = process.timesteps

        def loss_fn(p, tp, x0b, yb, r):
            r1, r2 = jax.random.split(r)
            t = jax.random.randint(r1, (x0b.shape[0],), 0, T)
            noise = jax.random.normal(r2, x0b.shape, jnp.float32)
            x_t = process.q_sample(x0b, t, noise).astype(dtype)
            target = jax.lax.stop_gradient(
                apply5g(tp, x_t, t, None, yb).astype(jnp.float32))
            pred = apply5(p, x_t, t, None, yb).astype(jnp.float32)
            return jnp.mean((pred - target) ** 2)

        sched = optax.warmup_cosine_decay_schedule(
            0.0, args.lr, max(args.steps // 20, 1), args.steps,
            args.lr * 0.01)
        tx = optax.adamw(sched)
        state = TrainState.create(jax.tree.map(jnp.copy, teacher), tx)

        import functools

        @functools.partial(jax.jit, donate_argnums=(0,))
        def jstep(state, tp, x0b, yb, r):
            loss, grads = jax.value_and_grad(loss_fn)(state.params, tp,
                                                      x0b, yb, r)
            updates, opt_state = tx.update(grads, state.opt_state,
                                           state.params)
            params = optax.apply_updates(state.params, updates)
            ema = jax.tree.map(
                lambda e, q: args.ema_decay * e + (1 - args.ema_decay) * q,
                state.ema_params, params)
            return state.replace(params=params, opt_state=opt_state,
                                 ema_params=ema,
                                 step=state.step + 1), loss

        pool_d = jnp.asarray(pool)
        y_d = jnp.asarray(y_pool)
        t0 = time.time()
        loss0 = loss = None
        for i in range(args.steps):
            idx = jnp.asarray(npr.integers(0, n_pool, batch_size))
            rng, srng = jax.random.split(rng)
            state, l = jstep(state, teacher, pool_d[idx], y_d[idx], srng)
            if i == 0:
                loss0 = float(l)
            if (i + 1) % max(args.steps // 10, 1) == 0:
                loss = float(l)
                print(f"step {i+1}/{args.steps} loss={loss:.5f} "
                      f"({(time.time()-t0)/(i+1)*1e3:.0f} ms/step)")
        print(f"regression: loss {loss0:.5f} -> {loss:.5f}")
        results["teacher"] = {"pool_steps": args.pool_steps}
        results["student"] = {"regression_loss_first": loss0,
                              "regression_loss_final": loss}

    os.makedirs(args.dir, exist_ok=True)
    ckpt_path = save_checkpoint(os.path.abspath(args.dir),
                                jax.device_get(state), name="student")
    results["config"] = {k: v for k, v in vars(args).items()}
    with open(os.path.join(args.dir, "distill_metrics.json"), "w") as f:
        json.dump(results, f, indent=2)
    print(f"student checkpoint: {ckpt_path}")
    print(json.dumps({k: results[k] for k in ("teacher", "student")}))
    return results


if __name__ == "__main__":
    args = parse_args()
    if args.cpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    main(args)
