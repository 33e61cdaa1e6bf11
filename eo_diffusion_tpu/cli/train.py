"""Training CLI with the reference's flag surface.

``python -m eo_diffusion_tpu.cli.train --preset clouds64-attn --epochs 100``

Flags mirror reference ``train.py:22-42`` (--lr --batch_size --epochs --dir
--ckpt --n_samples --model_base_dim --timesteps --model_ema_steps
--model_ema_decay --log_freq --no_clip --cpu --wandb --num_classes) plus the
preset/dataset selectors that replace the reference's edit-the-source config
flow (README.md:85-104).

Behavioral parity notes:
* periodic EMA sampling to PNG grids (train.py:148-154) and best-loss +
  periodic checkpointing (train.py:133-155) -- with the reference's
  stale-`ckpt` best-loss bug (SURVEY.md §2.4) fixed: we save the *current*
  state when the loss improves;
* class-conditional training works (the reference's was broken by the
  unbound `target` at train.py:112).
"""

from __future__ import annotations

import argparse
import math
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Train EO diffusion (TPU-native)")
    parser.add_argument("--lr", type=float, default=0.001)
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--dir", type=str, default="results/run", help="sample output directory")
    parser.add_argument("--ckpt", type=str, default="", help="checkpoint path to resume from")
    parser.add_argument("--resume", action="store_true",
                        help="auto-resume from the latest checkpoint in the run's "
                             "log dir if one exists (restart-safe training)")
    parser.add_argument("--n_samples", type=int, default=16)
    parser.add_argument("--model_base_dim", type=int, default=None)
    parser.add_argument("--timesteps", type=int, default=None)
    parser.add_argument("--model_ema_steps", type=int, default=10)
    parser.add_argument("--model_ema_decay", type=float, default=0.995)
    parser.add_argument("--log_freq", type=int, default=10)
    parser.add_argument("--no_clip", action="store_true")
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--wandb", action="store_true")
    parser.add_argument("--num_classes", type=int, default=0)
    parser.add_argument("--class_dropout", type=float, default=0.0,
                        help="CFG label-dropout probability (reserves the "
                             "learned null-class row; enables "
                             "--guidance_scale at inference)")
    parser.add_argument("--cond_type", type=str, default=None)
    parser.add_argument("--grad_accum", type=int, default=1,
                        help="accumulate gradients over k micro-batches per "
                             "optimizer step (lucidrains gradient_accumulate_every)")
    parser.add_argument("--grad_clip", type=float, default=0.0,
                        help="global-norm gradient clipping (0 = off; "
                             "recommended ~1.0 for small micro-batches at "
                             "high resolution, e.g. the 256px presets)")
    parser.add_argument("--optimizer", type=str, default="adamw",
                        choices=["adamw", "muon"],
                        help="adamw (reference parity) or muon "
                             "(Newton-Schulz-orthogonalized momentum on "
                             "matrix kernels, adamw on the rest; "
                             "train/muon.py)")
    parser.add_argument("--muon_lr_mult", type=float, default=1.0,
                        help="muon-branch LR as a multiple of the shared "
                             "schedule (orthogonalized updates have a "
                             "different natural scale than adam's)")
    parser.add_argument("--skip_nonfinite", action="store_true",
                        help="drop updates with non-finite grads on device "
                             "(params/opt state untouched; cumulative count "
                             "in the step metrics) instead of poisoning the "
                             "run — long unattended trainings")
    parser.add_argument("--fsdp", action="store_true",
                        help="shard params/EMA/Adam moments over the mesh "
                             "'model' axis (ZeRO-style; parallel/mesh.py)")
    parser.add_argument("--tp", action="store_true",
                        help="Megatron tensor parallelism on the attention "
                             "projections over the 'model' axis (composes "
                             "with --fsdp)")
    parser.add_argument("--sp", action="store_true",
                        help="sequence parallelism: route self-attention "
                             "through the ppermute ring over the 'model' "
                             "axis (ring attention, O(T/n) per-chip KV; "
                             "mutually exclusive with --tp)")
    parser.add_argument("--ep", action="store_true",
                        help="expert parallelism: shard MoE expert weights "
                             "over the 'model' axis (MoE presets, e.g. "
                             "moe-dit64; composes with --fsdp/--tp)")
    parser.add_argument("--model_parallel", type=int, default=1,
                        help="mesh 'model' axis size for --fsdp/--tp/--sp/"
                             "--ep (devices/model_parallel become the data "
                             "axis)")
    parser.add_argument("--pp_micro", type=int, default=0,
                        help="1F1B pipeline parallelism over the 'model' "
                             "axis with this many microbatches (DiT "
                             "backbones; needs --model_parallel > 1). "
                             "Supports every objective + p2/VLB/min-SNR "
                             "reweighting (per-sample weight threaded to "
                             "the pipeline loss head); LIMITATION: "
                             "self_cond/MeanFlow presets train with "
                             "DP/FSDP/TP instead (structural second model "
                             "pass; the engine asserts loudly)")
    parser.add_argument("--pp_virtual", type=int, default=1,
                        help="interleaved virtual stages per device "
                             "(Megatron-style; shrinks the pipeline bubble "
                             "to chunk units; needs depth %% "
                             "(stages*pp_virtual) == 0 and pp_micro %% "
                             "stages == 0)")
    # new: config registry instead of edit-the-source
    parser.add_argument("--preset", type=str, default="eurosat64")
    parser.add_argument("--dataset", type=str, default=None, help="override preset dataset")
    parser.add_argument("--data_root", type=str, default=None)
    parser.add_argument("--image_size", type=int, default=None)
    parser.add_argument("--steps_per_epoch", type=int, default=None,
                        help="cap steps per epoch (smoke runs)")
    parser.add_argument("--no_bf16", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--sample_every", type=int, default=1000)
    parser.add_argument("--save_every", type=int, default=1000)
    parser.add_argument("--tome_ratio", type=float, default=0.0,
                        help="token merging during TRAINING on DiT presets "
                             "(ops/tome.py, arXiv:2303.17604): the merge is "
                             "differentiable, so fwd+bwd run on the reduced "
                             "token count; checkpoints stay interchangeable "
                             "with the un-merged config")
    parser.add_argument("--tome_mlp", action="store_true",
                        help="extend --tome_ratio's merge around the MLP "
                             "branch")
    parser.add_argument("--posthoc_ema", action="store_true",
                        help="maintain power-function EMA tracks "
                             "(arXiv:2312.02696) alongside the classic EMA "
                             "and snapshot them at every checkpoint; after "
                             "training, ANY EMA length can be synthesized "
                             "from the snapshots (inference "
                             "--phema_sigma_rel)")
    parser.add_argument("--posthoc_gammas", type=str, default="16.97,6.94",
                        help="comma-separated power-EMA exponents (the "
                             "defaults correspond to sigma_rel 0.05/0.10)")
    parser.add_argument("--preview_sampler", type=str, default="ddpm",
                        choices=["ddpm", "ddim", "dpm", "flow"],
                        help="sampler for the periodic training previews "
                             "(ddpm = reference parity, full T-step chain; "
                             "ddim/dpm cut a 256px preview from ~7 min to "
                             "seconds)")
    parser.add_argument("--preview_steps", type=int, default=50,
                        help="steps for ddim/dpm previews")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="capture a jax.profiler trace (TensorBoard / "
                             "xprof format; utils/profiling.py) of "
                             "--profile_steps training steps into this "
                             "directory, starting AFTER the first step so "
                             "compile time stays out of the capture")
    parser.add_argument("--profile_steps", type=int, default=3,
                        help="steps inside the profiler capture window")
    parser.add_argument("--ae_ckpt", type=str, default=None,
                        help="latent presets: directory of a trained first "
                             "stage (train/ae_trainer.save_ae layout); default "
                             "is <ckpt_dir>/ae, trained in-run if absent")
    parser.add_argument("--ae_steps", type=int, default=None,
                        help="latent presets: first-stage training steps when "
                             "no saved AE exists (default: preset.ae_steps)")
    parser.add_argument("--ae_lr", type=float, default=2e-3)
    parser.add_argument("--config", type=str, default=None,
                        help="JSON config file; keys override defaults, CLI flags "
                             "override the file (the config-file-driven path the "
                             "reference's broken scripts/train_pl.py aspired to)")
    args = parser.parse_args(argv)
    if args.config:
        import json

        with open(args.config) as f:
            file_cfg = json.load(f)
        explicit = {a.split("=")[0].lstrip("-").replace("-", "_")
                    for a in (argv if argv is not None else __import__("sys").argv[1:])
                    if a.startswith("--")}
        for k, v in file_cfg.items():
            if not hasattr(args, k):
                raise ValueError(f"unknown config key {k!r}")
            if k not in explicit:
                setattr(args, k, v)
    return args


def main(args):
    from eo_diffusion_tpu.cli.presets import build_denoiser, build_process, get_preset
    from eo_diffusion_tpu.data.factories import DATASET_FACTORIES
    from eo_diffusion_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
    from eo_diffusion_tpu.train.trainer import Trainer, TrainerConfig
    from eo_diffusion_tpu.utils.images import save_image_grid

    preset = get_preset(args.preset)
    dataset = args.dataset or preset.dataset
    image_size = args.image_size or preset.image_size
    preset.image_size = image_size  # keep preset.latent_size consistent
    timesteps = args.timesteps or preset.timesteps
    if args.model_base_dim:
        preset.base_dim = args.model_base_dim
    cond_type = args.cond_type or preset.cond_type
    if args.num_classes == 0 and preset.num_classes:
        # class-conditional presets (cflow64/cddpm64) train conditional by
        # default — without this the model builds conditional (preset
        # num_classes) but the Trainer would feed y=None
        args.num_classes = preset.num_classes
    if args.class_dropout == 0.0 and preset.class_dropout:
        # class-conditional presets default to CFG label dropout (the null
        # embedding row must exist for guidance / guided distillation)
        args.class_dropout = preset.class_dropout
    if preset.process == "meanflow" and preset.mf_cfg_omega != 1.0 \
            and args.class_dropout == 0.0:
        # CFG-integrated MeanFlow: the null embedding row must exist
        # (model class_dropout_prob > 0 allocates it); the LOSS owns the
        # actual dropout — the Trainer zeroes its own (trainer.py)
        args.class_dropout = 0.1
    num_classes = args.num_classes if args.num_classes > 0 else None
    ckpt_dir = os.path.join("logs", os.path.split(args.dir)[1])

    factory = DATASET_FACTORIES[dataset]
    fkw = dict(batch_size=args.batch_size)
    if args.data_root:
        fkw["root"] = args.data_root
    if dataset == "synthetic":
        fkw["image_size"] = image_size
        fkw["channels"] = preset.in_channels
        if cond_type == "concat" and not preset.sr_factor:
            fkw["with_cond_image"] = True  # synthetic cloudy view as cond
            # (SR presets derive cond from the image itself instead)
    train_loader, test_loader = factory(**fkw)
    steps_per_epoch = len(train_loader)
    if args.steps_per_epoch:
        steps_per_epoch = min(steps_per_epoch, args.steps_per_epoch)
    data_range = train_loader.dataset.data_range

    # "sum" (RePaint) conditions at sampling time only (model.py:52): the
    # UNet stays unconditional. "concat" feeds the dataset's cond channels in
    # (paired image like SEN12MS-CR cloudy view, or image|mask).
    first = next(iter(train_loader))
    batch0 = _to_model_batch(first, cond_type, sr_factor=preset.sr_factor)
    has_cond = cond_type in ("concat", "spade") and "cond" in batch0
    # latent presets: the concat cond rides the first stage too, so the UNet
    # sees latent_channels of conditioning, not the pixel cond width
    cond_channels = ((preset.latent_channels if preset.is_latent
                      else batch0["cond"].shape[-1]) if has_cond else 0)
    mcfg = preset.model_config(num_classes=num_classes, bf16=not args.no_bf16,
                               cond_channels=cond_channels,
                               class_dropout_prob=args.class_dropout)
    if args.tome_ratio:
        import dataclasses as _dc

        assert preset.backbone == "dit", (
            "--tome_ratio merges transformer tokens (DiT presets only)")
        # the merge/unmerge ops are differentiable and parameter-free, so
        # training under ToMe yields checkpoints identical in structure to
        # (and loadable by) the un-merged config — and vice versa
        mcfg = _dc.replace(mcfg, tome_ratio=args.tome_ratio,
                           tome_mlp=args.tome_mlp)
    model = build_denoiser(mcfg)
    diffusion = build_process(preset, timesteps, image_size, cond_type=cond_type)
    if preset.is_latent:
        diffusion = _latent_first_stage(args, preset, diffusion, train_loader,
                                        ckpt_dir, cond_type)

    # flow presets sample by ODE integration; the DDPM-chain previews don't
    # apply (FlowMatching has no ddpm/ddim/dpm samplers) -- and vice versa:
    # a DDPM-process preset has no .sample ODE integrator, so fail fast
    # instead of crashing at the first periodic preview hours in
    assert not (args.preview_sampler == "flow"
                and preset.process not in ("flow", "edm", "bridge",
                                           "meanflow")), (
        f"--preview_sampler flow requires a flow/edm/bridge/meanflow-process "
        f"preset; {preset.name} trains the DDPM chain (use ddpm/ddim/dpm)")
    # flow/edm/bridge/meanflow processes all expose .sample as their
    # integrator; the Trainer's "flow" preview branch dispatches through it
    preview_sampler = ("flow" if preset.process in ("flow", "edm", "bridge",
                                                    "meanflow")
                       else args.preview_sampler)
    assert not (args.pp_micro and preset.process == "meanflow"), (
        "the 1F1B pipeline loss head needs a training_tuple decomposition; "
        "the MeanFlow loss owns a jax.jvp through the model and has none "
        "(train meanflow presets with DP/FSDP/TP)")
    tcfg = TrainerConfig(
        lr=args.lr, batch_size=args.batch_size, epochs=args.epochs,
        timesteps=timesteps, model_ema_steps=args.model_ema_steps,
        model_ema_decay=args.model_ema_decay, log_freq=args.log_freq,
        n_samples=args.n_samples, no_clip=args.no_clip,
        num_classes=args.num_classes,
        # the Trainer's cond handling is pass-through for both concat and
        # spade (use_cond + preview cond); only the CLI-side cond BUILD
        # differs (_to_model_batch)
        cond_type="concat" if cond_type == "spade" else cond_type,
        ckpt_dir=ckpt_dir,
        sample_dir=args.dir, seed=args.seed, grad_accum=args.grad_accum,
        grad_clip=args.grad_clip, skip_nonfinite=args.skip_nonfinite,
        optimizer=args.optimizer, muon_lr_mult=args.muon_lr_mult,
        preview_sampler=preview_sampler, preview_steps=args.preview_steps,
        fsdp=args.fsdp, tp=args.tp, sp=args.sp, ep=args.ep,
        pp_micro=args.pp_micro,
        pp_virtual=args.pp_virtual,
    )
    if args.sp and args.model_parallel <= 1:
        raise SystemExit(
            "--sp (ring attention) needs --model_parallel > 1: the 'model' "
            "mesh axis is the sequence ring")
    mesh = None
    if args.fsdp or args.tp or args.sp or args.ep or args.model_parallel > 1:
        from eo_diffusion_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(model=args.model_parallel)
        print(f"mesh: {dict(mesh.shape)} (fsdp={args.fsdp}, tp={args.tp}, "
              f"ep={args.ep}, pp_micro={args.pp_micro})")
    trainer = Trainer(tcfg, model, diffusion, steps_per_epoch, mesh=mesh)

    state = trainer.init(jax.random.PRNGKey(args.seed), batch0)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.params))
    print(f"Diffusion with {n_params/1e6} M params")

    ckpt_path = args.ckpt
    if not ckpt_path and args.resume:
        from eo_diffusion_tpu.train.checkpoint import latest_step

        last = latest_step(tcfg.ckpt_dir)
        if last is not None:
            ckpt_path = os.path.join(tcfg.ckpt_dir, f"steps_{last:08d}")
            print(f"auto-resume: found {ckpt_path}")
    if ckpt_path:
        print("Loading checkpoint...")
        state = restore_checkpoint(ckpt_path, state)
        print(f"loaded! resuming from step {int(state.step)}")

    # post-hoc EMA tracks (arXiv:2312.02696; train/posthoc_ema.py): updated
    # every step after the train step (pure jitted tree_map — params never
    # leave the device), snapshotted at the --save_every cadence. On resume
    # the tracks restore from the newest snapshot pair.
    phema = tracks = phema_update = None
    if args.posthoc_ema:
        from eo_diffusion_tpu.train.posthoc_ema import PowerEMA

        phema = PowerEMA(tuple(float(g)
                               for g in args.posthoc_gammas.split(",")))
        phema_dir = os.path.join(tcfg.ckpt_dir, "phema")
        tracks, snap_step = phema.restore_latest(phema_dir, state.params)
        if snap_step >= 0:
            print(f"posthoc-ema: tracks restored from snapshot step {snap_step}")
        phema_update = jax.jit(phema.update)

    run = None
    if args.wandb:
        try:
            import wandb

            run = wandb.init(project="EO-minimal-diffusion")
        except Exception as e:  # offline env: degrade to prints
            print(f"wandb unavailable ({e}); logging to stdout only")

    os.makedirs(args.dir, exist_ok=True)
    os.makedirs(tcfg.ckpt_dir, exist_ok=True)

    best_loss = 0.9  # same initial bar as the reference (train.py:100)
    # resume continues the step counter (and thus the LR schedule/EMA cadence);
    # the reference restarts from 0 and loses both (SURVEY.md §5)
    global_steps = int(state.step)
    y_test = np.full((args.n_samples,), 1) if args.num_classes > 0 else None

    # preemption-safe shutdown (beyond-reference; SURVEY.md §5 names manual
    # --ckpt resume as the reference's only recovery): cloud schedulers
    # deliver SIGTERM with a grace window before reclaiming the host — mark
    # the flag, finish the in-flight step, checkpoint, and exit cleanly so
    # --resume continues from the exact step (opt state, EMA, LR cadence).
    import signal

    preempt = {"sig": None}
    def _graceful(signum, frame):  # noqa: ANN001 (signal API)
        preempt["sig"] = signum
    old_term = signal.signal(signal.SIGTERM, _graceful)

    t_start = time.time()
    # profiler capture window: starts after the first (compile) step, spans
    # args.profile_steps steps, stops exactly once (also on early exit)
    prof = {"on": False, "done": args.profile_dir is None, "count": 0,
            "start_at": global_steps + 1}
    start_epoch = min(global_steps // steps_per_epoch, args.epochs)
    for epoch in range(start_epoch, args.epochs):
        if preempt["sig"] is not None:
            break
        for j, batch in enumerate(train_loader):
            if j >= steps_per_epoch:
                break
            if preempt["sig"] is not None:
                break
            mb = _to_model_batch(batch, cond_type, sr_factor=preset.sr_factor)
            if not prof["done"] and not prof["on"] and global_steps >= prof["start_at"]:
                jax.profiler.start_trace(args.profile_dir)
                prof["on"] = True
            state, metrics = trainer.step(state, mb)
            global_steps += 1
            if tracks is not None:
                tracks = phema_update(tracks, state.params,
                                      jnp.asarray(global_steps - 1))
            loss = float(metrics["loss"])  # host fetch: the step really ran
            if prof["on"]:
                prof["count"] += 1
                if prof["count"] >= args.profile_steps:
                    jax.profiler.stop_trace()
                    prof["on"], prof["done"] = False, True
                    print(f"profiler trace ({prof['count']} steps) -> "
                          f"{args.profile_dir}")
            lr = trainer.current_lr(global_steps - 1)
            if args.log_freq and j % args.log_freq == 0:
                print(
                    "Epoch[{}/{}],Step[{}/{}],loss:{:.5f},lr:{:.5f}".format(
                        epoch + 1, args.epochs, j, steps_per_epoch, loss, lr
                    )
                )
            if run is not None:
                run.log({"loss": loss, "lr": lr})

            if loss < best_loss:
                best_loss = loss
                save_checkpoint(tcfg.ckpt_dir, jax.device_get(state), name="best")

            # sample_every=0 disables periodic previews entirely
            if args.sample_every and global_steps % args.sample_every == 0:
                cond = mb.get("cond")
                cond = cond[: args.n_samples] if cond is not None else None
                # conditioned previews can't exceed the cond rows available
                # from the current micro-batch
                n_prev = (min(args.n_samples, len(cond)) if cond is not None
                          else args.n_samples)
                samples = trainer.sample(
                    state, jax.random.PRNGKey(global_steps),
                    n=n_prev, cond=cond,
                    y=None if y_test is None else np.asarray(y_test)[:n_prev],
                )
                img_path = os.path.join(args.dir, f"steps_{global_steps:08d}.png")
                save_image_grid(np.asarray(samples), img_path,
                                nrow=max(int(math.sqrt(n_prev)), 1), data_range=data_range)
                print(f"saving in {img_path}, epoch {epoch}")
                if run is not None:
                    # wandb sample galleries (reference ddpm.py:502-539 log_images)
                    import wandb

                    run.log({"samples": wandb.Image(img_path)})
                if cond is not None:
                    save_image_grid(np.asarray(cond[..., :3]),
                                    os.path.join(args.dir, f"steps_{global_steps:08d}_cond.png"),
                                    nrow=max(int(math.sqrt(n_prev)), 1), data_range=data_range)
            if args.save_every and global_steps % args.save_every == 0:
                save_checkpoint(tcfg.ckpt_dir, jax.device_get(state), step=global_steps)
                if tracks is not None:
                    phema.save_snapshots(phema_dir, jax.device_get(tracks),
                                         global_steps - 1)

    signal.signal(signal.SIGTERM, old_term)
    if prof["on"]:  # early exit inside the capture window (preempt/short run)
        jax.profiler.stop_trace()
        print(f"profiler trace ({prof['count']} steps, early stop) -> "
              f"{args.profile_dir}")
    save_checkpoint(tcfg.ckpt_dir, jax.device_get(state), step=global_steps)
    if tracks is not None and global_steps > 0:
        phema.save_snapshots(phema_dir, jax.device_get(tracks),
                             global_steps - 1)
    dt = time.time() - t_start
    if preempt["sig"] is not None:
        print(f"preempted (signal {preempt['sig']}): checkpoint saved at "
              f"step {global_steps}; rerun with --resume to continue")
        if run is not None:
            run.finish()
        return
    print(f"done: {global_steps} steps in {dt:.1f}s ({global_steps/max(dt,1e-9):.2f} steps/s)")
    if run is not None:
        run.finish()


class _ImageBatches:
    """Re-iterable image-batch view of a loader (the AE trainer cycles it)."""

    def __init__(self, loader, limit=None):
        self.loader, self.limit = loader, limit

    def __iter__(self):
        for j, b in enumerate(self.loader):
            if self.limit is not None and j >= self.limit:
                return
            yield np.asarray(b["image"], np.float32)


def _latent_first_stage(args, preset, inner, train_loader, ckpt_dir, cond_type):
    """Acquire the first stage (load or train) and wrap the inner diffusion.

    The reference receives its first stage pre-trained from CompVis configs
    (ddpm.py:628-645 ``instantiate_from_config`` + frozen eval); with no
    pretrained VAE available, latent presets train a small ConvAutoencoder
    on the target dataset once and cache it under ``<ckpt_dir>/ae``.
    """
    import jax.numpy as jnp

    from eo_diffusion_tpu.diffusion.latent import LatentDiffusion
    from eo_diffusion_tpu.models.autoencoder import ConvAutoencoder
    from eo_diffusion_tpu.train import ae_trainer as AET

    ae_dir = args.ae_ckpt or os.path.join(ckpt_dir, "ae")
    if AET.ae_exists(ae_dir):
        print(f"loading first stage from {ae_dir}")
        ae_model, ae_params, ae_scale = AET.load_ae(ae_dir)
    else:
        steps = args.ae_steps or preset.ae_steps
        print(f"training first stage: {steps} steps -> {ae_dir}")
        acfg = preset.ae_config()
        ae_model = ConvAutoencoder(acfg)
        ae_params, ae_scale, _ = AET.train_autoencoder(
            ae_model, _ImageBatches(train_loader), jax.random.PRNGKey(args.seed),
            steps=steps, lr=args.ae_lr, log_every=max(steps // 10, 1),
        )
        AET.save_ae(ae_dir, acfg, ae_params, ae_scale)
        print(f"first stage saved (scale_factor {ae_scale:.4f})")
    enc, dec = AET.make_codec(ae_model, ae_params)
    assert cond_type != "sum", (
        "latent presets do not support RePaint-'sum' conditioning: the mask "
        "composite is pixel-space; use cond_type='concat' (encoded cond)"
    )
    return LatentDiffusion(inner, enc, dec, scale_factor=ae_scale,
                           cond_via_encoder=True)


def _to_model_batch(batch, cond_type, sr_factor=0):
    """Build the model batch dict.

    * cond_type="sum": cond = (image | 1-mask) channel-concat like
      inference.py:101,109 -- used at sampling time only.
    * cond_type="concat": cond is either the SR view derived from the image
      itself (``sr_factor`` presets: avg-pool degrade + nearest-upsample,
      data/transforms.sr_cond), the dataset's paired conditioning image
      ("cond_image", e.g. the cloudy SEN12MS-CR view), or (image | mask)
      when only a segmentation is available.
    """
    out = {"image": batch["image"]}
    if cond_type == "sum" and "segmentation" in batch:
        inv_mask = 1.0 - batch["segmentation"]
        out["cond"] = np.concatenate([batch["image"], inv_mask], axis=-1)
    elif cond_type == "spade":
        # the segmap itself IS the conditioning (SPADE norms consume it)
        out["cond"] = batch["segmentation"]
    elif cond_type == "concat":
        if sr_factor:
            from eo_diffusion_tpu.data.transforms import sr_cond

            out["cond"] = sr_cond(np.asarray(batch["image"], np.float32),
                                  sr_factor)
        elif "cond_image" in batch:
            out["cond"] = batch["cond_image"]
        elif "segmentation" in batch:
            out["cond"] = np.concatenate([batch["image"], batch["segmentation"]], axis=-1)
    if "class" in batch:
        out["label"] = batch["class"]
    return out


if __name__ == "__main__":
    args = parse_args()
    if args.cpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    main(args)
