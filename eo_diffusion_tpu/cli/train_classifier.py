"""Noisy-image classifier training for classifier-guided sampling.

``python -m eo_diffusion_tpu.cli.train_classifier --preset synthetic64 \\
      --steps 2000 --dir results/classifier``

Trains the :class:`~eo_diffusion_tpu.models.encoder_unet.EncoderUNet`
(the reference's vendored ``EncoderUNetModel``, backbones/unet.py:845+,
which it never trains) on q-sampled noisy images across the preset's whole
timestep range — the Dhariwal & Nichol 2021 recipe: the classifier must
read x_t at EVERY noise level because sampling queries its gradient along
the whole reverse trajectory. Serve with ``cli/inference.py
--classifier_ckpt <dir> --classifier_scale s`` (wraps the denoiser with
``diffusion/classifier_guidance.classifier_guided``).

TPU shape: one jitted train step (t drawn inside the step, loss in f32),
one jitted eval program per noise level; the model tree is threaded as a
jit argument everywhere.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Noisy-image classifier training")
    p.add_argument("--preset", type=str, default="synthetic64",
                   help="preset supplying image grid + diffusion schedule "
                        "(the classifier must match the model it will guide)")
    p.add_argument("--dir", type=str, default="results/classifier")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--batch_size", type=int, default=None)
    p.add_argument("--num_classes", type=int, default=None,
                   help="label vocabulary (default: dataset metadata, or 5 "
                        "for the synthetic fixture)")
    p.add_argument("--class_correlated", action="store_true",
                   help="synthetic dataset: correlate image content with "
                        "the label (the CFG-capstone fixture) so the "
                        "classifier has real signal")
    p.add_argument("--eval_n", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true")
    return p.parse_args(argv)


def build_classifier(preset, num_classes):
    """EncoderUNet sized like the preset's denoiser torso."""
    from eo_diffusion_tpu.models.encoder_unet import (EncoderUNet,
                                                      EncoderUNetConfig)

    assert not preset.is_latent, (
        "the classifier reads pixels (guidance runs in the sampler's "
        "space); latent-space guidance is not wired")
    return EncoderUNet(EncoderUNetConfig(
        image_size=preset.image_size,
        in_channels=preset.in_channels,
        model_channels=preset.base_dim,
        num_classes=num_classes,
        num_res_blocks=max(preset.num_res_blocks, 1),
        attention_resolutions=preset.attention_resolutions,
        channel_mult=preset.dim_mults or (1, 2),
        num_heads=max(preset.num_heads, 1),
    ))


def _synthetic_loaders(preset, batch_size, class_correlated, seed):
    from eo_diffusion_tpu.data.datasets import SyntheticEO, train_val_split
    from eo_diffusion_tpu.data.loader import DataLoader

    ds = SyntheticEO(size=preset.image_size, length=1024,
                     channels=preset.in_channels, num_classes=5,
                     class_correlated=class_correlated,
                     data_range=(-1.0, 1.0), seed=seed)
    tr, te = train_val_split(ds, 0.15, 4097)
    return (DataLoader(tr, batch_size, shuffle=True, seed=seed),
            DataLoader(te, batch_size, shuffle=False, drop_last=False))


def main(args):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from eo_diffusion_tpu.cli.presets import get_preset
    from eo_diffusion_tpu.data.datasets import get_metadata
    from eo_diffusion_tpu.data.factories import DATASET_FACTORIES
    from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
    from eo_diffusion_tpu.train.checkpoint import save_checkpoint
    from eo_diffusion_tpu.train.trainer import TrainState

    preset = get_preset(args.preset)
    assert preset.process == "ddpm", (
        f"classifier guidance steers the DDPM chain; preset {preset.name} "
        f"trains {preset.process}")
    batch_size = args.batch_size or preset.batch_size
    if args.num_classes:
        num_classes = args.num_classes
    elif preset.dataset == "synthetic":
        num_classes = 5
    else:
        num_classes = get_metadata(preset.dataset)["num_classes"]

    if preset.dataset == "synthetic":
        train_loader, test_loader = _synthetic_loaders(
            preset, batch_size, args.class_correlated, args.seed)
    else:
        train_loader, test_loader = DATASET_FACTORIES[preset.dataset](
            batch_size=batch_size)

    diffusion = GaussianDiffusion.create(
        timesteps=preset.timesteps, image_size=preset.image_size,
        in_channels=preset.in_channels)
    model = build_classifier(preset, num_classes)

    rng = jax.random.PRNGKey(args.seed)
    x0 = jnp.zeros((1, preset.image_size, preset.image_size,
                    preset.in_channels), jnp.float32)
    params = jax.jit(model.init)(rng, x0, jnp.zeros((1,), jnp.int32))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"classifier with {n_params/1e6:.2f} M params, "
          f"{num_classes} classes")

    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, max(args.steps // 20, 1), args.steps, args.lr * 0.01)
    tx = optax.adamw(sched)
    state = TrainState.create(params, tx)
    T = diffusion.timesteps

    def loss_fn(p, x, y, t):
        logits = model.apply(p, x, t)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.mean(jnp.take_along_axis(logp, y[:, None], axis=1))
        acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
        return nll, acc

    def step(state, x, y, rng):
        t_rng, n_rng = jax.random.split(rng)
        t = jax.random.randint(t_rng, (x.shape[0],), 0, T)
        eps = jax.random.normal(n_rng, x.shape, jnp.float32)
        x_t = diffusion.q_sample(x.astype(jnp.float32), t, eps)
        (loss, acc), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, x_t, y, t)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        state = state.replace(params=new_params, ema_params=new_params,
                              opt_state=opt_state, step=state.step + 1)
        return state, loss, acc

    jstep = jax.jit(step, donate_argnums=(0,))
    it = iter(train_loader)
    t0 = time.time()
    loss = acc = None
    for i in range(args.steps):
        try:
            batch = next(it)
        except StopIteration:
            it = iter(train_loader)
            batch = next(it)
        rng, srng = jax.random.split(rng)
        state, l, a = jstep(state, jnp.asarray(batch["image"], jnp.float32),
                            jnp.asarray(batch["class"], jnp.int32), srng)
        if (i + 1) % max(args.steps // 10, 1) == 0:
            loss, acc = float(l), float(a)
            print(f"step {i+1}/{args.steps} loss={loss:.4f} "
                  f"acc={acc:.3f} "
                  f"({(time.time()-t0)/(i+1)*1e3:.0f} ms/step)")

    # accuracy at three noise levels on held-out data (guidance quality is
    # set by mid-trajectory accuracy, not clean accuracy)
    jeval = jax.jit(lambda p, x, y, t, eps: loss_fn(
        p, diffusion.q_sample(x, t, eps), y, t)[1])
    levels = {"t0": 0, "t_mid": T // 2, "t_hi": int(T * 0.8)}
    xs, ys = [], []
    for batch in test_loader:
        xs.append(np.asarray(batch["image"], np.float32))
        ys.append(np.asarray(batch["class"], np.int32))
        if sum(len(b) for b in xs) >= args.eval_n:
            break
    x_ev = jnp.asarray(np.concatenate(xs)[: args.eval_n])
    y_ev = jnp.asarray(np.concatenate(ys)[: args.eval_n])
    eval_acc = {}
    for name, tv in levels.items():
        t = jnp.full((x_ev.shape[0],), tv, jnp.int32)
        eps = jax.random.normal(jax.random.PRNGKey(7), x_ev.shape,
                                jnp.float32)
        eval_acc[name] = float(jeval(state.params, x_ev, y_ev, t, eps))
    print("eval accuracy:", json.dumps(eval_acc))

    os.makedirs(args.dir, exist_ok=True)
    ckpt_path = save_checkpoint(os.path.abspath(args.dir),
                                jax.device_get(state), name="classifier")
    meta = {"preset": preset.name, "num_classes": num_classes,
            "steps": args.steps, "final_loss": loss, "final_acc": acc,
            "eval_acc": eval_acc}
    with open(os.path.join(args.dir, "classifier.json"), "w") as f:
        json.dump(meta, f, indent=2)
    print(f"classifier checkpoint: {ckpt_path}")
    return meta


if __name__ == "__main__":
    args = parse_args()
    if args.cpu:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    main(args)
