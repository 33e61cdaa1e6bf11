"""Modern-stack demo: DiT transformer denoiser + rectified flow.

The two beyond-reference axes composed (models/dit.py, diffusion/flow.py):
train a small DiT with the flow-matching objective on synthetic EO tiles
and sample with a handful of Heun ODE steps — the SD3/Flux-style recipe on
this framework's TPU stack. With ``--steps 0`` it runs a pure sampling
smoke on random weights.

Usage:
    # quick CPU smoke (tiny model, a few train steps, Heun-8 samples):
    python examples/modern_stack_demo.py --smoke
    # a real small run (chip recommended):
    python examples/modern_stack_demo.py --steps 3000 --out results/modern
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--batch_size", type=int, default=64)
    ap.add_argument("--sample_steps", type=int, default=8)
    ap.add_argument("--out", type=str, default="results/modern_stack_demo")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny config + 20 train steps (CPU-runnable)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from eo_diffusion_tpu.data.datasets import SyntheticEO
    from eo_diffusion_tpu.diffusion.flow import FlowMatching
    from eo_diffusion_tpu.models.dit import DiT, DiTConfig, dit_s
    from eo_diffusion_tpu.train.trainer import TrainState, make_train_step
    from eo_diffusion_tpu.utils.images import save_image_grid

    if args.smoke:
        args.size, args.batch_size, args.steps = 16, 16, 20
        cfg = DiTConfig(image_size=16, in_channels=3, out_channels=3,
                        patch_size=4, hidden_size=64, depth=2, num_heads=4)
    else:
        cfg = dit_s(args.size, dtype=jnp.bfloat16)
    model = DiT(cfg)
    fm = FlowMatching.create(image_size=args.size, in_channels=3)

    ds = SyntheticEO(size=args.size, length=512, data_range=(-1.0, 1.0), seed=0)
    imgs = np.stack([ds[i]["image"] for i in range(512)])

    tx = optax.adamw(optax.warmup_cosine_decay_schedule(
        0.0, 1e-3, min(500, args.steps // 2 + 1), max(args.steps, 1), 1e-5))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, args.size, args.size, 3)),
        jnp.zeros((1,), jnp.int32))
    print(f"DiT: {sum(p.size for p in jax.tree.leaves(params))/1e6:.1f} M params")
    state = TrainState.create(params, tx)
    apply_fn = (lambda p, x, t, cond=None, y=None, train=False,
                dropout_rng=None: model.apply(p, x, t, cond=cond, y=y))
    step = jax.jit(make_train_step(fm, apply_fn, tx, ema_decay=0.999,
                                   ema_every=10), donate_argnums=(0,))

    rng = np.random.default_rng(1)
    key = jax.random.PRNGKey(1)
    for i in range(args.steps):
        idx = rng.integers(0, len(imgs), args.batch_size)
        key, skey = jax.random.split(key)
        state, m = step(state, {"image": jnp.asarray(imgs[idx])}, skey)
        if i % max(args.steps // 10, 1) == 0:
            print(f"step {i}/{args.steps} loss={float(m['loss']):.4f}")

    os.makedirs(args.out, exist_ok=True)
    fn = lambda x, t, c, y: model.apply(state.ema_params, x, t, cond=c, y=y)
    out = jax.jit(lambda r: fm.sample(
        fn, r, 16, num_steps=args.sample_steps, method="heun").x)(
        jax.random.PRNGKey(7))
    grid = np.clip((np.asarray(out, np.float32) + 1) / 2, 0, 1)
    path = os.path.join(args.out, f"samples_heun{args.sample_steps}.png")
    save_image_grid(grid, path, nrow=4)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
