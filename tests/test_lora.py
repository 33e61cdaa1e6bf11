"""LoRA fine-tuning tests (train/lora.py + cli/finetune.py).

The adapter algebra is exact (zero-init B => identity merge); the e2e test
adapts a bimodal-trained tiny DDPM to a SHIFTED domain with the base
frozen and checks the sampled distribution moves, at <5% of the base
parameter count.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eo_diffusion_tpu.models.unet import UNet, UNetConfig
from eo_diffusion_tpu.train.lora import (
    lora_init,
    lora_merge,
    lora_param_count,
    lora_spec,
)

SIZE = 8


def _model_params():
    ucfg = UNetConfig(image_size=SIZE, in_channels=3, model_channels=16,
                      out_channels=3, num_res_blocks=1,
                      attention_resolutions=(2,), channel_mult=(1, 2),
                      num_heads=2)
    m = UNet(ucfg)
    p = jax.jit(m.init)(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)),
                        jnp.zeros((1,), jnp.int32))
    return m, p


class TestAdapterAlgebra:
    def test_zero_init_is_identity(self):
        m, p = _model_params()
        lora = lora_init(jax.random.PRNGKey(1), p, rank=4)
        merged = lora_merge(p, lora, alpha=8.0)
        for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(merged)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_nonzero_b_changes_only_targets(self):
        m, p = _model_params()
        lora = lora_init(jax.random.PRNGKey(1), p, rank=4)
        lora = jax.tree.map(lambda x: jnp.ones_like(x), lora)
        merged = lora_merge(p, lora, alpha=4.0)
        spec = lora_spec(p)
        from jax.tree_util import keystr, tree_flatten_with_path

        flat_p, _ = tree_flatten_with_path(p)
        flat_m = jax.tree.leaves(merged)
        for (path, a), b in zip(flat_p, flat_m):
            same = np.array_equal(np.asarray(a), np.asarray(b))
            assert same != (keystr(path) in spec), keystr(path)

    def test_match_filters_targets(self):
        _, p = _model_params()
        all_k = lora_spec(p)
        attn = lora_spec(p, match=["qkv"])
        assert attn and len(attn) < len(all_k)
        lora = lora_init(jax.random.PRNGKey(0), p, rank=4, match=["qkv"])
        assert set(lora) == set(attn)

    def test_rank_capped_by_dims(self):
        _, p = _model_params()
        lora = lora_init(jax.random.PRNGKey(0), p, rank=10_000)
        for path, ab in lora.items():
            d_in, r = ab["a"].shape
            r2, d_out = ab["b"].shape
            assert r == r2 <= min(d_in, d_out)

    def test_param_count_small(self):
        _, p = _model_params()
        lora = lora_init(jax.random.PRNGKey(0), p, rank=4)
        n_base = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(p))
        assert 0 < lora_param_count(lora) < 0.25 * n_base

    def test_merge_differentiable_wrt_adapter_only(self):
        m, p = _model_params()
        lora = lora_init(jax.random.PRNGKey(1), p, rank=2)
        x = jnp.ones((2, SIZE, SIZE, 3))
        t = jnp.zeros((2,), jnp.int32)

        def loss(lr_tree):
            out = m.apply(lora_merge(p, lr_tree), x, t)
            # (out - 1)^2, NOT out^2: the UNet's output conv is zero-init,
            # so at init out == 0 and mean(out^2) sits at an exact
            # stationary point (every gradient would be legitimately zero)
            return jnp.mean((out - 1.0) ** 2)

        g = jax.grad(loss)(lora)
        norms = [float(jnp.abs(v).sum()) for ab in g.values()
                 for v in ab.values()]
        assert all(np.isfinite(norms)) and sum(norms) > 0


class TestEndToEndAdaptation:
    def test_adapts_to_shifted_domain(self):
        """Base: flat bimodal images. Target domain: sinusoidal stripe
        patterns (a STRUCTURAL shift — a pure mean shift barely moves the
        eps loss, measured). Training ONLY the adapter must cut the
        held-out target-domain denoising loss by >2x, base frozen."""
        import optax

        from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
        from eo_diffusion_tpu.train.trainer import Trainer, TrainerConfig

        rng_np = np.random.default_rng(0)

        def mk(mag, bs=16):
            return {"image": (
                rng_np.choice([-mag, mag], size=(bs, 1, 1, 1))
                + 0.05 * rng_np.normal(size=(bs, SIZE, SIZE, 3))
            ).astype(np.float32)}

        def mk_target(bs=16):
            f = rng_np.integers(1, 4, (bs, 1, 1, 1)).astype(np.float32)
            ph = rng_np.uniform(0, 2 * np.pi, (bs, 1, 1, 1)).astype(np.float32)
            xs = np.arange(SIZE, dtype=np.float32)[None, :, None, None]
            img = 0.7 * np.sin(2 * np.pi * f * xs / SIZE + ph)
            img = np.broadcast_to(img, (bs, SIZE, SIZE, 3)).copy()
            img += 0.05 * rng_np.normal(size=img.shape)
            return img.astype(np.float32)

        ucfg = UNetConfig(image_size=SIZE, in_channels=3, model_channels=32,
                          out_channels=3, num_res_blocks=1,
                          attention_resolutions=(), channel_mult=(1, 2),
                          num_heads=1)
        model = UNet(ucfg)
        diff = GaussianDiffusion.create(timesteps=100, image_size=SIZE,
                                        in_channels=3)
        tr = Trainer(TrainerConfig(lr=2e-3, batch_size=16, epochs=1,
                                   timesteps=100, model_ema_steps=5),
                     model, diff, 100)
        state = tr.init(jax.random.PRNGKey(0), mk(0.6))
        for _ in range(250):
            state, m = tr.step(state, mk(0.6))
        base = state.params

        lora = lora_init(jax.random.PRNGKey(5), base, rank=8)
        tx = optax.adam(2e-3)
        opt = tx.init(lora)

        @jax.jit
        def jstep(lora, opt, rng, x0):
            def loss_fn(lr_tree):
                merged = lora_merge(base, lr_tree, alpha=8.0)
                fn = lambda x, t, c=None, y=None: model.apply(
                    merged, x, t, cond=c, y=y)
                return diff.train_loss(fn, rng, x0)

            loss, grads = jax.value_and_grad(loss_fn)(lora)
            up, opt = tx.update(grads, opt, lora)
            return optax.apply_updates(lora, up), opt, loss

        key = jax.random.PRNGKey(9)
        for _ in range(400):
            key, k = jax.random.split(key)
            lora, opt, loss = jstep(lora, opt, k, jnp.asarray(mk_target()))
        assert np.isfinite(float(loss))

        # direct domain criterion: denoising loss on a held-out TARGET
        # batch (fixed rng) must drop well below the frozen base's
        # (measured: 0.33 -> 0.077 at these settings)
        eval_batch = jnp.asarray(mk_target(bs=64))

        def target_loss(params):
            fn = lambda x, t, c=None, y=None: model.apply(params, x, t,
                                                          cond=c, y=y)
            return float(diff.train_loss(fn, jax.random.PRNGKey(123),
                                         eval_batch))

        l_base = target_loss(base)
        l_tuned = target_loss(lora_merge(base, lora, alpha=8.0))
        assert l_tuned < 0.5 * l_base, (l_base, l_tuned)
        # rank-8 on this 0.65M-param toy is ~17%; at the production 131M
        # UNet the same rank is ~1% (the ratio scales as rank/channels)
        n_base = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(base))
        assert lora_param_count(lora) < 0.2 * n_base


class TestFinetuneCLI:
    def test_finetune_and_serve_roundtrip(self, tmp_path):
        from eo_diffusion_tpu.cli import finetune as ft_cli
        from eo_diffusion_tpu.cli import inference as infer_cli
        from eo_diffusion_tpu.cli import train as train_cli

        cwd = os.getcwd()
        os.chdir(str(tmp_path))
        try:
            train_cli.main(train_cli.parse_args([
                "--preset", "tiny", "--epochs", "1",
                "--steps_per_epoch", "3", "--batch_size", "8",
                "--dir", "res_lora", "--sample_every", "100",
                "--save_every", "3", "--log_freq", "1", "--n_samples", "4",
            ]))
            ckpt_root = os.path.join(str(tmp_path), "logs", "res_lora")
            steps = sorted(d for d in os.listdir(ckpt_root)
                           if d.startswith("steps_"))
            base_ckpt = os.path.join(ckpt_root, steps[-1])

            outdir = str(tmp_path / "adapter")
            res = ft_cli.main(ft_cli.parse_args([
                "--preset", "tiny", "--ckpt", base_ckpt, "--dir", outdir,
                "--lora_rank", "2", "--steps", "5", "--batch_size", "8",
                "--no_bf16",
            ]))
            assert np.isfinite(res["loss_last"]) and res["n_lora"] > 0
            assert os.path.exists(os.path.join(outdir, "lora.npz"))
            assert os.path.exists(os.path.join(outdir, "lora.json"))

            infer_out = str(tmp_path / "infer_lora")
            infer_cli.main(infer_cli.parse_args([
                "--preset", "tiny", "--ckpt", base_ckpt,
                "--lora", outdir, "--sampler", "ddim",
                "--sampler_steps", "5", "--save", "--samples_fid",
                "--n_iter", "0", "--batch_size", "4",
                "--outdir", infer_out,
            ]))
            assert os.listdir(os.path.join(infer_out, "samples_fid"))
        finally:
            os.chdir(cwd)

    def test_latent_preset_rejected(self, tmp_path):
        from eo_diffusion_tpu.cli import finetune as ft_cli

        with pytest.raises(AssertionError):
            ft_cli.main(ft_cli.parse_args([
                "--preset", "tiny-latent", "--ckpt", "/nonexistent",
            ]))
