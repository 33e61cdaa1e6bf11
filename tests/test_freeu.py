"""FreeU (models/unet.py UNetConfig.freeu, arXiv:2309.11497).

Training-free decoder re-weighting: pins the Fourier-filter semantics,
the off-by-default exact-parity contract (the reference-parity tests rely
on freeu=None being bit-identical), checkpoint compatibility, and the CLI
flag path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eo_diffusion_tpu.models.unet import UNet, UNetConfig, _freeu_pair


def tiny_cfg(**kw):
    return UNetConfig(image_size=16, in_channels=3, model_channels=16,
                      out_channels=3, num_res_blocks=1,
                      attention_resolutions=(), channel_mult=(1, 2),
                      num_heads=2, **kw)


def perturbed_params(model, x, t, seed=5):
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t)
    leaves, td = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    return jax.tree.unflatten(td, [
        l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
        for l, k in zip(leaves, keys)])


class TestFourierPair:
    def test_backbone_half_channel_scaling(self):
        h = jnp.ones((1, 8, 8, 4))
        skip = jnp.zeros((1, 8, 8, 4))
        h2, _ = _freeu_pair(h, skip, 2.0, 1.0)
        np.testing.assert_allclose(np.asarray(h2[..., :2]), 2.0)
        np.testing.assert_allclose(np.asarray(h2[..., 2:]), 1.0)

    def test_skip_low_freq_scaled_high_freq_kept(self):
        # constant image = pure DC -> scaled by s exactly; Nyquist
        # checkerboard = pure high frequency -> untouched
        const = jnp.full((1, 8, 8, 1), 3.0)
        _, out = _freeu_pair(jnp.zeros((1, 8, 8, 2)), const, 1.0, 0.25)
        np.testing.assert_allclose(np.asarray(out), 0.75, atol=1e-5)

        yy, xx = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
        checker = jnp.asarray(((-1.0) ** (yy + xx))[None, :, :, None])
        _, out = _freeu_pair(jnp.zeros((1, 8, 8, 2)), checker, 1.0, 0.25)
        np.testing.assert_allclose(np.asarray(out), np.asarray(checker),
                                   atol=1e-5)


class TestUNetIntegration:
    def test_none_is_bit_identical(self):
        model = UNet(tiny_cfg())
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
        t = jnp.full((2,), 7, jnp.int32)
        params = perturbed_params(model, x, t)
        a = np.asarray(model.apply(params, x, t))
        b = np.asarray(UNet(tiny_cfg(freeu=None)).apply(params, x, t))
        np.testing.assert_array_equal(a, b)

    def test_checkpoint_compatible_and_changes_output(self):
        base = UNet(tiny_cfg())
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3))
        t = jnp.full((2,), 7, jnp.int32)
        params = perturbed_params(base, x, t)
        plain = np.asarray(base.apply(params, x, t))
        freeu = UNet(tiny_cfg(freeu=(1.3, 1.4, 0.9, 0.4)))
        out = np.asarray(freeu.apply(params, x, t))  # same param tree
        assert np.isfinite(out).all()
        assert np.abs(out - plain).max() > 1e-7
        # neutral factors reproduce the plain forward (up to f32 fft noise)
        neutral = np.asarray(UNet(tiny_cfg(freeu=(1.0, 1.0, 1.0, 1.0))
                                  ).apply(params, x, t))
        np.testing.assert_allclose(neutral, plain, atol=1e-4)


class TestFreeUCLI:
    def test_flag_rejected_on_dit_preset(self):
        from eo_diffusion_tpu.cli import inference as infer_cli

        args = infer_cli.parse_args([
            "--preset", "tiny-dit", "--ckpt", "/nonexistent", "--freeu",
            "1.2,1.3,0.9,0.4", "--n_iter", "0", "--batch_size", "2",
        ])
        with pytest.raises(AssertionError, match="UNet"):
            infer_cli.main(args)

    def test_sampling_roundtrip(self, tmp_path):
        import os

        from eo_diffusion_tpu.cli import inference as infer_cli
        from eo_diffusion_tpu.cli import train as train_cli

        samples = str(tmp_path / "results")
        cwd = os.getcwd()
        os.chdir(str(tmp_path))
        try:
            train_cli.main(train_cli.parse_args([
                "--preset", "tiny", "--epochs", "1", "--steps_per_epoch",
                "3", "--batch_size", "8", "--lr", "2e-3", "--dir", samples,
                "--sample_every", "0", "--save_every", "3", "--log_freq",
                "1", "--n_samples", "4",
            ]))
        finally:
            os.chdir(cwd)
        ckpt_root = os.path.join(str(tmp_path), "logs",
                                 os.path.basename(samples))
        step_dirs = sorted(d for d in os.listdir(ckpt_root)
                           if d.startswith("steps_"))
        outdir = str(tmp_path / "infer")
        infer_cli.main(infer_cli.parse_args([
            "--preset", "tiny", "--ckpt",
            os.path.join(ckpt_root, step_dirs[-1]), "--sampler", "ddim",
            "--sampler_steps", "4", "--samples_fid", "--n_iter", "0",
            "--batch_size", "4", "--outdir", outdir,
            "--freeu", "1.2,1.3,0.9,0.4",
        ]))
        assert os.listdir(os.path.join(outdir, "samples_fid"))
