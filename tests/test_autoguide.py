"""Autoguidance (diffusion/autoguide.py, arXiv:2406.02507).

Combine math, sampler composition (wrapper slots in front of any sampler),
and the CLI path that synthesizes the degraded model from post-hoc EMA
snapshots (the feature pairing the module exists for)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eo_diffusion_tpu.diffusion.autoguide import autoguided_model_fn
from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion

SIZE, CH = 8, 3


class TestCombine:
    def test_extrapolation_math(self):
        fn_m = lambda x, t, c, y: jnp.full_like(x, 3.0)
        fn_b = lambda x, t, c, y: jnp.full_like(x, 1.0)
        fn = autoguided_model_fn(fn_m, fn_b, 2.0)
        x = jnp.zeros((2, SIZE, SIZE, CH))
        t = jnp.zeros((2,), jnp.int32)
        np.testing.assert_allclose(np.asarray(fn(x, t)), 5.0)  # 1 + 2*(3-1)

    def test_scale_one_is_main_model(self):
        fn_m = lambda x, t, c, y: 0.3 * x
        fn_b = lambda x, t, c, y: 9.0 * x  # never consulted at w=1
        fn = autoguided_model_fn(fn_m, fn_b, 1.0)
        x = jnp.ones((1, SIZE, SIZE, CH))
        t = jnp.zeros((1,), jnp.int32)
        np.testing.assert_allclose(np.asarray(fn(x, t)), 0.3, rtol=1e-6)

    def test_interval_gates_to_main(self):
        fn_m = lambda x, t, c, y: jnp.full_like(x, 3.0)
        fn_b = lambda x, t, c, y: jnp.full_like(x, 1.0)
        fn = autoguided_model_fn(fn_m, fn_b, 2.0,
                                 guidance_interval=(0.4, 0.6), timesteps=100)
        x = jnp.zeros((1, SIZE, SIZE, CH))
        inside = fn(x, jnp.full((1,), 50, jnp.int32))
        outside = fn(x, jnp.full((1,), 90, jnp.int32))
        np.testing.assert_allclose(np.asarray(inside), 5.0)
        np.testing.assert_allclose(np.asarray(outside), 3.0)  # w -> 1

    def test_noise_frac_fn_overrides_ddpm_normalization(self):
        """EDM/flow presets pass model-facing t that is NOT a chain index;
        the process-aware noise_frac_fn must drive the interval gate."""
        fn_m = lambda x, t, c, y: jnp.full_like(x, 3.0)
        fn_b = lambda x, t, c, y: jnp.full_like(x, 1.0)
        # EDM-style model t: ln(sigma)/4 * 250, sigma_max = 80
        nf = lambda t: jnp.exp(4.0 * t[0] / 250.0) / 80.0
        fn = autoguided_model_fn(fn_m, fn_b, 2.0,
                                 guidance_interval=(0.4, 0.6),
                                 noise_frac_fn=nf)
        x = jnp.zeros((1, SIZE, SIZE, CH))
        t_inside = jnp.full((1,), np.log(40.0) / 4.0 * 250.0)   # sigma=40
        t_outside = jnp.full((1,), np.log(0.5) / 4.0 * 250.0)   # sigma=0.5
        np.testing.assert_allclose(np.asarray(fn(x, t_inside)), 5.0)
        np.testing.assert_allclose(np.asarray(fn(x, t_outside)), 3.0)
        # the default normalization would have mis-gated both: t/(T-1) is
        # negative for sigma<1 and >1 for sigma=40's scaled log-time
        assert float(t_outside[0]) < 0.0

    def test_scale_below_one_rejected(self):
        with pytest.raises(AssertionError):
            autoguided_model_fn(lambda *a: None, lambda *a: None, 0.5)


class TestSamplerComposition:
    def test_changes_trajectory_on_every_sampler(self):
        d = GaussianDiffusion.create(timesteps=100, image_size=SIZE,
                                     in_channels=CH)
        fn_m = lambda x, t, c, y: 0.10 * x
        fn_b = lambda x, t, c, y: 0.25 * x
        guided = autoguided_model_fn(fn_m, fn_b, 2.0)
        rng = jax.random.PRNGKey(0)
        for sample in (lambda f: d.ddim_sample(f, rng, 2, num_steps=5),
                       lambda f: d.dpm_sample(f, rng, 2, num_steps=5),
                       lambda f: d.unipc_sample(f, rng, 2, num_steps=5)):
            a = np.asarray(sample(fn_m).x)
            b = np.asarray(sample(guided).x)
            assert np.isfinite(b).all()
            assert np.abs(a - b).max() > 1e-6


class TestAutoguideCLI:
    def test_phema_synthesized_bad_model(self, tmp_path):
        """--autoguide_scale + --autoguide_sigma_rel: train with
        --posthoc_ema, then sample autoguided against the synthesized
        short-EMA variant."""
        from eo_diffusion_tpu.cli import inference as infer_cli
        from eo_diffusion_tpu.cli import train as train_cli

        samples = str(tmp_path / "results")
        cwd = os.getcwd()
        os.chdir(str(tmp_path))
        try:
            train_cli.main(train_cli.parse_args([
                "--preset", "tiny", "--epochs", "1", "--steps_per_epoch",
                "4", "--batch_size", "8", "--lr", "2e-3", "--dir", samples,
                "--sample_every", "0", "--save_every", "4", "--log_freq",
                "1", "--n_samples", "4", "--posthoc_ema",
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
            "--autoguide_scale", "2.0", "--autoguide_sigma_rel", "0.03",
        ]))
        assert os.listdir(os.path.join(outdir, "samples_fid"))

    def test_cfg_conflict_rejected(self):
        from eo_diffusion_tpu.cli import inference as infer_cli

        args = infer_cli.parse_args([
            "--preset", "tiny", "--ckpt", "/nonexistent", "--n_iter", "0",
            "--autoguide_scale", "2.0", "--guidance_scale", "2.0",
        ])
        with pytest.raises((AssertionError, FileNotFoundError)):
            infer_cli.main(args)
