"""EDM process (diffusion/edm.py): preconditioning identities, oracle
sampling, training, CFG/inpainting surface, CLI round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eo_diffusion_tpu.diffusion.edm import EDMProcess, karras_sigmas

SIZE = 8


def _proc(**kw):
    return EDMProcess.create(image_size=SIZE, in_channels=3, **kw)


class TestPreconditioning:
    def test_weight_times_cout_sq_is_one(self):
        """lambda(sigma) * c_out(sigma)^2 == 1 — the identity that makes the
        EDM loss a plain MSE on the raw network output (module docstring)."""
        p = _proc()
        sigma = jnp.exp(jnp.linspace(np.log(1e-3), np.log(100.0), 64))
        _, _, c_out, _ = p._coeffs(sigma)
        lam = (sigma**2 + p.sigma_data**2) / (sigma * p.sigma_data) ** 2
        np.testing.assert_allclose(np.asarray(lam * c_out**2), 1.0, rtol=1e-5)

    def test_coeff_limits(self):
        """sigma->0: D ~ x (c_skip->1, c_out->0); sigma->inf: c_skip->0 and
        c_in*sigma->1 (the model sees unit-variance input at every level)."""
        p = _proc()
        c_skip, c_in, c_out, _ = p._coeffs(jnp.asarray([1e-6, 1e6]))
        assert abs(float(c_skip[0]) - 1.0) < 1e-4
        assert float(c_out[0]) < 1e-5
        assert float(c_skip[1]) < 1e-4
        assert abs(float(c_in[1]) * 1e6 - 1.0) < 1e-4

    def test_model_input_unit_variance(self):
        """c_in normalizes x_t to ~unit variance for unit-variance-ish data
        at every sigma (the point of input preconditioning)."""
        p = EDMProcess.create(image_size=SIZE, in_channels=3, sigma_data=1.0)
        rng = jax.random.PRNGKey(0)
        x0 = jax.random.normal(rng, (512, SIZE, SIZE, 3))
        x_in, _, _ = p.training_tuple(jax.random.PRNGKey(1), x0)
        std = float(jnp.std(x_in))
        assert 0.8 < std < 1.2, std


class TestKarrasGrid:
    def test_grid_shape_and_endpoints(self):
        s = karras_sigmas(18, 0.002, 80.0, 7.0)
        assert s.shape == (19,)
        np.testing.assert_allclose(float(s[0]), 80.0, rtol=1e-5)
        np.testing.assert_allclose(float(s[17]), 0.002, rtol=1e-4)
        assert float(s[18]) == 0.0
        assert np.all(np.diff(np.asarray(s)) < 0)


class TestOracleSampling:
    def test_delta_data_oracle_converges(self):
        """With data = a single point x*, the ideal denoiser is D == x*;
        the corresponding raw network is F = (x* - c_skip x)/c_out. Both
        integrators must drive any x_T to x*."""
        p = _proc()
        x_star = jnp.full((1, SIZE, SIZE, 3), 0.37)

        def oracle(x, t, c, y):
            sigma = jnp.exp(4.0 * t / p.time_scale)
            c_skip, c_in, c_out, _ = p._coeffs(sigma)
            cb = lambda v: v[:, None, None, None]
            # x arrives preconditioned: x_model = c_in * x_t
            x_t = x / cb(c_in)
            return (x_star - cb(c_skip) * x_t) / cb(c_out)

        for method, steps, tol in (("heun", 12, 1e-2), ("euler", 40, 5e-2)):
            out = p.sample(oracle, jax.random.PRNGKey(0), 2, num_steps=steps,
                           method=method).x
            np.testing.assert_allclose(np.asarray(out),
                                       np.broadcast_to(np.asarray(x_star),
                                                       (2, SIZE, SIZE, 3)),
                                       atol=tol)

    def test_heun_beats_euler_at_matched_steps(self):
        """With the PERFECT delta-data denoiser the probability-flow ODE is
        x(sigma) = x* + (sigma/sigma0)(x0 - x*) and Euler is exact, so the
        order comparison needs curvature: a denoiser with sigma-dependent
        shrinkage makes d(x)/dsigma time-varying. Heun at 10 steps must land
        closer to a 400-step Euler ground truth than Euler at 10 steps.
        (At <=6 steps Heun's trial extrapolation overshoots on the huge
        first Karras intervals — measured here: 0.41 vs Euler 0.28 at 6
        steps, 0.015 vs 0.058 at 10 — which is why the EDM paper operates
        at N >= 10.)"""
        p = _proc()
        x_star = jnp.full((1, SIZE, SIZE, 3), 0.37)

        def bent(x, t, c, y):
            sigma = jnp.exp(4.0 * t / p.time_scale)
            c_skip, c_in, c_out, _ = p._coeffs(sigma)
            cb = lambda v: v[:, None, None, None]
            x_t = x / cb(c_in)
            shrink = 0.6 + 0.4 * jnp.tanh(sigma)  # sigma-dependent pull
            d = x_star + cb(shrink) * 0.3 * (x_t - x_star)
            return (d - cb(c_skip) * x_t) / cb(c_out)

        k = jax.random.PRNGKey(3)
        truth = p.sample(bent, k, 1, num_steps=400, method="euler").x
        err = {m: float(jnp.abs(p.sample(bent, k, 1, num_steps=10,
                                         method=m).x - truth).max())
               for m in ("euler", "heun")}
        assert err["heun"] < err["euler"], err


class TestTraining:
    def test_train_loss_finite_and_learns(self):
        """A linear model F = W*x trained by SGD on delta data must reduce
        the EDM loss (sanity that the objective is learnable as plain MSE)."""
        p = _proc()
        x0 = jnp.full((16, SIZE, SIZE, 3), 0.5)

        def model_fn_w(w):
            return lambda x, t, c, y: w * x

        def loss_w(w, rng):
            return p.train_loss(model_fn_w(w), rng, x0)

        w = jnp.asarray(0.0)
        l0 = float(loss_w(w, jax.random.PRNGKey(0)))
        g = jax.grad(loss_w)(w, jax.random.PRNGKey(0))
        w = w - 0.1 * g
        l1 = float(loss_w(w, jax.random.PRNGKey(0)))
        assert np.isfinite([l0, l1]).all() and l1 < l0

    def test_training_tuple_decomposition(self):
        """train_loss == mean((model(training_tuple inputs) - target)^2)
        for the same rng — the contract the 1F1B loss head relies on."""
        p = _proc()
        x0 = jax.random.normal(jax.random.PRNGKey(0), (8, SIZE, SIZE, 3))
        model = lambda x, t, c, y: 0.3 * x
        rng = jax.random.PRNGKey(5)
        x_in, t_model, target = p.training_tuple(rng, x0)
        manual = float(jnp.mean((model(x_in, t_model, None, None) - target) ** 2))
        fused = float(p.train_loss(model, rng, x0))
        np.testing.assert_allclose(manual, fused, rtol=1e-6)


class TestSamplerSurface:
    def test_cfg_guidance_shifts_output(self):
        p = _proc()

        def model(x, t, c, y):
            return jnp.where(y[:, None, None, None] > 0, 0.5, -0.5) * jnp.ones_like(x)

        k = jax.random.PRNGKey(0)
        y = jnp.ones((2,), jnp.int32)
        y0 = jnp.zeros((2,), jnp.int32)
        base = p.sample(model, k, 2, num_steps=4, y=y).x
        guided = p.sample(model, k, 2, num_steps=4, y=y, y_uncond=y0,
                          guidance_scale=3.0).x
        assert float(jnp.abs(guided - base).max()) > 1e-3

    def test_churn_changes_trajectory_finite(self):
        p = _proc()
        model = lambda x, t, c, y: 0.1 * x
        k = jax.random.PRNGKey(0)
        det = p.sample(model, k, 2, num_steps=8).x
        sto = p.sample(model, k, 2, num_steps=8, s_churn=10.0,
                       s_tmin=0.0, s_tmax=100.0).x
        assert np.isfinite(np.asarray(sto)).all()
        assert float(jnp.abs(det - sto).max()) > 1e-4

    def test_inpainting_keeps_known_region(self):
        p = _proc()
        model = lambda x, t, c, y: jnp.zeros_like(x)
        known = jnp.full((2, SIZE, SIZE, 3), 0.7)
        mask = jnp.zeros((2, SIZE, SIZE, 1)).at[:, :4].set(1.0)
        out = p.sample(model, jax.random.PRNGKey(0), 2, num_steps=4,
                       mask=mask, x0=known).x
        np.testing.assert_allclose(np.asarray(out[:, :4]), 0.7, atol=1e-6)
        with pytest.raises(AssertionError, match="x0"):
            p.sample(model, jax.random.PRNGKey(0), 2, num_steps=4, mask=mask)

    def test_log_every_streams_frames(self):
        p = _proc()
        model = lambda x, t, c, y: 0.1 * x
        out = p.sample(model, jax.random.PRNGKey(0), 1, num_steps=8,
                       log_every=4)
        assert out.intermediates.shape[0] == 2


class TestEDMCLI:
    def test_train_infer_roundtrip(self, tmp_path):
        import os

        from eo_diffusion_tpu.cli import inference as infer_cli
        from eo_diffusion_tpu.cli import train as train_cli

        results = str(tmp_path / "results")
        cwd = os.getcwd()
        os.chdir(str(tmp_path))
        try:
            train_cli.main(train_cli.parse_args([
                "--preset", "tiny-edm", "--epochs", "1",
                "--steps_per_epoch", "3", "--batch_size", "8",
                "--dir", results, "--save_every", "3", "--log_freq", "1",
                "--sample_every", "0",
            ]))
        finally:
            os.chdir(cwd)
        ckpt_root = str(tmp_path / "logs" / "results")
        step = sorted(d for d in os.listdir(ckpt_root)
                      if d.startswith("steps_"))[-1]
        outdir = str(tmp_path / "infer")
        infer_cli.main(infer_cli.parse_args([
            "--preset", "tiny-edm", "--ckpt", os.path.join(ckpt_root, step),
            "--sampler_steps", "4", "--flow_method", "heun", "--save",
            "--n_iter", "0", "--batch_size", "4", "--outdir", outdir,
        ]))
        import PIL.Image
        pngs = [os.path.join(r, f) for r, _, fs in os.walk(outdir)
                for f in fs if f.endswith(".png")]
        assert pngs
        arr = np.asarray(PIL.Image.open(sorted(pngs)[0]))
        assert np.isfinite(arr).all()


class TestDiTEDMComposition:
    def test_dit_edm_cli_roundtrip(self, tmp_path):
        """Backbone x process orthogonality: the DiT denoiser trains under
        the EDM objective and samples on the Karras grid through the CLIs."""
        import os

        from eo_diffusion_tpu.cli import inference as infer_cli
        from eo_diffusion_tpu.cli import train as train_cli

        results = str(tmp_path / "results")
        cwd = os.getcwd()
        os.chdir(str(tmp_path))
        try:
            train_cli.main(train_cli.parse_args([
                "--preset", "tiny-dit-edm", "--epochs", "1",
                "--steps_per_epoch", "3", "--batch_size", "8",
                "--dir", results, "--save_every", "3", "--log_freq", "1",
                "--sample_every", "0",
            ]))
        finally:
            os.chdir(cwd)
        ckpt_root = str(tmp_path / "logs" / "results")
        step = sorted(d for d in os.listdir(ckpt_root)
                      if d.startswith("steps_"))[-1]
        outdir = str(tmp_path / "infer")
        infer_cli.main(infer_cli.parse_args([
            "--preset", "tiny-dit-edm", "--ckpt",
            os.path.join(ckpt_root, step), "--sampler_steps", "4",
            "--save", "--n_iter", "0", "--batch_size", "4",
            "--outdir", outdir,
        ]))
        import PIL.Image
        pngs = [os.path.join(r, f) for r, _, fs in os.walk(outdir)
                for f in fs if f.endswith(".png")]
        assert pngs
        assert np.isfinite(
            np.asarray(PIL.Image.open(sorted(pngs)[0]))).all()
