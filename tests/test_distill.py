"""ReFlow distillation tests (diffusion/distill.py — beyond-reference).

Covers the paired-eps loss hook, coupling generation (determinism +
teacher-sampler parity), the two evaluation functionals on analytic
fields, and the end-to-end claim: re-fitting on teacher couplings
straightens the flow, shrinking the few-step integration error on
held-out noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from eo_diffusion_tpu.diffusion.distill import (
    coupling_batches,
    endpoint_gap,
    generate_couplings,
    straightness,
)
from eo_diffusion_tpu.diffusion.flow import FlowMatching


def _point_mass_velocity(mu):
    """Exact field for data = delta(mu): v(x, t) = (x - mu) / t."""
    def fn(x, t_scaled, cond, y):
        t = (t_scaled / 1000.0)[:, None, None, None]
        return (x - mu) / jnp.maximum(t, 1e-4)
    return fn


class TestPairedLoss:
    def test_given_noise_pins_the_target(self):
        """With a constant-zero model and zero data the paired FM loss is
        exactly mean(eps^2) — no randomness left besides the t draw, which
        the constant model makes irrelevant."""
        fm = FlowMatching.create(image_size=4, in_channels=1)
        x0 = jnp.zeros((16, 4, 4, 1))
        eps = jax.random.normal(jax.random.PRNGKey(3), x0.shape)
        loss = fm.train_loss(lambda x, t, c, y: jnp.zeros_like(x),
                             jax.random.PRNGKey(0), x0, noise=eps)
        assert abs(float(loss) - float(jnp.mean(eps**2))) < 1e-6

    def test_gaussian_loss_accepts_fixed_noise(self):
        """GaussianDiffusion.train_loss takes the eps like the reference's
        EODiffusion.forward(x, noise) (model.py:38)."""
        from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion

        gd = GaussianDiffusion.create(timesteps=20, image_size=4, in_channels=1)
        x0 = jnp.zeros((16, 4, 4, 1))
        eps = jax.random.normal(jax.random.PRNGKey(3), x0.shape)
        # eps-objective with a zero model: loss = mean(eps^2) exactly
        loss = gd.train_loss(lambda x, t, c, y: jnp.zeros_like(x),
                             jax.random.PRNGKey(0), x0, noise=eps)
        assert abs(float(loss) - float(jnp.mean(eps**2))) < 1e-5

    def test_train_step_consumes_noise_batch_key(self):
        """The Trainer's step fn routes batch["noise"] into the loss: for
        the zero-init-head model the prediction is ~0, so the loss equals
        mean(noise^2) for whatever noise rides the batch."""
        from eo_diffusion_tpu.models.unet import UNet, UNetConfig
        from eo_diffusion_tpu.train.trainer import TrainState, make_train_step

        cfg = UNetConfig(image_size=8, in_channels=1, model_channels=16,
                         out_channels=1, num_res_blocks=1,
                         attention_resolutions=(), channel_mult=(1, 2),
                         num_heads=1)
        model = UNet(cfg)
        fm = FlowMatching.create(image_size=8, in_channels=1)
        x = jnp.zeros((4, 8, 8, 1))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x,
                                     jnp.zeros((1,), jnp.int32))
        tx = optax.sgd(0.0)
        state = TrainState.create(params, tx)
        apply_fn = (lambda p, xx, tt, cond=None, y=None, train=False,
                    dropout_rng=None: model.apply(p, xx, tt, cond=cond, y=y))
        step = make_train_step(fm, apply_fn, tx, ema_decay=0.9, ema_every=1)
        eps = 2.0 * jnp.ones_like(x)  # mean(eps^2) = 4
        _, metrics = jax.jit(step)(state, {"image": x, "noise": eps},
                                   jax.random.PRNGKey(1))
        assert abs(float(metrics["loss"]) - 4.0) < 1e-2, float(metrics["loss"])


class TestCouplings:
    def test_deterministic_and_matches_teacher(self):
        fm = FlowMatching.create(image_size=4, in_channels=1)
        fn = _point_mass_velocity(0.3)
        rng = jax.random.PRNGKey(7)
        eps1, x1 = generate_couplings(fm, fn, rng, 10, num_steps=16,
                                      batch_size=4)
        eps2, x2 = generate_couplings(fm, fn, rng, 10, num_steps=16,
                                      batch_size=4)
        assert eps1.shape == x1.shape == (10, 4, 4, 1)
        np.testing.assert_array_equal(eps1, eps2)
        np.testing.assert_array_equal(x1, x2)
        # the exact point-mass field transports every noise draw onto mu
        assert np.abs(x1 - 0.3).max() < 0.05
        # couplings are genuinely paired with their own eps draw
        assert np.std(eps1) > 0.5

    def test_conditional_ragged_tail_pads_to_full_batch(self):
        # n=9 with batch_size=8 leaves a 1-row tail: the pad (7 rows) is
        # larger than the tail itself, which the old single-concat pad
        # underfilled (shape-mismatch crash inside the teacher sample).
        fm = FlowMatching.create(image_size=4, in_channels=1)

        def fn(x, t_scaled, cond, y):
            assert cond is not None
            t = (t_scaled / 1000.0)[:, None, None, None]
            return (x - cond) / jnp.maximum(t, 1e-4)

        cond = np.full((9, 4, 4, 1), 0.3, np.float32)
        yv = np.zeros((9,), np.int32)
        eps, x1 = generate_couplings(fm, fn, jax.random.PRNGKey(7), 9,
                                     num_steps=16, batch_size=8,
                                     cond=cond, y=yv)
        assert eps.shape == x1.shape == (9, 4, 4, 1)
        assert np.abs(x1 - 0.3).max() < 0.05

    def test_batches_carry_image_and_noise(self):
        eps = np.arange(8, dtype=np.float32).reshape(8, 1, 1, 1)
        x1 = -eps
        it = coupling_batches(eps, x1, batch_size=4, seed=0)
        b = next(it)
        assert set(b) == {"image", "noise"}
        np.testing.assert_array_equal(b["image"], -b["noise"])


class TestFunctionals:
    def test_zero_for_straight_field(self):
        """v(x,t) = (x - x1)/t moves the coupling (eps, x1) along the exact
        chord, so both functionals vanish on it."""
        fm = FlowMatching.create(image_size=4, in_channels=1)
        fn = _point_mass_velocity(0.25)
        eps = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 4, 1))
        x1 = jnp.full_like(eps, 0.25)
        assert float(straightness(fm, fn, eps, x1)) < 1e-4
        assert float(endpoint_gap(fm, fn, eps, few_steps=1)) < 1e-2

    def test_positive_for_curved_field(self):
        """The optimal field of a two-delta mixture curves: the functionals
        must see it."""
        def v(x, t_scaled, cond, y):
            t = (t_scaled / 1000.0)[:, None, None, None]
            # posterior-weighted mixture of the two point-mass fields
            var = jnp.maximum(t, 1e-4) ** 2
            logp = -((x - 0.6) ** 2 - (x + 0.6) ** 2) / (2 * var)
            w = jax.nn.sigmoid(-logp)  # P(mu=-0.6 | x_t)
            return (w * (x + 0.6) + (1 - w) * (x - 0.6)) / jnp.maximum(t, 1e-4)

        fm = FlowMatching.create(image_size=4, in_channels=1)
        rng = jax.random.PRNGKey(1)
        eps = jax.random.normal(rng, (32, 4, 4, 1))
        x1 = fm.sample(v, rng, 32, num_steps=64, method="heun", x_T=eps).x
        assert float(straightness(fm, v, eps, x1)) > 0.05
        assert float(endpoint_gap(fm, v, eps, few_steps=1)) > 0.05


class TestReflowEndToEnd:
    """Train a tiny teacher on a curved (two-delta) distribution, re-fit on
    its own couplings, and verify the student is straighter and more
    accurate at 1-2 Euler steps on held-out noise — the ReFlow claim
    (arXiv:2209.03003 §3.2)."""

    @pytest.fixture(scope="class")
    def models(self):
        from eo_diffusion_tpu.models.unet import UNet, UNetConfig
        from eo_diffusion_tpu.train.trainer import TrainState, make_train_step

        cfg = UNetConfig(image_size=8, in_channels=1, model_channels=16,
                         out_channels=1, num_res_blocks=1,
                         attention_resolutions=(), channel_mult=(1, 2),
                         num_heads=1)
        model = UNet(cfg)
        fm = FlowMatching.create(image_size=8, in_channels=1)

        def data_batch(rng, n=64):
            sign = jax.random.bernoulli(rng, 0.5, (n, 1, 1, 1))
            return jnp.where(sign, 0.6, -0.6) * jnp.ones((n, 8, 8, 1))

        x0 = jnp.zeros((1, 8, 8, 1))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                                     jnp.zeros((1,), jnp.int32))
        apply_fn = (lambda p, xx, tt, cond=None, y=None, train=False,
                    dropout_rng=None: model.apply(p, xx, tt, cond=cond, y=y))

        def fit(init_params, batches, steps, lr, rng):
            tx = optax.adam(lr)
            # copy: the donated step would otherwise delete the caller's
            # init_params buffers (the teacher is still needed afterwards)
            state = TrainState.create(jax.tree.map(jnp.copy, init_params), tx)
            step = jax.jit(make_train_step(fm, apply_fn, tx, ema_decay=0.99,
                                           ema_every=1, ema_warmup=False),
                           donate_argnums=(0,))
            for i in range(steps):
                rng, brng, srng = jax.random.split(rng, 3)
                state, m = step(state, batches(brng, i), srng)
            return state.ema_params, float(m["loss"])

        # teacher: plain FM on the mixture
        teacher, t_loss = fit(
            params, lambda r, i: {"image": data_batch(r)}, 400, 2e-3,
            jax.random.PRNGKey(1))
        assert t_loss < 0.6, f"teacher failed to train: loss {t_loss}"

        t_fn = lambda x, t, c, y: model.apply(teacher, x, t, cond=c, y=y)
        eps, x1 = generate_couplings(fm, t_fn, jax.random.PRNGKey(2), 256,
                                     num_steps=16, method="heun",
                                     batch_size=64)
        it = coupling_batches(eps, x1, 64, seed=3)
        student, _ = fit(teacher,
                         lambda r, i: jax.tree.map(jnp.asarray, next(it)),
                         300, 5e-4, jax.random.PRNGKey(4))
        s_fn = lambda x, t, c, y: model.apply(student, x, t, cond=c, y=y)
        held_eps = jax.random.normal(jax.random.PRNGKey(99), (64, 8, 8, 1))
        held_x1 = fm.sample(t_fn, jax.random.PRNGKey(0), 64, num_steps=32,
                            method="heun", x_T=held_eps).x
        return dict(fm=fm, t_fn=t_fn, s_fn=s_fn, held_eps=held_eps,
                    held_x1=held_x1)

    def test_student_is_straighter(self, models):
        fm, held = models["fm"], models["held_eps"]
        s_t = float(straightness(fm, models["t_fn"], held, models["held_x1"]))
        # the student is scored on ITS OWN transport of the held-out noise
        s_x1 = fm.sample(models["s_fn"], jax.random.PRNGKey(0), 64,
                         num_steps=32, method="heun", x_T=held).x
        s_s = float(straightness(fm, models["s_fn"], held, s_x1))
        assert s_s < s_t, (s_s, s_t)

    def test_student_few_step_error_shrinks(self, models):
        fm, held = models["fm"], models["held_eps"]
        for k in (1, 2):
            g_t = float(endpoint_gap(fm, models["t_fn"], held, few_steps=k))
            g_s = float(endpoint_gap(fm, models["s_fn"], held, few_steps=k))
            assert g_s < g_t, (k, g_s, g_t)

    def test_student_preserves_the_marginal(self, models):
        """Straightening must not collapse the distribution: the student's
        8-step samples still land near the two modes with both modes
        populated."""
        fm = models["fm"]
        x = fm.sample(models["s_fn"], jax.random.PRNGKey(5), 64,
                      num_steps=8, method="euler").x
        m = np.asarray(jnp.mean(x, axis=(1, 2, 3)))
        assert (m > 0.3).sum() > 8 and (m < -0.3).sum() > 8, m
        assert np.abs(np.abs(m) - 0.6).mean() < 0.25, m


class TestDistillCLI:
    """Plumbing round-trip: train tiny-flow through the train CLI, distill
    through the distill CLI, serve the student through the inference CLI
    with --sampler_steps 2 (quality claims live in TestReflowEndToEnd; this
    checks the argparse entry points compose)."""

    def test_train_distill_infer(self, tmp_path):
        import os

        from eo_diffusion_tpu.cli import distill as distill_cli
        from eo_diffusion_tpu.cli import inference as infer_cli
        from eo_diffusion_tpu.cli import train as train_cli

        sample_dir = str(tmp_path / "results_flow")
        cwd = os.getcwd()
        os.chdir(str(tmp_path))
        try:
            train_cli.main(train_cli.parse_args([
                "--preset", "tiny-flow", "--epochs", "1",
                "--steps_per_epoch", "3", "--batch_size", "8",
                "--dir", sample_dir, "--sample_every", "100",
                "--save_every", "3", "--log_freq", "1", "--n_samples", "4",
            ]))
            ckpt_root = os.path.join(str(tmp_path), "logs", "results_flow")
            steps = sorted(d for d in os.listdir(ckpt_root)
                           if d.startswith("steps_"))
            teacher_ckpt = os.path.join(ckpt_root, steps[-1])

            outdir = str(tmp_path / "distill")
            results = distill_cli.main(distill_cli.parse_args([
                "--preset", "tiny-flow", "--ckpt", teacher_ckpt,
                "--dir", outdir, "--n_pairs", "32", "--pair_steps", "4",
                "--steps", "5", "--batch_size", "16", "--eval_n", "8",
                "--few_steps", "1", "--no_bf16",
            ]))
            assert np.isfinite(results["student"]["euler1_gap"])
            assert os.path.isdir(os.path.join(outdir, "student"))
            assert os.path.exists(os.path.join(outdir, "distill_metrics.json"))

            infer_out = str(tmp_path / "infer_student")
            infer_cli.main(infer_cli.parse_args([
                "--preset", "tiny-flow", "--ckpt",
                os.path.join(outdir, "student"),
                "--sampler_steps", "2", "--save", "--samples_fid",
                "--n_iter", "0", "--batch_size", "4", "--outdir", infer_out,
            ]))
            assert os.listdir(os.path.join(infer_out, "samples_fid"))
        finally:
            os.chdir(cwd)

    def test_latent_flow_distill(self, tmp_path):
        """Latent preset: couplings + re-fit run on the latent grid (no AE
        touched by the distill CLI); the student serves through the
        inference CLI with the teacher's first stage."""
        import os

        from eo_diffusion_tpu.cli import distill as distill_cli
        from eo_diffusion_tpu.cli import inference as infer_cli
        from eo_diffusion_tpu.cli import train as train_cli

        cwd = os.getcwd()
        os.chdir(str(tmp_path))
        try:
            train_cli.main(train_cli.parse_args([
                "--preset", "tiny-latent-flow", "--epochs", "1",
                "--steps_per_epoch", "3", "--batch_size", "8",
                "--dir", "res_lflow", "--sample_every", "100",
                "--save_every", "3", "--log_freq", "1", "--n_samples", "4",
            ]))
            ckpt_root = os.path.join(str(tmp_path), "logs", "res_lflow")
            steps = sorted(d for d in os.listdir(ckpt_root)
                           if d.startswith("steps_"))
            teacher_ckpt = os.path.join(ckpt_root, steps[-1])

            outdir = str(tmp_path / "distill_latent")
            results = distill_cli.main(distill_cli.parse_args([
                "--preset", "tiny-latent-flow", "--ckpt", teacher_ckpt,
                "--dir", outdir, "--n_pairs", "16", "--pair_steps", "4",
                "--steps", "4", "--batch_size", "8", "--eval_n", "8",
                "--few_steps", "1", "--no_bf16",
            ]))
            assert np.isfinite(results["student"]["euler1_gap"])

            infer_out = str(tmp_path / "infer_latent_student")
            infer_cli.main(infer_cli.parse_args([
                "--preset", "tiny-latent-flow", "--ckpt",
                os.path.join(outdir, "student"),
                "--ae_ckpt", os.path.join(ckpt_root, "ae"),
                "--sampler_steps", "2", "--save", "--samples_fid",
                "--n_iter", "0", "--batch_size", "4", "--outdir", infer_out,
            ]))
            assert os.listdir(os.path.join(infer_out, "samples_fid"))
        finally:
            os.chdir(cwd)


class TestGuidedDistillation:
    """Guidance distillation (arXiv:2210.03142; cli/distill.py --method
    guided): cfg_model_fn folds the CFG pair into one teacher callable."""

    def test_cfg_model_fn_combine_algebra(self):
        from eo_diffusion_tpu.diffusion.distill import cfg_model_fn

        def model_fn(x, t, cond, y):
            # conditional branch returns 2, null branch returns 1
            return jnp.where((y == 9)[:, None, None, None],
                             jnp.ones_like(x), 2.0 * jnp.ones_like(x))

        x = jnp.zeros((4, 8, 8, 3))
        t = jnp.zeros((4,))
        y = jnp.zeros((4,), jnp.int32)
        out = cfg_model_fn(model_fn, 3.0, 9)(x, t, None, y)
        # e_u=1, e_c=2 -> 1 + 3*(2-1) = 4
        np.testing.assert_allclose(np.asarray(out), 4.0, atol=1e-6)

    def test_cfg_model_fn_requires_labels(self):
        from eo_diffusion_tpu.diffusion.distill import cfg_model_fn

        fn = cfg_model_fn(lambda x, t, c, y: x, 2.0, 5)
        with pytest.raises(AssertionError, match="class labels"):
            fn(jnp.zeros((2, 4, 4, 3)), jnp.zeros((2,)), None, None)

    def test_cfg_model_fn_rescale_restores_std(self):
        """guidance_rescale=1 rescales the guided output to the
        conditional branch's per-sample std (arXiv:2305.08891)."""
        from eo_diffusion_tpu.diffusion.distill import cfg_model_fn

        rng = np.random.default_rng(0)
        e_c = jnp.asarray(rng.normal(size=(2, 8, 8, 3)), jnp.float32)

        def model_fn(x, t, cond, y):
            null = (y == 7)[:, None, None, None]
            return jnp.where(null, 0.25 * e_c, e_c)

        out = cfg_model_fn(model_fn, 4.0, 7, guidance_rescale=1.0)(
            jnp.zeros((2, 8, 8, 3)), jnp.zeros((2,)), None,
            jnp.zeros((2,), jnp.int32))
        np.testing.assert_allclose(
            np.std(np.asarray(out), axis=(1, 2, 3)),
            np.std(np.asarray(e_c), axis=(1, 2, 3)), rtol=1e-4)

    def test_guided_couplings_follow_guided_ode(self):
        """Couplings simulated through cfg_model_fn must land on the
        guided ODE's endpoint, not the conditional one — checked on an
        analytic pair of point-mass fields where the guided field is the
        point mass at mu_u + w (mu_c - mu_u)."""
        from eo_diffusion_tpu.diffusion.distill import cfg_model_fn

        flow = FlowMatching.create(image_size=8, in_channels=3)
        mu_c, mu_u, w = 0.6, 0.2, 2.0

        def model_fn(x, t_scaled, cond, y):
            t = (t_scaled / 1000.0)[:, None, None, None]
            mu = jnp.where((y == 5)[:, None, None, None], mu_u, mu_c)
            return (x - mu) / jnp.maximum(t, 1e-4)

        guided = cfg_model_fn(model_fn, w, 5)
        eps, x1 = generate_couplings(
            flow, guided, jax.random.PRNGKey(0), 8, num_steps=64,
            batch_size=8, y=np.zeros(8, np.int32))
        mu_guided = mu_u + w * (mu_c - mu_u)  # = 1.0
        np.testing.assert_allclose(x1.mean(), mu_guided, atol=0.05)

    def test_cli_guided_flow_roundtrip(self, tmp_path):
        """Train a tiny class-conditional flow teacher through the real
        train CLI, guided-distill it, and check the student checkpoint +
        metrics land (the full-size run is the chip capstone)."""
        import os

        from eo_diffusion_tpu.cli import distill as distill_cli
        from eo_diffusion_tpu.cli import train as train_cli

        cwd = os.getcwd()
        os.chdir(str(tmp_path))
        try:
            train_cli.main(train_cli.parse_args([
                "--preset", "tiny-cflow", "--epochs", "1",
                "--steps_per_epoch", "10", "--batch_size", "16",
                "--dir", "results/teacher", "--sample_every", "100",
                "--save_every", "10", "--log_freq", "5",
                "--n_samples", "4",
            ]))
            teacher = os.path.join("logs", "teacher", "steps_00000010")
            outdir = str(tmp_path / "out")
            results = distill_cli.main(distill_cli.parse_args([
                "--preset", "tiny-cflow", "--method", "guided",
                "--ckpt", teacher, "--dir", outdir,
                "--steps", "5", "--n_pairs", "16", "--pair_steps", "2",
                "--eval_n", "8", "--few_steps", "1", "--no_bf16",
                "--guidance_scale", "2.0",
            ]))
            assert np.isfinite(results["teacher"]["euler1_gap"])
            assert np.isfinite(results["student"]["euler1_gap"])
            assert os.path.isdir(os.path.join(outdir, "student"))
            assert os.path.exists(
                os.path.join(outdir, "distill_metrics.json"))
        finally:
            os.chdir(cwd)

    def test_guided_requires_class_conditional_preset(self):
        from eo_diffusion_tpu.cli import distill as distill_cli

        with pytest.raises(AssertionError, match="class-conditional"):
            distill_cli.main(distill_cli.parse_args([
                "--preset", "flow64", "--method", "guided",
                "--ckpt", "/nonexistent",
            ]))
