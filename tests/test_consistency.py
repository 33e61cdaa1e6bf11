"""Consistency distillation (diffusion/consistency.py): boundary/parameter
identities, teacher-step exactness, and an end-to-end distillation that
beats the teacher's own few-step sampling."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eo_diffusion_tpu.diffusion.consistency import ConsistencyDistillation
from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion

SIZE = 8


def _cd(timesteps=100, **kw):
    d = GaussianDiffusion.create(timesteps=timesteps, image_size=SIZE,
                                 in_channels=3)
    return ConsistencyDistillation.create(d, **kw)


class TestParameterization:
    def test_boundary_identity_at_t0(self):
        """f(x, 0) ~ x whatever the network says (c_skip ~ 1, c_out ~ sigma_min)."""
        cd = _cd()
        x = jax.random.normal(jax.random.PRNGKey(0), (4, SIZE, SIZE, 3))
        wild = lambda xx, t, c, y: 7.0 * jnp.ones_like(xx)
        out = cd.f(wild, x, jnp.zeros((4,), jnp.int32))
        # sigma(0) of the cosine chain is ~0.02: identity up to that scale
        assert float(jnp.abs(out - x).max()) < 0.3
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=0.3)

    def test_network_input_bounded(self):
        """c_in keeps the network input O(1) at every chain index."""
        cd = _cd()
        t = jnp.arange(100)
        _, _, c_in = cd._coeffs(t)
        acp = jnp.asarray(cd.diffusion.schedule.alphas_cumprod)[t]
        # |c_in * x_t| ~ c_in * sqrt(acp sd^2-ish + (1-acp)) = O(1)
        scale = np.asarray(c_in * jnp.sqrt(1.0 - acp + acp * 0.25))
        assert scale.max() < 1.5 and scale.min() > 0.3

    def test_grid_endpoints(self):
        cd = _cd(n_points=10)
        g = np.asarray(cd.grid())
        assert g[0] == 0 and g[-1] == 99 and np.all(np.diff(g) > 0)

    def test_update_target_decay(self):
        a = {"w": jnp.ones((3,))}
        b = {"w": jnp.zeros((3,))}
        out = ConsistencyDistillation.update_target(a, b, decay=0.9)
        np.testing.assert_allclose(np.asarray(out["w"]), 0.9)


class TestTeacherStep:
    def test_oracle_teacher_step_is_exact_marginal(self):
        """With the oracle eps model (knows x0), the DDIM step from t2 to
        t1 lands exactly on sqrt(acp1) x0 + sqrt(1-acp1) eps."""
        cd = _cd()
        d = cd.diffusion
        x0 = jax.random.normal(jax.random.PRNGKey(0), (4, SIZE, SIZE, 3))
        eps = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
        t2 = jnp.full((4,), 80, jnp.int32)
        t1 = jnp.full((4,), 40, jnp.int32)
        x_t2 = d.q_sample(x0, t2, eps)
        acp = jnp.asarray(d.schedule.alphas_cumprod)

        def oracle(x, t, c, y):  # true eps given the fixed (x0, eps) pair
            a = acp[t][:, None, None, None]
            return (x - jnp.sqrt(a) * x0) / jnp.sqrt(1.0 - a)

        x_t1 = cd._teacher_ddim_step(oracle, x_t2, t2, t1, None, None)
        want = (jnp.sqrt(acp[40]) * x0 + jnp.sqrt(1.0 - acp[40]) * eps)
        np.testing.assert_allclose(np.asarray(x_t1), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)

    def test_oracle_consistency_loss_near_zero(self):
        """If student == target == the ORACLE consistency function (both
        return x0 exactly), the distillation loss vanishes: plumb F so
        f(x,t) == x0 for the oracle pair."""
        cd = _cd()
        d = cd.diffusion
        x0 = jnp.full((8, SIZE, SIZE, 3), 0.4)

        def oracle_F(x_in, t, c, y):
            # invert the parameterization: F = (x0 - c_skip x_t)/c_out with
            # x_t recovered from the normalized input
            c_skip, c_out, c_in = cd._coeffs(t)
            cb = lambda v: v[:, None, None, None]
            x_t = x_in.astype(jnp.float32) / cb(c_in)
            return (0.4 - cb(c_skip) * x_t) / cb(c_out)

        def oracle_teacher(x, t, c, y):
            a = jnp.asarray(d.schedule.alphas_cumprod)[t][:, None, None, None]
            return (x - jnp.sqrt(a) * 0.4) / jnp.sqrt(1.0 - a)

        loss = cd.distill_loss(oracle_F, oracle_F, oracle_teacher,
                               jax.random.PRNGKey(0), x0)
        assert float(loss) < 1e-6


class TestEndToEndDistillation:
    def test_distilled_two_step_beats_teacher_two_step(self):
        """Train a tiny DDPM teacher on the bimodal fixture, distill 400
        steps, and compare 2-evaluation sampling: the consistency student
        must recover the bimodal per-image means far better than the
        teacher's own 2-step DDIM (which barely denoises)."""
        import optax

        from eo_diffusion_tpu.models.unet import UNet, UNetConfig
        from eo_diffusion_tpu.train.trainer import (Trainer, TrainerConfig,
                                                    TrainState)

        rng_np = np.random.default_rng(0)
        mk = lambda bs=16: {"image": (
            rng_np.choice([-0.6, 0.6], size=(bs, 1, 1, 1))
            + 0.05 * rng_np.normal(size=(bs, SIZE, SIZE, 3))
        ).astype(np.float32)}

        ucfg = UNetConfig(image_size=SIZE, in_channels=3, model_channels=32,
                          out_channels=3, num_res_blocks=1,
                          attention_resolutions=(), channel_mult=(1, 2),
                          num_heads=1)
        model = UNet(ucfg)
        diffusion = GaussianDiffusion.create(timesteps=100, image_size=SIZE,
                                             in_channels=3)
        tr = Trainer(TrainerConfig(lr=2e-3, batch_size=16, epochs=1,
                                   timesteps=100, model_ema_steps=5),
                     model, diffusion, 100)
        state = tr.init(jax.random.PRNGKey(0), mk())
        for _ in range(250):
            state, m = tr.step(state, mk())
        teacher = state.params
        assert float(m["loss"]) < 0.2

        cd = ConsistencyDistillation.create(diffusion, n_points=10)
        teacher_fn = lambda x, t, c, y: model.apply(teacher, x, t, cond=c, y=y)

        student = jax.tree.map(jnp.copy, teacher)  # init from the teacher
        target = jax.tree.map(jnp.copy, teacher)
        tx = optax.adam(1e-3)
        opt = tx.init(student)

        @jax.jit
        def step(student, target, opt, rng, x0):
            def loss_fn(sp):
                s_fn = lambda x, t, c, y: model.apply(sp, x, t, cond=c, y=y)
                t_fn = lambda x, t, c, y: model.apply(target, x, t, cond=c, y=y)
                return cd.distill_loss(s_fn, t_fn, teacher_fn, rng, x0)

            loss, grads = jax.value_and_grad(loss_fn)(student)
            up, opt = tx.update(grads, opt, student)
            student = optax.apply_updates(student, up)
            target = ConsistencyDistillation.update_target(target, student,
                                                           0.95)
            return student, target, opt, loss

        key = jax.random.PRNGKey(7)
        for i in range(400):
            key, k = jax.random.split(key)
            student, target, opt, loss = step(student, target, opt, k,
                                              jnp.asarray(mk()["image"]))
        assert np.isfinite(float(loss))

        student_fn = lambda x, t, c, y: model.apply(student, x, t, cond=c, y=y)
        cm2 = cd.sample(student_fn, jax.random.PRNGKey(11), 64, steps=2).x
        dd2 = diffusion.ddim_sample(teacher_fn, jax.random.PRNGKey(11), 64,
                                    num_steps=2).x
        spread = lambda x: float(np.asarray(x).mean(axis=(1, 2, 3)).std())
        s_cm, s_dd = spread(cm2), spread(dd2)
        # data per-image mean spread is 0.6; 2-step DDIM barely denoises
        assert s_cm > s_dd + 0.1, (s_cm, s_dd)
        assert np.isfinite(np.asarray(cm2)).all()
        one = cd.sample(student_fn, jax.random.PRNGKey(12), 16, steps=1).x
        assert spread(one) > 0.2  # 1-step already carries the modes


class TestConsistencyCLI:
    def test_train_distill_infer_roundtrip(self, tmp_path):
        """tiny DDPM teacher -> cli.distill --method consistency ->
        cli.inference --sampler cm, all through the argparse entry points."""
        import os

        from eo_diffusion_tpu.cli import distill as distill_cli
        from eo_diffusion_tpu.cli import inference as infer_cli
        from eo_diffusion_tpu.cli import train as train_cli

        results = str(tmp_path / "results")
        cwd = os.getcwd()
        os.chdir(str(tmp_path))
        try:
            train_cli.main(train_cli.parse_args([
                "--preset", "tiny", "--epochs", "1", "--steps_per_epoch",
                "3", "--batch_size", "8", "--dir", results,
                "--save_every", "3", "--log_freq", "1", "--sample_every", "0",
            ]))
        finally:
            os.chdir(cwd)
        ckpt_root = str(tmp_path / "logs" / "results")
        step = sorted(d for d in os.listdir(ckpt_root)
                      if d.startswith("steps_"))[-1]
        ddir = str(tmp_path / "distill")
        res = distill_cli.main(distill_cli.parse_args([
            "--preset", "tiny", "--method", "consistency",
            "--ckpt", os.path.join(ckpt_root, step), "--dir", ddir,
            "--n_pairs", "32", "--pair_steps", "4", "--steps", "10",
            "--batch_size", "16", "--cd_points", "6", "--eval_n", "8",
            "--few_steps", "1", "2", "--no_bf16",
        ]))
        assert np.isfinite(res["student"]["cm1_gap"])
        assert os.path.isfile(os.path.join(ddir, "distill_metrics.json"))

        outdir = str(tmp_path / "infer")
        infer_cli.main(infer_cli.parse_args([
            "--preset", "tiny", "--ckpt", os.path.join(ddir, "student"),
            "--sampler", "cm", "--sampler_steps", "2", "--cd_points", "6",
            "--save", "--n_iter", "0", "--batch_size", "4",
            "--outdir", outdir,
        ]))
        import PIL.Image
        pngs = [os.path.join(r, f) for r, _, fs in os.walk(outdir)
                for f in fs if f.endswith(".png")]
        assert pngs
        assert np.isfinite(
            np.asarray(PIL.Image.open(sorted(pngs)[0]))).all()

    def test_latent_consistency_distill(self, tmp_path):
        """Latent DDPM preset: the x0 pool is teacher samples ON the latent
        grid (no AE in the distill CLI at all); the cm student serves
        through the inference CLI, which decodes with the teacher's first
        stage."""
        import os

        from eo_diffusion_tpu.cli import distill as distill_cli
        from eo_diffusion_tpu.cli import inference as infer_cli
        from eo_diffusion_tpu.cli import train as train_cli

        cwd = os.getcwd()
        os.chdir(str(tmp_path))
        try:
            train_cli.main(train_cli.parse_args([
                "--preset", "tiny-latent", "--epochs", "1",
                "--steps_per_epoch", "3", "--batch_size", "8",
                "--dir", "res_lcm", "--sample_every", "0",
                "--save_every", "3", "--log_freq", "1",
            ]))
            ckpt_root = os.path.join(str(tmp_path), "logs", "res_lcm")
            step = sorted(d for d in os.listdir(ckpt_root)
                          if d.startswith("steps_"))[-1]

            ddir = str(tmp_path / "distill_lcm")
            res = distill_cli.main(distill_cli.parse_args([
                "--preset", "tiny-latent", "--method", "consistency",
                "--ckpt", os.path.join(ckpt_root, step), "--dir", ddir,
                "--n_pairs", "16", "--pair_steps", "4", "--steps", "6",
                "--batch_size", "8", "--cd_points", "5", "--eval_n", "8",
                "--few_steps", "1", "--sigma_data", "1.0", "--no_bf16",
            ]))
            assert np.isfinite(res["student"]["cm1_gap"])

            outdir = str(tmp_path / "infer_lcm")
            infer_cli.main(infer_cli.parse_args([
                "--preset", "tiny-latent", "--ckpt",
                os.path.join(ddir, "student"),
                "--ae_ckpt", os.path.join(ckpt_root, "ae"),
                "--sampler", "cm", "--sampler_steps", "2",
                "--cd_points", "5", "--sigma_data", "1.0",
                "--save", "--samples_fid", "--n_iter", "0",
                "--batch_size", "4", "--outdir", outdir,
            ]))
            fid_files = os.listdir(os.path.join(outdir, "samples_fid"))
            assert fid_files
        finally:
            os.chdir(cwd)

    def test_method_process_mismatch_rejected(self):
        from eo_diffusion_tpu.cli import distill as distill_cli

        with pytest.raises(AssertionError, match="consistency"):
            distill_cli.main(distill_cli.parse_args([
                "--preset", "tiny-flow", "--method", "consistency",
                "--ckpt", "/nonexistent"]))
        with pytest.raises(AssertionError, match="ReFlow|reflow|flow"):
            distill_cli.main(distill_cli.parse_args([
                "--preset", "tiny", "--ckpt", "/nonexistent"]))


class TestConsistencyTraining:
    """teacher_fn=None = consistency TRAINING (Algorithm 3, teacher-free)."""

    def test_ct_oracle_loss_near_zero(self):
        """The oracle consistency function has zero CT loss too: both
        branches feed exact marginal points of the same x0."""
        cd = _cd()

        def oracle_F(x_in, t, c, y):
            c_skip, c_out, c_in = cd._coeffs(t)
            cb = lambda v: v[:, None, None, None]
            x_t = x_in.astype(jnp.float32) / cb(c_in)
            return (0.4 - cb(c_skip) * x_t) / cb(c_out)

        x0 = jnp.full((8, SIZE, SIZE, 3), 0.4)
        loss = cd.distill_loss(oracle_F, oracle_F, None,
                               jax.random.PRNGKey(0), x0)
        assert float(loss) < 1e-6

    def test_ct_trains_from_scratch(self):
        """Teacher-free CT on the bimodal fixture: a fresh tiny UNet's
        1-step samples acquire bimodal structure (no DDPM pretraining at
        all — data only)."""
        import optax

        from eo_diffusion_tpu.models.unet import UNet, UNetConfig

        rng_np = np.random.default_rng(0)
        mk = lambda bs=16: (
            rng_np.choice([-0.6, 0.6], size=(bs, 1, 1, 1))
            + 0.05 * rng_np.normal(size=(bs, SIZE, SIZE, 3))
        ).astype(np.float32)

        ucfg = UNetConfig(image_size=SIZE, in_channels=3, model_channels=32,
                          out_channels=3, num_res_blocks=1,
                          attention_resolutions=(), channel_mult=(1, 2),
                          num_heads=1)
        model = UNet(ucfg)
        diffusion = GaussianDiffusion.create(timesteps=100, image_size=SIZE,
                                             in_channels=3)
        cd = ConsistencyDistillation.create(diffusion, n_points=10)
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, SIZE, SIZE, 3)),
                                     jnp.zeros((1,), jnp.int32))
        student = params
        target = jax.tree.map(jnp.copy, params)
        tx = optax.adam(2e-3)
        opt = tx.init(student)

        @jax.jit
        def step(student, target, opt, rng, x0):
            loss, grads = jax.value_and_grad(
                lambda sp: cd.distill_loss(
                    lambda x, t, c, y: model.apply(sp, x, t, cond=c, y=y),
                    lambda x, t, c, y: model.apply(target, x, t, cond=c, y=y),
                    None, rng, x0))(student)
            up, opt = tx.update(grads, opt, student)
            student = optax.apply_updates(student, up)
            target = ConsistencyDistillation.update_target(target, student,
                                                           0.95)
            return student, target, opt, loss

        key = jax.random.PRNGKey(3)
        for i in range(500):
            key, k = jax.random.split(key)
            student, target, opt, loss = step(student, target, opt, k,
                                              jnp.asarray(mk()))
        assert np.isfinite(float(loss))
        fn = lambda x, t, c, y: model.apply(target, x, t, cond=c, y=y)
        one = cd.sample(fn, jax.random.PRNGKey(9), 64, steps=1).x
        spread = float(np.asarray(one).mean(axis=(1, 2, 3)).std())
        # data spread is 0.6, an untrained f gives ~0.04; 500 CT steps
        # reach ~0.19 — structure is clearly forming, though CT converges
        # slower than CD (the paper anneals n_points over long schedules)
        assert spread > 0.12, spread
