"""Progressive-distillation tests (diffusion/progressive.py + the distill
CLI's --method progressive).

Oracle teachers make the 2-steps-into-1 target analytic (for a point-mass
eps-oracle the implied x0 target is exactly the mass, so a matching student
has ~zero loss); the end-to-end test checks a distilled 4-step student
tracks the teacher's 16-step endpoint better than the teacher's own 4-step.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
from eo_diffusion_tpu.diffusion.progressive import (
    ProgressiveDistillation,
    _grid,
    pd_sample,
)

SIZE = 8


def _diff(T=100):
    return GaussianDiffusion.create(timesteps=T, image_size=SIZE,
                                    in_channels=3)


def _oracle(diff, target):
    sa = jnp.asarray(diff.schedule.sqrt_alphas_cumprod)
    ss = jnp.asarray(diff.schedule.sqrt_one_minus_alphas_cumprod)

    def oracle(x, t, cond, y):
        a = sa[t][:, None, None, None]
        s = ss[t][:, None, None, None]
        return (x - a * target) / jnp.maximum(s, 1e-8)

    return oracle


def _v_oracle(diff, target):
    """v = a*eps - s*x0 with eps implied by (x, target): v = (a*x - target)/s."""
    sa = jnp.asarray(diff.schedule.sqrt_alphas_cumprod)
    ss = jnp.asarray(diff.schedule.sqrt_one_minus_alphas_cumprod)

    def oracle(x, t, cond, y):
        a = sa[t][:, None, None, None]
        s = ss[t][:, None, None, None]
        return (a * x - target) / jnp.maximum(s, 1e-8)

    return oracle


class TestGrid:
    def test_endpoints_and_monotone(self):
        g = _grid(100, 9)
        assert g[0] == 0 and g[-1] == 99 and (np.diff(g) > 0).all()

    def test_collision_asserts(self):
        with pytest.raises(AssertionError):
            _grid(10, 33)  # 33 points over T=10 must collide

    def test_create_validates(self):
        with pytest.raises(AssertionError):
            ProgressiveDistillation.create(_diff(T=10), 16)


class TestDistillLoss:
    def test_oracle_student_zero_loss(self):
        """Perfect eps teacher + perfect v student: both predict x0 ==
        target exactly at every level, so the one-step endpoint equals the
        two-step endpoint and the loss must vanish."""
        diff = _diff()
        target = jnp.full((8, SIZE, SIZE, 3), 0.3, jnp.float32)
        pd = ProgressiveDistillation.create(diff, 4)  # student head = v
        x0 = target + 0.05 * jax.random.normal(jax.random.PRNGKey(1),
                                               target.shape)
        loss = pd.distill_loss(_v_oracle(diff, target),
                               _oracle(diff, target),
                               jax.random.PRNGKey(0), x0)
        assert float(loss) < 1e-3, float(loss)

    def test_objectives_routed_separately(self):
        """The teacher is read through the preset's head (eps here), the
        student through v — handing the TEACHER the v oracle must not
        vanish (wrong interpretation), while the correct pairing does."""
        diff = _diff()
        target = jnp.full((8, SIZE, SIZE, 3), 0.3, jnp.float32)
        pd = ProgressiveDistillation.create(diff, 4)
        good = float(pd.distill_loss(_v_oracle(diff, target),
                                     _oracle(diff, target),
                                     jax.random.PRNGKey(0), target))
        bad = float(pd.distill_loss(_v_oracle(diff, target),
                                    _v_oracle(diff, target),
                                    jax.random.PRNGKey(0), target))
        assert good < 1e-3 < bad, (good, bad)

    def test_wrong_student_positive_loss(self):
        diff = _diff()
        target = jnp.full((8, SIZE, SIZE, 3), 0.3, jnp.float32)
        pd = ProgressiveDistillation.create(diff, 4)
        zero = lambda x, t, c, y: jnp.zeros_like(x)
        loss = pd.distill_loss(zero, _oracle(diff, target),
                               jax.random.PRNGKey(0), target)
        assert float(loss) > 0.01

    def test_loss_differentiable(self):
        diff = _diff()
        target = jnp.full((4, SIZE, SIZE, 3), 0.3, jnp.float32)
        pd = ProgressiveDistillation.create(diff, 2)

        def loss_of(scale):
            student = lambda x, t, c, y: scale * x
            return pd.distill_loss(student, _oracle(diff, target),
                                   jax.random.PRNGKey(0), target)

        g = jax.grad(loss_of)(0.5)
        assert np.isfinite(float(g)) and float(g) != 0.0


class TestPDSample:
    def test_shape_determinism(self):
        diff = _diff()
        zero = lambda x, t, c, y: jnp.zeros_like(x)
        a = pd_sample(diff, zero, jax.random.PRNGKey(0), 4, steps=4).x
        b = pd_sample(diff, zero, jax.random.PRNGKey(0), 4, steps=4).x
        assert a.shape == (4, SIZE, SIZE, 3)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_oracle_hits_target(self):
        diff = _diff()
        target = jnp.full((4, SIZE, SIZE, 3), 0.5, jnp.float32)
        out = pd_sample(diff, _oracle(diff, target), jax.random.PRNGKey(0),
                        4, steps=4).x
        # the oracle's x0 is exact at every grid point; the final step
        # lands at acp[0] ~ 1 with the residual-eps floor (as in SDEdit)
        assert float(jnp.mean(jnp.abs(out - target))) < 0.05

    def test_jittable(self):
        diff = _diff()
        zero = lambda x, t, c, y: jnp.zeros_like(x)
        out = jax.jit(lambda k: pd_sample(diff, zero, k, 2, steps=2).x)(
            jax.random.PRNGKey(0))
        assert np.isfinite(np.asarray(out)).all()


class TestEndToEnd:
    def test_student4_tracks_teacher16(self):
        """Distill one 8->4 round on the bimodal fixture (v-objective
        teacher, so teacher and student heads agree): the 4-step student's
        endpoint must be closer to the teacher's 16-step PF-ODE endpoint
        (same noise) than the teacher's own 4-step."""
        import optax

        from eo_diffusion_tpu.models.unet import UNet, UNetConfig
        from eo_diffusion_tpu.train.trainer import Trainer, TrainerConfig

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
        diff = GaussianDiffusion.create(timesteps=100, image_size=SIZE,
                                        in_channels=3, objective="v")
        tr = Trainer(TrainerConfig(lr=2e-3, batch_size=16, epochs=1,
                                   timesteps=100, model_ema_steps=5),
                     model, diff, 100)
        state = tr.init(jax.random.PRNGKey(0), mk())
        for _ in range(250):
            state, m = tr.step(state, mk())
        teacher = state.params
        assert float(m["loss"]) < 0.5
        fn_of = lambda p: (lambda x, t, c, y: model.apply(p, x, t,
                                                          cond=c, y=y))

        pd = ProgressiveDistillation.create(diff, 4)  # v -> v
        student = jax.tree.map(jnp.copy, teacher)
        tx = optax.adam(3e-4)
        opt = tx.init(student)

        @jax.jit
        def step(student, opt, rng, x0):
            loss, grads = jax.value_and_grad(
                lambda sp: pd.distill_loss(fn_of(sp), fn_of(teacher),
                                           rng, x0))(student)
            up, opt = tx.update(grads, opt, student)
            return optax.apply_updates(student, up), opt, loss

        key = jax.random.PRNGKey(7)
        for _ in range(300):
            key, k = jax.random.split(key)
            student, opt, loss = step(student, opt, k,
                                      jnp.asarray(mk()["image"]))
        assert np.isfinite(float(loss))

        eps = jax.random.normal(jax.random.PRNGKey(11),
                                (64, SIZE, SIZE, 3), jnp.float32)
        ref = pd_sample(diff, fn_of(teacher), jax.random.PRNGKey(0), 64,
                        steps=16, x_T=eps).x
        gap = lambda p: float(jnp.sqrt(jnp.mean(
            (pd_sample(diff, fn_of(p), jax.random.PRNGKey(0), 64, steps=4,
                       x_T=eps).x - ref) ** 2)))
        g_student, g_teacher = gap(student), gap(teacher)
        assert g_student < g_teacher * 0.8, (g_student, g_teacher)


class TestProgressiveCLI:
    def test_train_distill_infer_roundtrip(self, tmp_path):
        from eo_diffusion_tpu.cli import distill as distill_cli
        from eo_diffusion_tpu.cli import inference as infer_cli
        from eo_diffusion_tpu.cli import train as train_cli

        cwd = os.getcwd()
        os.chdir(str(tmp_path))
        try:
            train_cli.main(train_cli.parse_args([
                "--preset", "tiny", "--epochs", "1",
                "--steps_per_epoch", "3", "--batch_size", "8",
                "--dir", "res_pd", "--sample_every", "100",
                "--save_every", "3", "--log_freq", "1", "--n_samples", "4",
            ]))
            ckpt_root = os.path.join(str(tmp_path), "logs", "res_pd")
            steps = sorted(d for d in os.listdir(ckpt_root)
                           if d.startswith("steps_"))
            teacher_ckpt = os.path.join(ckpt_root, steps[-1])

            outdir = str(tmp_path / "pd")
            results = distill_cli.main(distill_cli.parse_args([
                "--preset", "tiny", "--method", "progressive",
                "--ckpt", teacher_ckpt, "--dir", outdir,
                "--pd_base_steps", "8", "--pd_rounds", "2",
                "--n_pairs", "32", "--pair_steps", "4", "--steps", "5",
                "--batch_size", "16", "--eval_n", "8",
                "--few_steps", "2", "--no_bf16",
            ]))
            assert results["final_steps"] == 2
            assert np.isfinite(results["round2"]["pd2_gap"])
            assert os.path.isdir(os.path.join(outdir, "student"))

            infer_out = str(tmp_path / "infer_pd")
            infer_cli.main(infer_cli.parse_args([
                "--preset", "tiny", "--ckpt", os.path.join(outdir, "student"),
                "--sampler", "pd", "--sampler_steps", "2",
                "--save", "--samples_fid", "--n_iter", "0",
                "--batch_size", "4", "--outdir", infer_out,
            ]))
            assert os.listdir(os.path.join(infer_out, "samples_fid"))
        finally:
            os.chdir(cwd)

    def test_method_process_mismatch_rejected(self):
        from eo_diffusion_tpu.cli import distill as distill_cli

        with pytest.raises(AssertionError):
            distill_cli.main(distill_cli.parse_args([
                "--preset", "tiny-flow", "--method", "progressive",
                "--ckpt", "/nonexistent",
            ]))
