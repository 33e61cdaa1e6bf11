"""DDNM zero-shot restoration tests (diffusion/inverse.py + cli/restore.py).

Operator algebra is checked in closed form (A A+ = I on the range), the
projector's range/null-space split with an oracle denoiser, and the CLI
end-to-end on a trained tiny checkpoint for all three tasks.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eo_diffusion_tpu.diffusion import inverse as I
from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion

SIZE, CH = 8, 3


def _img(n=4, seed=0, size=SIZE, ch=CH):
    g = np.random.default_rng(seed)
    return jnp.asarray(g.uniform(-1, 1, (n, size, size, ch)), jnp.float32)


class TestOperators:
    @pytest.mark.parametrize("factor", [2, 4])
    def test_sr_right_inverse(self, factor):
        op = I.sr_operator(factor)
        y = _img(size=SIZE // factor)
        np.testing.assert_allclose(np.asarray(op.forward(op.pinv(y))),
                                   np.asarray(y), rtol=0, atol=1e-6)

    def test_sr_shapes(self):
        op = I.sr_operator(2)
        x = _img()
        assert op.forward(x).shape == (4, SIZE // 2, SIZE // 2, CH)
        assert op.pinv(op.forward(x)).shape == x.shape

    def test_gray_right_inverse(self):
        op = I.gray_operator(CH)
        y = _img(ch=1)
        np.testing.assert_allclose(np.asarray(op.forward(op.pinv(y))),
                                   np.asarray(y), rtol=0, atol=1e-6)

    def test_inpaint_right_inverse(self):
        g = np.random.default_rng(1)
        m = jnp.asarray((g.uniform(size=(4, SIZE, SIZE, 1)) > 0.5), jnp.float32)
        op = I.inpaint_operator(m)
        y = op.forward(_img())  # a valid observation (zeros off-mask)
        np.testing.assert_allclose(np.asarray(op.forward(op.pinv(y))),
                                   np.asarray(y), rtol=0, atol=1e-6)


class TestProjector:
    @pytest.mark.parametrize("make_op", [
        lambda: I.sr_operator(2),
        lambda: I.gray_operator(CH),
        lambda: I.inpaint_operator(
            jnp.asarray(np.random.default_rng(2).uniform(
                size=(4, SIZE, SIZE, 1)) > 0.5, jnp.float32)),
    ])
    def test_consistency_and_idempotence(self, make_op):
        op = make_op()
        gt, x = _img(seed=3), _img(seed=4)
        y = op.forward(gt)
        proj = I.ddnm_projector(op, y)
        px = proj(x)
        # range space replaced: A(proj(x)) = y for ANY x
        np.testing.assert_allclose(np.asarray(op.forward(px)), np.asarray(y),
                                   rtol=0, atol=1e-5)
        # idempotent (A A+ A = A)
        np.testing.assert_allclose(np.asarray(proj(px)), np.asarray(px),
                                   rtol=0, atol=1e-5)


class TestDDNMSample:
    def _oracle(self, diff, target):
        sa = jnp.asarray(diff.schedule.sqrt_alphas_cumprod)
        ss = jnp.asarray(diff.schedule.sqrt_one_minus_alphas_cumprod)

        def oracle(x, t, cond, y):
            a = sa[t][:, None, None, None]
            s = ss[t][:, None, None, None]
            return (x - a * target) / jnp.maximum(s, 1e-8)

        return oracle

    def test_range_exact_null_from_prior(self):
        """With a point-mass oracle the restored image must carry y in the
        range space EXACTLY and the oracle's target in the null space."""
        diff = GaussianDiffusion.create(timesteps=100, image_size=SIZE,
                                        in_channels=CH)
        target = jnp.asarray(
            np.random.default_rng(5).uniform(-0.6, 0.6, (4, SIZE, SIZE, CH)),
            jnp.float32)
        gt = _img(seed=6)
        op = I.sr_operator(2)
        y = op.forward(gt)
        out = I.ddnm_sample(diff, self._oracle(diff, target),
                            jax.random.PRNGKey(0), y, op,
                            num_steps=20, eta=0.0).x
        # data consistency exact (final paste)
        np.testing.assert_allclose(np.asarray(op.forward(out)), np.asarray(y),
                                   rtol=0, atol=1e-5)
        # null space follows the prior (residual eps floor as in SDEdit)
        null = lambda v: v - op.pinv(op.forward(v))
        err = float(jnp.mean(jnp.abs(null(out) - null(target))))
        assert err < 0.05, err

    def test_shape_mismatch_asserts(self):
        diff = GaussianDiffusion.create(timesteps=50, image_size=SIZE,
                                        in_channels=CH)
        op = I.sr_operator(2)
        bad_y = _img(size=SIZE)  # full-res "observation"
        with pytest.raises(AssertionError):
            I.ddnm_sample(diff, lambda x, t, c, y: jnp.zeros_like(x),
                          jax.random.PRNGKey(0), bad_y, op, num_steps=5)

    def test_jittable(self):
        diff = GaussianDiffusion.create(timesteps=50, image_size=SIZE,
                                        in_channels=CH)
        op = I.gray_operator(CH)
        y = op.forward(_img())

        @jax.jit
        def run(y, key):
            return I.ddnm_sample(diff, lambda x, t, c, yy: jnp.zeros_like(x),
                                 key, y, op, num_steps=5).x

        out = run(y, jax.random.PRNGKey(0))
        assert out.shape == (4, SIZE, SIZE, CH)
        assert np.isfinite(np.asarray(out)).all()


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from eo_diffusion_tpu.cli import train as train_cli

    root = tmp_path_factory.mktemp("restore_cli")
    sample_dir = str(root / "results")
    cwd = os.getcwd()
    os.chdir(str(root))
    try:
        train_cli.main(train_cli.parse_args([
            "--preset", "tiny", "--epochs", "1", "--steps_per_epoch", "3",
            "--batch_size", "8", "--dir", sample_dir, "--save_every", "3",
            "--sample_every", "100", "--log_freq", "2",
        ]))
    finally:
        os.chdir(cwd)
    ckpt_root = os.path.join(str(root), "logs", "results")
    steps = sorted(d for d in os.listdir(ckpt_root) if d.startswith("steps_"))
    return os.path.join(ckpt_root, steps[-1])


class TestRestoreCLI:
    @pytest.mark.parametrize("task", ["sr2", "inpaint", "colorize"])
    def test_roundtrip(self, trained, tmp_path, task):
        from eo_diffusion_tpu.cli import restore as restore_cli

        outdir = str(tmp_path / task)
        restore_cli.main(restore_cli.parse_args([
            "--preset", "tiny", "--ckpt", trained, "--task", task,
            "--sampler_steps", "5", "--batch_size", "4", "--metrics",
            "--save", "--n_iter", "0", "--outdir", outdir,
        ]))
        assert os.path.exists(os.path.join(outdir, "metrics.txt"))
        pngs = [f for f in os.listdir(outdir) if f.endswith(".png")]
        assert {f"{task}_0_gt.png", f"{task}_0_input.png",
                f"{task}_0_restored.png"} <= set(pngs)

    def test_ensemble_uncertainty(self, trained, tmp_path):
        """K stochastic members: std map saved + uncertainty/|error|
        correlation recorded in metrics.txt."""
        from eo_diffusion_tpu.cli import restore as restore_cli

        outdir = str(tmp_path / "ens")
        restore_cli.main(restore_cli.parse_args([
            "--preset", "tiny", "--ckpt", trained, "--task", "inpaint",
            "--sampler_steps", "4", "--batch_size", "4", "--metrics",
            "--save", "--n_iter", "0", "--ensemble", "3",
            "--outdir", outdir,
        ]))
        assert os.path.exists(os.path.join(outdir,
                                           "inpaint_0_uncertainty.png"))
        with open(os.path.join(outdir, "metrics.txt")) as f:
            txt = f.read()
        assert "unc_err_corr" in txt
        corr = float([ln for ln in txt.splitlines()
                      if ln.startswith("unc_err_corr")][0].split(":")[1])
        assert np.isfinite(corr) and -1.0 <= corr <= 1.0

    def test_ensemble_needs_eta(self, trained):
        from eo_diffusion_tpu.cli import restore as restore_cli

        with pytest.raises(AssertionError):
            restore_cli.main(restore_cli.parse_args([
                "--preset", "tiny", "--ckpt", trained, "--task", "sr2",
                "--ensemble", "2", "--eta", "0.0", "--n_iter", "0",
            ]))

    def test_latent_preset_rejected(self, trained):
        from eo_diffusion_tpu.cli import restore as restore_cli

        with pytest.raises(AssertionError):
            restore_cli.main(restore_cli.parse_args([
                "--preset", "tiny-latent", "--ckpt", trained,
                "--task", "sr2", "--n_iter", "0",
            ]))
