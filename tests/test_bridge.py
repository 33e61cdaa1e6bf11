"""Brownian-bridge diffusion (BBDM, arXiv:2205.07680) tests: marginal
endpoint identities, the residual-target decomposition, oracle-exact
posterior recursion, a trained paired-translation check, and the CLI
train -> infer round trip on the tiny-bridge preset."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eo_diffusion_tpu.diffusion.bridge import BrownianBridge

SIZE, CH, T = 8, 3, 50


def make_bridge(**kw):
    kw.setdefault("timesteps", T)
    return BrownianBridge.create(image_size=SIZE, in_channels=CH, **kw)


def pair(n=4, seed=0):
    rng = np.random.default_rng(seed)
    x0 = rng.uniform(-0.8, 0.8, (n, SIZE, SIZE, CH)).astype(np.float32)
    y = rng.uniform(-0.8, 0.8, (n, SIZE, SIZE, CH)).astype(np.float32)
    return jnp.asarray(x0), jnp.asarray(y)


class TestBridgeProcess:
    def test_marginal_endpoints(self):
        b = make_bridge()
        x0, y = pair()
        eps = jnp.ones_like(x0) * 5.0  # huge noise must be killed at ends
        t0 = jnp.zeros((4,), jnp.int32)
        tT = jnp.full((4,), T - 1, jnp.int32)
        np.testing.assert_allclose(np.asarray(b.marginal(x0, y, t0, eps)),
                                   np.asarray(x0), atol=1e-5)
        np.testing.assert_allclose(np.asarray(b.marginal(x0, y, tT, eps)),
                                   np.asarray(y), atol=1e-5)

    def test_variance_peak_at_midpoint(self):
        b = make_bridge(max_var=2.0)
        m = jnp.asarray([0.0, 0.5, 1.0])
        d = np.asarray(b._delta(m))
        np.testing.assert_allclose(d, [0.0, 1.0, 0.0], atol=1e-6)

    def test_target_decomposition_recovers_x0(self):
        # x_t - target == x0 exactly: the sampler's x0_hat identity
        b = make_bridge()
        x0, y = pair()
        x_t, t, target = b.training_tuple(jax.random.PRNGKey(0), x0, cond=y)
        np.testing.assert_allclose(np.asarray(x_t - target), np.asarray(x0),
                                   atol=1e-5)
        assert t.min() >= 1 and t.max() <= T - 1

    def test_train_loss_zero_for_oracle(self):
        b = make_bridge()
        x0, y = pair()
        oracle = lambda x, t, c, yy: x - x0  # exact residual predictor
        loss = b.train_loss(oracle, jax.random.PRNGKey(1), x0, cond=y)
        assert float(loss) < 1e-10

    @pytest.mark.parametrize("eta", [0.0, 1.0])
    def test_oracle_sampling_returns_target(self, eta):
        # with the exact residual model the deterministic path lands on x0
        # exactly; the stochastic path still contracts onto it (var -> 0)
        b = make_bridge()
        x0, y = pair(n=2)
        oracle = lambda x, t, c, yy: x - x0
        out = b.sample(oracle, jax.random.PRNGKey(2), 2, num_steps=10,
                       cond=y, clip=False, eta=eta)
        np.testing.assert_allclose(np.asarray(out.x), np.asarray(x0),
                                   atol=1e-4 if eta == 0.0 else 0.05)

    def test_sampling_starts_at_source(self):
        # a zero model never moves the prediction off x_t; with one step the
        # result is pinned to the x0_hat = x_t - 0 chain seeded at y
        b = make_bridge()
        _, y = pair(n=2)
        zero = lambda x, t, c, yy: jnp.zeros_like(x)
        out = b.sample(zero, jax.random.PRNGKey(3), 2, num_steps=1,
                       cond=y, clip=False)
        np.testing.assert_allclose(np.asarray(out.x), np.asarray(y), atol=1e-5)

    def test_jit_and_log_every(self):
        b = make_bridge()
        x0, y = pair(n=1)

        def run(k):
            out = b.sample(lambda x, t, c, yy: x - x0, k, 1, num_steps=9,
                           cond=y, log_every=4)
            return out.x, out.intermediates

        x, frames = jax.jit(run)(jax.random.PRNGKey(0))
        assert frames.shape[0] == 3  # ceil(9/4)
        assert np.isfinite(np.asarray(x)).all()

    def test_cond_required(self):
        b = make_bridge()
        x0, _ = pair(n=1)
        with pytest.raises(AssertionError):
            b.train_loss(lambda *a: x0, jax.random.PRNGKey(0), x0)
        with pytest.raises(AssertionError):
            b.sample(lambda *a: x0, jax.random.PRNGKey(0), 1)


class TestBridgeLearns:
    def test_translation_beats_identity(self):
        """A tiny UNet trained on an analytic pair (target = spatially
        flipped, sign-inverted source) must translate held-out sources
        closer to the target than the source itself is."""
        import optax

        from eo_diffusion_tpu.models.unet import UNet, UNetConfig

        b = make_bridge()
        ucfg = UNetConfig(image_size=SIZE, in_channels=2 * CH,
                          model_channels=16, out_channels=CH,
                          num_res_blocks=1, attention_resolutions=(),
                          channel_mult=(1, 2), num_heads=1,
                          dtype=jnp.float32)
        unet = UNet(ucfg)

        def make_batch(seed, n=16):
            rng = np.random.default_rng(seed)
            y = rng.uniform(-0.7, 0.7, (n, SIZE, SIZE, CH)).astype(np.float32)
            x0 = -y[:, ::-1]  # deterministic domain map
            return jnp.asarray(x0), jnp.asarray(y)

        x0b, yb = make_batch(0)
        params = jax.jit(unet.init)(jax.random.PRNGKey(0), x0b,
                                    jnp.zeros((16,), jnp.int32), cond=yb)
        tx = optax.adam(2e-3)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt, rng, x0, y):
            fn = lambda p: b.train_loss(
                lambda xx, tt, cc, yy: unet.apply(p, xx, tt, cond=cc),
                rng, x0, cond=y)
            loss, g = jax.value_and_grad(fn)(params)
            up, opt = tx.update(g, opt)
            return optax.apply_updates(params, up), opt, loss

        rng = jax.random.PRNGKey(1)
        first = None
        for i in range(120):
            rng, k = jax.random.split(rng)
            x0b, yb = make_batch(i + 1)
            params, opt, loss = step(params, opt, k, x0b, yb)
            if first is None:
                first = float(loss)
        assert float(loss) < 0.5 * first, (first, float(loss))

        x0h, yh = make_batch(999, n=8)
        fn = lambda xx, tt, cc, yy: unet.apply(params, xx, tt, cond=cc)
        out = b.sample(fn, jax.random.PRNGKey(5), 8, num_steps=10,
                       cond=yh, eta=0.0)
        err_model = float(jnp.mean((out.x - x0h) ** 2))
        err_identity = float(jnp.mean((yh - x0h) ** 2))
        assert err_model < 0.5 * err_identity, (err_model, err_identity)


class TestBridgeCLI:
    @pytest.fixture(scope="class")
    def run_root(self, tmp_path_factory):
        return str(tmp_path_factory.mktemp("cli_bridge"))

    @pytest.fixture(scope="class")
    def bridge_ckpt(self, run_root):
        from eo_diffusion_tpu.cli import train as train_cli

        sample_dir = os.path.join(run_root, "results_bridge")
        cwd = os.getcwd()
        os.chdir(run_root)
        try:
            args = train_cli.parse_args([
                "--preset", "tiny-bridge", "--epochs", "1",
                "--steps_per_epoch", "3", "--batch_size", "8",
                "--lr", "2e-3", "--dir", sample_dir, "--sample_every", "2",
                "--save_every", "3", "--log_freq", "1", "--n_samples", "4",
            ])
            train_cli.main(args)
        finally:
            os.chdir(cwd)
        ckpt_root = os.path.join(run_root, "logs", "results_bridge")
        steps = sorted(d for d in os.listdir(ckpt_root)
                       if d.startswith("steps_"))
        assert steps, ckpt_root
        return os.path.join(ckpt_root, steps[-1])

    def test_preview_grid_written(self, bridge_ckpt, run_root):
        pngs = [f for f in os.listdir(os.path.join(run_root, "results_bridge"))
                if f.endswith(".png")]
        assert pngs, "bridge training produced no preview grid"

    def test_inference_roundtrip(self, bridge_ckpt, run_root):
        from eo_diffusion_tpu.cli import inference as infer_cli

        outdir = os.path.join(run_root, "infer_bridge")
        args = infer_cli.parse_args([
            "--preset", "tiny-bridge", "--ckpt", bridge_ckpt,
            "--sampler_steps", "6", "--metrics", "--save", "--samples_fid",
            "--n_iter", "0", "--batch_size", "4", "--outdir", outdir,
        ])
        infer_cli.main(args)
        assert os.path.exists(os.path.join(outdir, "metrics.txt"))
        assert os.listdir(os.path.join(outdir, "samples_fid"))


class TestLatentBridgeCLI:
    """Latent Brownian bridge (the BBDM paper's LBBDM variant): translation
    between ENCODED endpoints through the CLIs — first stage trained
    in-run, bridge posterior walked in latent space, pixels decoded."""

    def test_train_infer_roundtrip(self, tmp_path):
        from eo_diffusion_tpu.cli import inference as infer_cli
        from eo_diffusion_tpu.cli import train as train_cli

        sample_dir = os.path.join(str(tmp_path), "results_lbridge")
        cwd = os.getcwd()
        os.chdir(str(tmp_path))
        try:
            args = train_cli.parse_args([
                "--preset", "tiny-latent-bridge", "--epochs", "1",
                "--steps_per_epoch", "3", "--batch_size", "8",
                "--lr", "2e-3", "--dir", sample_dir, "--sample_every", "2",
                "--save_every", "3", "--log_freq", "1", "--n_samples", "4",
            ])
            train_cli.main(args)
        finally:
            os.chdir(cwd)
        ckpt_root = os.path.join(str(tmp_path), "logs", "results_lbridge")
        steps = sorted(d for d in os.listdir(ckpt_root)
                       if d.startswith("steps_"))
        assert steps, ckpt_root
        outdir = os.path.join(str(tmp_path), "infer_lbridge")
        args = infer_cli.parse_args([
            "--preset", "tiny-latent-bridge",
            "--ckpt", os.path.join(ckpt_root, steps[-1]),
            "--sampler_steps", "6", "--metrics", "--save", "--samples_fid",
            "--n_iter", "0", "--batch_size", "4", "--outdir", outdir,
        ])
        infer_cli.main(args)
        assert os.path.exists(os.path.join(outdir, "metrics.txt"))
        assert os.listdir(os.path.join(outdir, "samples_fid"))
