"""Flow-matching tests (diffusion/flow.py — beyond-reference objective).

Verifies the straight-line path algebra, that a trained velocity field
recovers a simple data distribution, Euler/Heun agreement, CFG guidance
shifting samples, and Trainer compatibility (train_loss surface).
"""


import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from eo_diffusion_tpu.diffusion.flow import FlowMatching


def _perfect_velocity(mu):
    """For data = delta(mu) the optimal velocity field is analytic:
    E[eps - x0 | x_t, t] with x0 = mu fixed => v = (x_t - mu) / t."""
    def fn(x, t_scaled, cond, y):
        t = (t_scaled / 1000.0)[:, None, None, None]
        return (x - mu) / jnp.maximum(t, 1e-4)
    return fn


class TestTrainLoss:
    def test_zero_for_perfect_model_at_known_t(self):
        fm = FlowMatching.create(image_size=4, in_channels=1)
        x0 = jnp.full((32, 4, 4, 1), 0.7)
        loss = fm.train_loss(_perfect_velocity(0.7), jax.random.PRNGKey(0), x0)
        # optimal field for a point mass is exact: loss ~ 0 (up to t clamp)
        assert float(loss) < 5e-3, float(loss)

    def test_loss_positive_for_wrong_model(self):
        fm = FlowMatching.create(image_size=4, in_channels=1)
        x0 = jnp.zeros((32, 4, 4, 1))
        loss = fm.train_loss(lambda x, t, c, y: jnp.zeros_like(x),
                             jax.random.PRNGKey(0), x0)
        # E||eps - x0||^2 = 1 for standard-normal eps and zero data
        assert 0.7 < float(loss) < 1.3

    def test_logit_normal_sampling_runs(self):
        fm = FlowMatching.create(image_size=4, in_channels=1,
                                 time_sampling="logit_normal")
        x0 = jnp.zeros((8, 4, 4, 1))
        loss = fm.train_loss(lambda x, t, c, y: jnp.zeros_like(x),
                             jax.random.PRNGKey(0), x0)
        assert np.isfinite(float(loss))


class TestSampling:
    def test_point_mass_recovered(self):
        """Integrating the exact velocity field for delta(mu) data must land
        every sample on mu regardless of the noise draw."""
        mu = 0.42
        fm = FlowMatching.create(image_size=4, in_channels=1)
        out = jax.jit(lambda r: fm.sample(
            _perfect_velocity(mu), r, 8, num_steps=64).x)(jax.random.PRNGKey(0))
        assert float(jnp.abs(out - mu).max()) < 0.05, float(jnp.abs(out - mu).max())

    def test_heun_beats_euler_at_same_steps(self):
        """On a curved field (Gaussian data, sigma != 1) Heun's 2nd-order
        update lands closer to the analytic marginal than Euler."""
        sigma = 0.3

        def v(x, t_scaled, cond, y):
            # optimal field for x0 ~ N(0, sigma^2): linear in x
            t = (t_scaled / 1000.0)[:, None, None, None]
            var = t**2 + (1 - t) ** 2 * sigma**2
            return (t - (1 - t) * sigma**2) * x / jnp.maximum(var, 1e-6)

        fm = FlowMatching.create(image_size=4, in_channels=1)
        rng = jax.random.PRNGKey(1)
        ref = fm.sample(v, rng, 64, num_steps=256).x  # near-exact
        eul = fm.sample(v, rng, 64, num_steps=6, method="euler").x
        heu = fm.sample(v, rng, 64, num_steps=6, method="heun").x
        e_err = float(jnp.abs(eul - ref).mean())
        h_err = float(jnp.abs(heu - ref).mean())
        assert h_err < e_err, (h_err, e_err)

    def test_log_every_frames(self):
        fm = FlowMatching.create(image_size=4, in_channels=1)
        out = fm.sample(_perfect_velocity(0.0), jax.random.PRNGKey(0), 2,
                        num_steps=8, log_every=4)
        assert out.intermediates.shape == (2, 2, 4, 4, 1)

    def test_cfg_shifts_samples(self):
        """Guidance over two conditional point masses: scale > 1 pushes
        samples past the conditional mean, away from the uncond one."""
        def v(x, t_scaled, cond, y):
            t = (t_scaled / 1000.0)[:, None, None, None]
            mu = cond[:, :1, :1, :1]  # per-sample target from cond channel
            return (x - mu) / jnp.maximum(t, 1e-4)

        fm = FlowMatching.create(image_size=4, in_channels=1, cond_type="concat")
        cond_c = jnp.full((8, 4, 4, 1), 1.0)
        cond_u = jnp.full((8, 4, 4, 1), 0.0)
        plain = fm.sample(v, jax.random.PRNGKey(0), 8, num_steps=32,
                          cond=cond_c).x
        guided = fm.sample(v, jax.random.PRNGKey(0), 8, num_steps=32,
                           cond=cond_c, uncond=cond_u, guidance_scale=2.0).x
        assert float(plain.mean()) < float(guided.mean())

    def test_inpainting_keeps_known_region(self):
        """RePaint-style mask/x0 on the flow path: the known half must be
        exactly x0 (final paste), the free half must still integrate to the
        field's target."""
        mu = 0.5
        fm = FlowMatching.create(image_size=4, in_channels=1)
        x0 = jnp.full((4, 4, 4, 1), -0.9)
        mask = jnp.zeros((4, 4, 4, 1)).at[:, :2].set(1.0)  # top half known
        out = fm.sample(_perfect_velocity(mu), jax.random.PRNGKey(0), 4,
                        num_steps=32, mask=mask, x0=x0).x
        np.testing.assert_array_equal(np.asarray(out[:, :2]),
                                      np.asarray(x0[:, :2]))
        assert float(jnp.abs(out[:, 2:] - mu).max()) < 0.1

    def test_inpainting_requires_x0(self):
        fm = FlowMatching.create(image_size=4, in_channels=1)
        with pytest.raises(AssertionError, match="x0"):
            fm.sample(_perfect_velocity(0.0), jax.random.PRNGKey(0), 2,
                      num_steps=4, mask=jnp.ones((2, 4, 4, 1)))

    def test_stateful_model_hook(self):
        calls = {"n": 0}

        def v(x, t_scaled, cond, y, st, i):
            t = (t_scaled / 1000.0)[:, None, None, None]
            return x / jnp.maximum(t, 1e-4), st + 1

        fm = FlowMatching.create(image_size=4, in_channels=1)
        out = fm.sample(v, jax.random.PRNGKey(0), 2, num_steps=8,
                        model_state=jnp.zeros((), jnp.int32))
        assert out.x.shape == (2, 4, 4, 1)


class TestEndToEnd:
    def test_tiny_unet_learns_flow(self):
        """FlowMatching + the real UNet through make_train_step: loss must
        drop and samples must move toward the data statistics."""
        from eo_diffusion_tpu.models.unet import UNet, UNetConfig
        from eo_diffusion_tpu.train.trainer import TrainState, make_train_step

        ucfg = UNetConfig(image_size=8, in_channels=1, model_channels=16,
                          out_channels=1, num_res_blocks=1,
                          attention_resolutions=(), channel_mult=(1, 2))
        model = UNet(ucfg)
        fm = FlowMatching.create(image_size=8, in_channels=1)
        data = jnp.tile(jnp.linspace(-0.8, 0.8, 8)[None, :, None, None],
                        (16, 1, 8, 1))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), data[:1],
                                     jnp.zeros((1,), jnp.int32))
        tx = optax.adam(2e-3)
        state = TrainState.create(params, tx)
        apply_fn = (lambda p, x, t, cond=None, y=None, train=False,
                    dropout_rng=None: model.apply(p, x, t, cond=cond, y=y))
        step = jax.jit(make_train_step(fm, apply_fn, tx, ema_decay=0.9,
                                       ema_every=1))
        losses = []
        for i in range(40):
            state, metrics = step(state, {"image": data}, jax.random.PRNGKey(i))
            losses.append(float(metrics["loss"]))
        assert np.mean(losses[-5:]) < 0.6 * np.mean(losses[:5]), (
            np.mean(losses[:5]), np.mean(losses[-5:]))
