"""EncoderUNet classifier, AttentionPool, SuperRes UNet, and classifier-guided
sampling tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eo_diffusion_tpu.diffusion.classifier_guidance import classifier_guided
from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
from eo_diffusion_tpu.models.encoder_unet import (
    AttentionPool2d,
    EncoderUNet,
    EncoderUNetConfig,
    SuperResUNet,
)
from eo_diffusion_tpu.models.unet import UNetConfig

SIZE = 8


class TestEncoderUNet:
    def _model(self):
        cfg = EncoderUNetConfig(
            image_size=SIZE, in_channels=3, model_channels=32, num_classes=5,
            num_res_blocks=1, channel_mult=(1, 2), num_heads=4,
        )
        model = EncoderUNet(cfg)
        x = jnp.zeros((2, SIZE, SIZE, 3))
        t = jnp.zeros((2,), jnp.int32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t)
        return model, params, x, t

    def test_logits_shape(self):
        model, params, x, t = self._model()
        logits = model.apply(params, x, t)
        assert logits.shape == (2, 5)
        assert logits.dtype == jnp.float32

    def test_trains_as_classifier(self):
        model, params, x, t = self._model()

        def loss(p, x, y, t):
            logits = model.apply(p, x, t)
            return -jnp.mean(
                jnp.take_along_axis(jax.nn.log_softmax(logits), y[:, None], 1)
            )

        g = jax.grad(loss)(params, jnp.ones((2, SIZE, SIZE, 3)), jnp.asarray([0, 3]), t)
        assert max(float(jnp.abs(l).max()) for l in jax.tree.leaves(g)) > 0


class TestAttentionPool:
    def test_permutation_sensitivity(self):
        pool = AttentionPool2d(num_heads=4, out_features=6)
        x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 4, 4, 32)), jnp.float32)
        params = pool.init(jax.random.PRNGKey(0), x)
        out = pool.apply(params, x)
        assert out.shape == (1, 6)
        # positional embedding makes the pool order-aware
        out2 = pool.apply(params, x[:, ::-1])
        assert not np.allclose(np.asarray(out), np.asarray(out2))


class TestSuperRes:
    def test_lowres_concat(self):
        inner = UNetConfig(
            image_size=SIZE, in_channels=6, model_channels=32, out_channels=3,
            num_res_blocks=1, attention_resolutions=(), channel_mult=(1, 2),
        )
        model = SuperResUNet(inner)
        x = jnp.zeros((2, SIZE, SIZE, 3))
        low = jnp.zeros((2, SIZE // 2, SIZE // 2, 3))
        t = jnp.zeros((2,), jnp.int32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, low_res=low)
        out = model.apply(params, x, t, low_res=low)
        assert out.shape == x.shape

    def test_requires_lowres(self):
        inner = UNetConfig(
            image_size=SIZE, in_channels=6, model_channels=32, out_channels=3,
            num_res_blocks=1, attention_resolutions=(), channel_mult=(1,),
        )
        model = SuperResUNet(inner)
        with pytest.raises(AssertionError):
            jax.eval_shape(model.init, jax.random.PRNGKey(0),
                           jnp.zeros((1, SIZE, SIZE, 3)), jnp.zeros((1,), jnp.int32))


class TestClassifierGuidance:
    def test_guidance_shifts_eps(self):
        d = GaussianDiffusion.create(timesteps=50, image_size=SIZE, in_channels=3)
        base = lambda x, t, c, y: jnp.zeros_like(x)

        # classifier preferring bright images for class 1: logit_1 = mean(x)
        def clf(x, t):
            m = jnp.mean(x, axis=(1, 2, 3))
            return jnp.stack([-m, m], axis=-1)

        y = jnp.asarray([1, 1])
        guided = classifier_guided(d, base, clf, y, scale=5.0)
        x = jnp.zeros((2, SIZE, SIZE, 3))
        t = jnp.asarray([10, 10])
        eps = guided(x, t, None, None)
        # positive grad of log p(1|x) wrt x => eps shifted negative => x0 up
        assert float(eps.mean()) < 0

    def test_zero_scale_identity(self):
        d = GaussianDiffusion.create(timesteps=50, image_size=SIZE, in_channels=3)
        base = lambda x, t, c, y: 0.3 * x
        clf = lambda x, t: jnp.zeros((x.shape[0], 2))
        guided = classifier_guided(d, base, clf, jnp.asarray([0]), scale=0.0)
        x = jnp.ones((1, SIZE, SIZE, 3))
        t = jnp.asarray([5])
        np.testing.assert_allclose(
            np.asarray(guided(x, t, None, None)), np.asarray(base(x, t, None, None)),
            atol=1e-6,
        )

    def test_samples_with_guidance(self):
        d = GaussianDiffusion.create(timesteps=20, image_size=SIZE, in_channels=3)
        base = lambda x, t, c, y: jnp.zeros_like(x)

        def clf(x, t):
            m = jnp.mean(x, axis=(1, 2, 3))
            return jnp.stack([-m, m], axis=-1)

        guided = classifier_guided(d, base, clf, jnp.asarray([1, 1]), scale=10.0)
        plain = d.ddpm_sample(base, jax.random.PRNGKey(0), 2).x
        steered = d.ddpm_sample(guided, jax.random.PRNGKey(0), 2).x
        # class-1 guidance (brightness) must raise the sample mean
        assert float(steered.mean()) > float(plain.mean())
