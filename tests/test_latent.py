"""Autoencoder + latent-diffusion tests."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
from eo_diffusion_tpu.diffusion.latent import LatentDiffusion
from eo_diffusion_tpu.models.autoencoder import AutoencoderConfig, ConvAutoencoder

SIZE = 16


@pytest.fixture(scope="module")
def ae():
    cfg = AutoencoderConfig(in_channels=3, latent_channels=4, base_channels=16, num_down=2)
    model = ConvAutoencoder(cfg)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)))
    return model, params


class TestAutoencoder:
    def test_shapes(self, ae):
        model, params = ae
        x = jnp.zeros((2, SIZE, SIZE, 3))
        z = model.apply(params, x, method="encode")
        assert z.shape == (2, SIZE // 4, SIZE // 4, 4)
        rec = model.apply(params, z, method="decode")
        assert rec.shape == x.shape
        full = model.apply(params, x)
        assert full.shape == x.shape

    def test_reconstruction_trains(self, ae):
        model, params = ae
        tx = optax.adam(2e-3)
        opt = tx.init(params)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.uniform(0, 1, (8, SIZE, SIZE, 3)), jnp.float32)

        @jax.jit
        def step(params, opt):
            def loss(p):
                return jnp.mean((model.apply(p, x) - x) ** 2)

            l, g = jax.value_and_grad(loss)(params)
            up, opt = tx.update(g, opt, params)
            return optax.apply_updates(params, up), opt, l

        l0 = None
        for i in range(60):
            params, opt, l = step(params, opt)
            if i == 0:
                l0 = float(l)
        assert float(l) < l0 * 0.5


class TestLatentDiffusion:
    def _latent(self, ae):
        model, params = ae
        inner = GaussianDiffusion.create(timesteps=20, image_size=SIZE // 4, in_channels=4)
        return LatentDiffusion(
            diffusion=inner,
            encode_fn=lambda x: model.apply(params, x, method="encode"),
            decode_fn=lambda z: model.apply(params, z, method="decode"),
            scale_factor=0.5,
        )

    def test_train_loss_in_latent_space(self, ae):
        ld = self._latent(ae)
        shapes = []

        def spy(z, t, c, y):
            shapes.append(z.shape)
            return jnp.zeros_like(z)

        loss = ld.train_loss(spy, jax.random.PRNGKey(0), jnp.zeros((4, SIZE, SIZE, 3)))
        assert shapes[0] == (4, SIZE // 4, SIZE // 4, 4)
        assert np.isfinite(float(loss))

    def test_sample_decodes_to_pixels(self, ae):
        ld = self._latent(ae)
        model = lambda z, t, c, y: jnp.zeros_like(z)
        out = ld.ddim_sample(model, jax.random.PRNGKey(0), 2, num_steps=5)
        assert out.x.shape == (2, SIZE, SIZE, 3)
        out2 = ld.ddpm_sample(model, jax.random.PRNGKey(0), 2)
        assert out2.x.shape == (2, SIZE, SIZE, 3)

    def test_encode_cond_path(self, ae):
        ld = self._latent(ae)
        chans = []

        def spy(z, t, c, y):
            chans.append(None if c is None else c.shape)
            return jnp.zeros_like(z)

        cond = jnp.zeros((2, SIZE, SIZE, 3))
        ld.ddim_sample(spy, jax.random.PRNGKey(0), 2, num_steps=2,
                       cond=cond, encode_cond=True)
        assert chans[0] == (2, SIZE // 4, SIZE // 4, 4)

    def test_scale_factor_roundtrip(self, ae):
        ld = self._latent(ae)
        x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, SIZE, SIZE, 3)), jnp.float32)
        z = ld.encode(x)
        rec = ld.decode(z)
        assert rec.shape == x.shape
