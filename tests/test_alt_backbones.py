"""Alternative backbone tests: TinyUNet (MNIST), ConvNextUNet, SpadeUNet --
shapes, conditioning semantics, and train-loss integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
from eo_diffusion_tpu.models.unet_convnext import ConvNextUNet, ConvNextUNetConfig
from eo_diffusion_tpu.models.unet_spade import SpadeUNet, SpadeUNetConfig
from eo_diffusion_tpu.models.unet_tiny import TinyUNet, TinyUNetConfig


class TestTinyUNet:
    def _model(self, size=16, base=32):
        cfg = TinyUNetConfig(timesteps=100, time_embedding_dim=64, in_channels=1,
                             out_channels=1, base_dim=base, dim_mults=(2, 4))
        model = TinyUNet(cfg)
        x = jnp.zeros((2, size, size, 1))
        t = jnp.zeros((2,), jnp.int32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t)
        return model, params, x, t

    def test_mnist_shape(self):
        # 28px MNIST config (BASELINE.json config 1) -- pad to 32 for the
        # 2-level stride pyramid? reference runs 28 directly via bilinear.
        model, params, x, t = self._model(size=28)
        out = model.apply(params, x, t)
        assert out.shape == (2, 28, 28, 1)

    def test_even_size(self):
        model, params, x, t = self._model(size=16)
        out = model.apply(params, x, t)
        assert out.shape == x.shape

    def test_trains(self):
        cfg = TinyUNetConfig(timesteps=20, in_channels=1, out_channels=1,
                             base_dim=16, dim_mults=(2,))
        model = TinyUNet(cfg)
        d = GaussianDiffusion.create(timesteps=20, image_size=8, in_channels=1)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 1)),
                                     jnp.zeros((1,), jnp.int32))

        def loss(p, rng):
            fn = lambda x, t, c, y: model.apply(p, x, t)
            return d.train_loss(fn, rng, jnp.ones((4, 8, 8, 1)) * 0.5)

        g = jax.grad(loss)(params, jax.random.PRNGKey(0))
        norms = [float(jnp.abs(x).max()) for x in jax.tree.leaves(g)]
        assert max(norms) > 0 and all(np.isfinite(n) for n in norms)


class TestConvNextUNet:
    def _model(self, **kw):
        cfg = ConvNextUNetConfig(dim=16, dim_mults=(1, 2), channels=3, **kw)
        model = ConvNextUNet(cfg)
        x = jnp.zeros((2, 16, 16, 3))
        t = jnp.zeros((2,), jnp.int32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t)
        return model, params, x, t

    def test_shape(self):
        model, params, x, t = self._model()
        assert model.apply(params, x, t).shape == x.shape

    def test_residual_mode(self):
        model, params, x, t = self._model(residual=True)
        xr = jnp.ones_like(x)
        out = model.apply(params, xr, t)
        assert out.shape == xr.shape

    def test_residual_mode_with_cond(self):
        """residual=True must add the PRE-concat input (the old capture
        point was after the cond concat -> 6-channel orig_x vs 3-channel
        out, a broadcast shape error)."""
        cfg = ConvNextUNetConfig(dim=16, dim_mults=(1, 2), channels=3,
                                 residual=True)
        model = ConvNextUNet(cfg)
        x = jnp.ones((2, 16, 16, 3))
        c = jnp.zeros((2, 16, 16, 3))
        t = jnp.zeros((2,), jnp.int32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, cond=c)
        out = model.apply(params, x, t, cond=c)
        assert out.shape == x.shape

    def test_output_mean_scale(self):
        model, params, x, t = self._model(output_mean_scale=True)
        xr = jnp.full_like(x, 0.7)
        out = np.asarray(model.apply(params, xr, t))
        assert np.isfinite(out).all()

    def test_no_time_emb(self):
        cfg = ConvNextUNetConfig(dim=16, dim_mults=(1, 2), channels=3, with_time_emb=False)
        model = ConvNextUNet(cfg)
        x = jnp.zeros((1, 16, 16, 3))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x, None)
        assert model.apply(params, x, None).shape == x.shape


class TestSpadeUNet:
    def _model(self, attn=()):
        cfg = SpadeUNetConfig(image_size=16, in_channels=3, model_channels=32,
                              out_channels=3, label_channels=4, num_res_blocks=1,
                              channel_mult=(1, 2), attention_resolutions=attn,
                              num_heads=4, spade_hidden=32)
        model = SpadeUNet(cfg)
        x = jnp.zeros((2, 16, 16, 3))
        t = jnp.zeros((2,), jnp.int32)
        seg = jnp.zeros((2, 16, 16, 4))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, cond=seg)
        return model, params, x, t, seg

    def test_shape(self):
        model, params, x, t, seg = self._model()
        assert model.apply(params, x, t, cond=seg).shape == x.shape

    def test_with_attention(self):
        model, params, x, t, seg = self._model(attn=(2,))
        assert model.apply(params, x, t, cond=seg).shape == x.shape

    def test_requires_segmap(self):
        model, params, x, t, seg = self._model()
        with pytest.raises(AssertionError):
            model.apply(params, x, t)

    def test_segmap_modulates_output(self):
        # different segmaps must produce different outputs (SPADE is the
        # only conditioning path)
        model, params, x, t, seg = self._model()
        params = jax.tree.map(
            lambda p: jnp.asarray(np.random.default_rng(0).normal(0, 0.05, p.shape), p.dtype),
            params)
        xr = jnp.asarray(np.random.default_rng(1).normal(size=x.shape), jnp.float32)
        seg_a = jnp.zeros_like(seg).at[..., 0].set(1.0)
        seg_b = jnp.zeros_like(seg).at[..., 2].set(1.0)
        out_a = model.apply(params, xr, t, cond=seg_a)
        out_b = model.apply(params, xr, t, cond=seg_b)
        assert not np.allclose(np.asarray(out_a), np.asarray(out_b))

    def test_sampling_integration(self):
        model, params, x, t, seg = self._model()
        d = GaussianDiffusion.create(timesteps=10, image_size=16, in_channels=3)
        fn = lambda xx, tt, c, y: model.apply(params, xx, tt, cond=seg)
        out = d.ddim_sample(fn, jax.random.PRNGKey(0), 2, num_steps=5)
        assert out.x.shape == (2, 16, 16, 3)
