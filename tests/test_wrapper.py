"""ConditioningWrapper dispatch tests + public API surface."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eo_diffusion_tpu.models.unet import UNet, UNetConfig
from eo_diffusion_tpu.models.wrapper import ConditioningWrapper

SIZE = 8


def _setup(num_classes=None, in_ch=3):
    cfg = UNetConfig(image_size=SIZE, in_channels=in_ch, model_channels=32,
                     out_channels=3, num_res_blocks=1, attention_resolutions=(),
                     channel_mult=(1,), num_classes=num_classes)
    model = UNet(cfg)
    kwargs = {}
    if num_classes:
        kwargs["y"] = jnp.zeros((1,), jnp.int32)
    if in_ch > 3:
        kwargs["cond"] = jnp.zeros((1, SIZE, SIZE, in_ch - 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, SIZE, SIZE, 3)),
                                 jnp.zeros((1,), jnp.int32), **kwargs)
    return model, params


class TestConditioningWrapper:
    def test_none(self):
        model, params = _setup()
        w = ConditioningWrapper(model, None)
        out = w(params, jnp.zeros((2, SIZE, SIZE, 3)), jnp.zeros((2,), jnp.int32))
        assert out.shape == (2, SIZE, SIZE, 3)

    def test_concat_list(self):
        model, params = _setup(in_ch=7)
        w = ConditioningWrapper(model, "concat")
        conditioning = {"c_concat": [jnp.zeros((2, SIZE, SIZE, 3)), jnp.zeros((2, SIZE, SIZE, 1))]}
        out = w(params, jnp.zeros((2, SIZE, SIZE, 3)), jnp.zeros((2,), jnp.int32), conditioning)
        assert out.shape == (2, SIZE, SIZE, 3)

    def test_adm(self):
        model, params = _setup(num_classes=5)
        w = ConditioningWrapper(model, "adm")
        out = w(params, jnp.zeros((2, SIZE, SIZE, 3)), jnp.zeros((2,), jnp.int32),
                {"c_adm": jnp.asarray([0, 4])})
        assert out.shape == (2, SIZE, SIZE, 3)

    def test_hybrid(self):
        model, params = _setup(num_classes=5, in_ch=7)
        w = ConditioningWrapper(model, "hybrid")
        out = w(params, jnp.zeros((2, SIZE, SIZE, 3)), jnp.zeros((2,), jnp.int32),
                {"c_concat": jnp.zeros((2, SIZE, SIZE, 4)), "c_adm": jnp.asarray([1, 2])})
        assert out.shape == (2, SIZE, SIZE, 3)

    def test_unknown_key_rejected(self):
        model, params = _setup()
        with pytest.raises(AssertionError):
            ConditioningWrapper(model, "nonsense")

    def _ctx_model(self):
        cfg = UNetConfig(image_size=SIZE, in_channels=3, model_channels=32,
                         out_channels=3, num_res_blocks=1,
                         attention_resolutions=(1,), channel_mult=(1,),
                         num_heads=4, context_dim=16)
        model = UNet(cfg)
        ctx = jnp.zeros((2, 5, 16))
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, SIZE, SIZE, 3)),
                                     jnp.zeros((1,), jnp.int32),
                                     context=ctx[:1])
        # give the zero-init cross-attn output proj real weights so the
        # context actually modulates the forward
        params = jax.tree.map(
            lambda p: jnp.asarray(np.random.default_rng(0).normal(0, 0.05, p.shape), p.dtype),
            params)
        return model, params, ctx

    def test_crossattn_routes_context(self):
        # reference model_pl.py:202-204: cc = cat(c_crossattn, 1) -> context
        model, params, ctx = self._ctx_model()
        w = ConditioningWrapper(model, "crossattn")
        x = jnp.asarray(np.random.default_rng(1).normal(size=(2, SIZE, SIZE, 3)), jnp.float32)
        t = jnp.zeros((2,), jnp.int32)
        a = w(params, x, t, {"c_crossattn": ctx})
        b = w(params, x, t, {"c_crossattn": ctx + 1.0})
        assert a.shape == x.shape
        # a context-conditioned forward differs when the context changes
        assert not np.allclose(np.asarray(a), np.asarray(b))

    def test_crossattn_token_axis_concat(self):
        model, params, ctx = self._ctx_model()
        w = ConditioningWrapper(model, "crossattn")
        x = jnp.zeros((2, SIZE, SIZE, 3))
        t = jnp.zeros((2,), jnp.int32)
        split = [ctx[:, :2], ctx[:, 2:]]
        a = w(params, x, t, {"c_crossattn": ctx})
        b = w(params, x, t, {"c_crossattn": split})
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_hybrid_concat_plus_crossattn(self):
        # reference model_pl.py:205-208: hybrid = channel-concat + context
        cfg = UNetConfig(image_size=SIZE, in_channels=7, model_channels=32,
                         out_channels=3, num_res_blocks=1,
                         attention_resolutions=(1,), channel_mult=(1,),
                         num_heads=4, context_dim=16)
        model = UNet(cfg)
        ctx = jnp.zeros((2, 5, 16))
        cond = jnp.zeros((2, SIZE, SIZE, 4))
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, SIZE, SIZE, 3)),
                                     jnp.zeros((1,), jnp.int32),
                                     cond=cond[:1], context=ctx[:1])
        w = ConditioningWrapper(model, "hybrid")
        out = w(params, jnp.zeros((2, SIZE, SIZE, 3)), jnp.zeros((2,), jnp.int32),
                {"c_concat": cond, "c_crossattn": ctx})
        assert out.shape == (2, SIZE, SIZE, 3)


class TestPublicAPI:
    def test_lazy_exports(self):
        import eo_diffusion_tpu as pkg

        assert pkg.GaussianDiffusion is not None
        assert pkg.UNet is not None
        assert "Trainer" in dir(pkg)
        with pytest.raises(AttributeError):
            pkg.nonexistent_symbol


class TestCrossAttention:
    def _model(self):
        cfg = UNetConfig(image_size=SIZE, in_channels=3, model_channels=32,
                         out_channels=3, num_res_blocks=1, attention_resolutions=(1,),
                         channel_mult=(1,), num_heads=4, context_dim=16)
        model = UNet(cfg)
        x = jnp.zeros((2, SIZE, SIZE, 3))
        t = jnp.zeros((2,), jnp.int32)
        ctx = jnp.zeros((2, 5, 16))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, context=ctx)
        return model, params, x, t, ctx

    def test_forward_with_context(self):
        model, params, x, t, ctx = self._model()
        out = model.apply(params, x, t, context=ctx)
        assert out.shape == x.shape

    def test_context_required_iff_configured(self):
        model, params, x, t, ctx = self._model()
        with pytest.raises(AssertionError):
            model.apply(params, x, t)  # missing context

    def test_zero_init_identity(self):
        # fresh cross-attn params: output must be identical to a context of
        # any value (zero-init proj_out makes the block an identity)
        model, params, x, t, ctx = self._model()
        xr = jnp.asarray(np.random.default_rng(0).normal(size=x.shape), jnp.float32)
        a = model.apply(params, xr, t, context=ctx)
        b = model.apply(params, xr, t, context=ctx + 100.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_context_modulates_after_training_signal(self):
        # give proj_out nonzero weights: different contexts now differ
        model, params, x, t, ctx = self._model()
        params = jax.tree.map(
            lambda p: jnp.asarray(np.random.default_rng(0).normal(0, 0.05, p.shape), p.dtype),
            params)
        xr = jnp.asarray(np.random.default_rng(1).normal(size=x.shape), jnp.float32)
        a = model.apply(params, xr, t, context=ctx)
        b = model.apply(params, xr, t, context=ctx + 1.0)
        assert not np.allclose(np.asarray(a), np.asarray(b))
