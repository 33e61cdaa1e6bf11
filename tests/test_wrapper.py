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
            ConditioningWrapper(model, "crossattn")


class TestPublicAPI:
    def test_lazy_exports(self):
        import eo_diffusion_tpu as pkg

        assert pkg.GaussianDiffusion is not None
        assert pkg.UNet is not None
        assert "Trainer" in dir(pkg)
        with pytest.raises(AttributeError):
            pkg.nonexistent_symbol
