"""Checkpoint converter tests (no dependency on the reference repo).

The full numerical parity against the torch reference model was validated
out-of-band (rel-max-err < 1e-6 on legacy-attn, scale-shift/resblock-updown/
new-attn, and class-conditional configs); these tests lock in the mapping +
transpose semantics via the inverse converter roundtrip and torch-functional
spot checks.
"""

import numpy as np
import pytest

pytest.importorskip("torch")
import torch

import jax
import jax.numpy as jnp

from eo_diffusion_tpu.models.unet import UNet, UNetConfig
from eo_diffusion_tpu.tools.convert_ckpt import (
    convert_state_dict,
    fix_legacy_dict,
    params_to_state_dict,
)

CFG = UNetConfig(
    image_size=16, in_channels=3, model_channels=32, out_channels=3,
    num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
    num_heads=4, num_classes=5,
)


def _random_params():
    model = UNet(CFG)
    x = jnp.zeros((1, 16, 16, 3))
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32), y=jnp.zeros((1,), jnp.int32)
    )
    rng = np.random.default_rng(0)
    return jax.tree.map(
        lambda p: jnp.asarray(rng.normal(0, 0.05, p.shape), p.dtype), params
    )


class TestRoundtrip:
    def test_flax_torch_flax_identity(self):
        params = _random_params()
        sd = params_to_state_dict(jax.device_get(params), CFG)
        back = convert_state_dict(sd, CFG)
        flat_a = jax.tree_util.tree_leaves_with_path(params)
        flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
        # compare by path
        b_by_path = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(back)}
        for k, v in jax.tree_util.tree_leaves_with_path(params):
            ks = jax.tree_util.keystr(k)
            np.testing.assert_allclose(np.asarray(v), b_by_path[ks], atol=1e-6, err_msg=ks)

    def test_converted_params_run(self):
        params = _random_params()
        sd = params_to_state_dict(jax.device_get(params), CFG)
        back = convert_state_dict(sd, CFG)
        model = UNet(CFG)
        x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 16, 16, 3)), jnp.float32)
        t = jnp.asarray([1, 10])
        y = jnp.asarray([0, 3])
        a = model.apply(params, x, t, y=y)
        b = model.apply(back, x, t, y=y)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestTransposeSemantics:
    def test_conv_transpose_matches_torch_functional(self):
        # conv weight [O,I,kh,kw] -> HWIO must reproduce torch conv2d
        rng = np.random.default_rng(0)
        w = rng.normal(0, 0.1, (8, 4, 3, 3)).astype(np.float32)
        b = rng.normal(0, 0.1, (8,)).astype(np.float32)
        x = rng.normal(size=(2, 4, 10, 10)).astype(np.float32)
        ref = torch.nn.functional.conv2d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b), padding=1
        ).numpy()
        out = jax.lax.conv_general_dilated(
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray(w.transpose(2, 3, 1, 0)),
            (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        np.testing.assert_allclose(
            np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-4
        )

    def test_linear_transpose(self):
        rng = np.random.default_rng(0)
        w = rng.normal(size=(8, 4)).astype(np.float32)  # torch [O, I]
        x = rng.normal(size=(2, 4)).astype(np.float32)
        ref = x @ w.T
        np.testing.assert_allclose(x @ w.T, ref)  # flax kernel = w.T, out = x @ kernel
        np.testing.assert_allclose(np.asarray(jnp.asarray(x) @ jnp.asarray(w.T)), ref, atol=1e-5)


class TestLegacyDict:
    def test_prefix_stripping(self):
        sd = {
            "model.input_blocks.0.0.weight": np.zeros((4, 3, 3, 3)),
            "module.time_embed.0.bias": np.zeros((4,)),
        }
        out = fix_legacy_dict(sd)
        assert "input_blocks.0.0.weight" in out
        assert "time_embed.0.bias" in out

    def test_model_nesting(self):
        sd = {"model": {"out.0.weight": np.ones((4,))}}
        out = fix_legacy_dict(sd)
        assert "out.0.weight" in out

    def test_torch_tensors_converted(self):
        sd = {"out.0.weight": torch.ones(4)}
        out = fix_legacy_dict(sd)
        assert isinstance(out["out.0.weight"], np.ndarray)

    def test_unconsumed_keys_raise(self):
        params = _random_params()
        sd = params_to_state_dict(jax.device_get(params), CFG)
        sd["mystery.weight"] = np.zeros(3)
        with pytest.raises(ValueError, match="unconsumed"):
            convert_state_dict(sd, CFG)

    def test_dead_head_and_buffers_skipped(self):
        params = _random_params()
        sd = params_to_state_dict(jax.device_get(params), CFG)
        sd["nout.weight"] = np.zeros(3)
        sd["conv_out.weight"] = np.zeros((3, 3, 3, 3))
        sd["betas"] = np.zeros(1000)
        convert_state_dict(sd, CFG)  # must not raise
