"""Weight-only int8 quantization (utils/quantize.py + serving --int8)."""

import jax
import jax.numpy as jnp
import numpy as np

from eo_diffusion_tpu.utils.quantize import (dequantize_tree,
                                             quantize_tree, quantized_bytes)


class TestQuantizeTree:
    def test_roundtrip_error_bound(self):
        # symmetric per-channel int8: worst-case abs error is scale/2 =
        # amax/254 per channel
        k = jax.random.PRNGKey(0)
        w = jax.random.normal(k, (64, 32)) * jnp.linspace(0.1, 3.0, 32)
        qt, st = quantize_tree({"k": w})
        back = dequantize_tree(qt, st)["k"]
        amax = np.abs(np.asarray(w)).max(axis=0)
        err = np.abs(np.asarray(back - w))
        assert (err <= amax[None] / 254.0 + 1e-7).all()

    def test_vectors_pass_through_exact(self):
        tree = {"kernel": jnp.ones((4, 4)), "bias": jnp.arange(4.0),
                "scale": jnp.ones(())}
        qt, st = quantize_tree(tree)
        assert qt["kernel"].dtype == jnp.int8
        assert qt["bias"].dtype == jnp.float32  # untouched
        back = dequantize_tree(qt, st)
        np.testing.assert_array_equal(np.asarray(back["bias"]),
                                      np.asarray(tree["bias"]))
        np.testing.assert_allclose(np.asarray(back["kernel"]), 1.0,
                                   rtol=1e-2)

    def test_bytes_roughly_quarter_of_f32(self):
        tree = {"a": jnp.zeros((128, 128)), "b": jnp.zeros((3, 3, 16, 32))}
        qt, _ = quantize_tree(tree)
        f32_bytes = sum(l.size * 4 for l in jax.tree.leaves(tree))
        assert quantized_bytes(qt) * 4 == f32_bytes

    def test_model_output_close(self):
        """A real UNet forward under quantized weights stays close to f32
        (weight-only int8's quality contract; loose tolerance — ~1% rel)."""
        from eo_diffusion_tpu.models.unet import UNet, UNetConfig

        cfg = UNetConfig(image_size=8, in_channels=3, model_channels=16,
                         out_channels=3, num_res_blocks=1,
                         attention_resolutions=(), channel_mult=(1, 2),
                         num_heads=2)
        model = UNet(cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3))
        t = jnp.full((2,), 10, jnp.int32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t)
        # nudge every param: a fresh UNet's zero-init output convs make the
        # forward identically 0, which would vacuously pass any closeness
        leaves, td = jax.tree.flatten(params)
        keys = jax.random.split(jax.random.PRNGKey(2), len(leaves))
        params = jax.tree.unflatten(td, [
            l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
            for l, k in zip(leaves, keys)])
        full = np.asarray(model.apply(params, x, t), np.float32)
        qt, st = quantize_tree(params)
        quant = np.asarray(model.apply(dequantize_tree(qt, st), x, t),
                           np.float32)
        rel = np.linalg.norm(quant - full) / max(np.linalg.norm(full), 1e-9)
        assert rel < 0.05, rel
        assert np.abs(quant - full).max() > 0  # actually quantized


class TestInt8Serving:
    def test_engine_int8_close_to_f32(self):
        import jax

        from eo_diffusion_tpu.cli.presets import (build_denoiser,
                                                  build_process, get_preset)
        from eo_diffusion_tpu.serving.engine import (SamplerEngine,
                                                     ServingConfig)

        preset = get_preset("tiny")
        ucfg = preset.model_config(bf16=False)
        model = build_denoiser(ucfg)
        diffusion = build_process(preset, 50, preset.image_size)
        x0 = jnp.zeros((1, preset.image_size, preset.image_size, 3))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                                     jnp.zeros((1,), jnp.int32))
        mk = lambda i8: SamplerEngine(
            model, params, diffusion, preset.image_size, 3,
            ServingConfig(batch_size=2, sampler="ddim", steps=3, bf16=False,
                          int8=i8))
        rng = jax.random.PRNGKey(7)
        full = mk(False).generate(rng, None, None)
        eng_q = mk(True)
        q = eng_q.generate(rng, None, None)
        assert np.isfinite(q).all()
        # same seed; weight-only int8 perturbs mildly (a random-init tiny
        # model's zero-init output head makes the outputs exactly equal —
        # the structural check below pins that quantization engaged)
        assert np.abs(q - full).mean() < 0.2
        qt, st = eng_q.params
        assert any(l.dtype == jnp.int8 for l in jax.tree.leaves(qt))

    def test_hot_swap_requantizes(self):
        import jax

        from eo_diffusion_tpu.cli.presets import (build_denoiser,
                                                  build_process, get_preset)
        from eo_diffusion_tpu.serving.engine import (SamplerEngine,
                                                     ServingConfig)

        preset = get_preset("tiny")
        ucfg = preset.model_config(bf16=False)
        model = build_denoiser(ucfg)
        diffusion = build_process(preset, 50, preset.image_size)
        x0 = jnp.zeros((1, preset.image_size, preset.image_size, 3))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x0,
                                     jnp.zeros((1,), jnp.int32))
        eng = SamplerEngine(model, params, diffusion, preset.image_size, 3,
                            ServingConfig(batch_size=2, sampler="ddim",
                                          steps=2, bf16=False, int8=True))
        p2 = jax.tree.map(lambda p: p * 1.5, params)
        eng.swap_params(p2)  # must re-pack, not store raw floats
        out = eng.generate(jax.random.PRNGKey(0), None, None)
        assert np.isfinite(out).all()


class TestW8A8Compute:
    """int8 COMPUTE (nn/primitives.int8_dense_compute, VERDICT r4 item 4):
    trace-time routing of large Dense matmuls onto the MXU int8 path with
    identical param structure (any checkpoint, no conversion)."""

    def _dit(self):
        from eo_diffusion_tpu.models.dit import DiT, DiTConfig

        cfg = DiTConfig(image_size=16, in_channels=3, out_channels=3,
                        patch_size=2, hidden_size=256, depth=2, num_heads=4)
        model = DiT(cfg)
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(16, 16, 16, 3)), jnp.float32)
        t = jnp.zeros((16,), jnp.int32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t)
        return model, params, x, t

    def test_params_structure_unchanged(self):
        """A checkpoint initialized WITHOUT the context applies inside it
        (same kernel/bias names) — and vice versa."""
        from eo_diffusion_tpu.nn.primitives import int8_dense_compute

        model, params, x, t = self._dit()
        with int8_dense_compute():
            params_q = jax.jit(model.init)(jax.random.PRNGKey(0), x, t)
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(params_q))
        with int8_dense_compute():
            _ = model.apply(params, x, t)  # plain ckpt under the context

    def test_output_close_to_plain_forward(self):
        """Quantization error stays small: the W8A8 forward correlates
        ~1 with the plain one on a real DiT (per-channel weights +
        per-tensor activations)."""
        from eo_diffusion_tpu.nn.primitives import int8_dense_compute

        model, params, x, t = self._dit()
        # the zero-init output head makes the init forward identically 0;
        # jitter every leaf so the comparison is non-trivial
        params = jax.tree.map(
            lambda p: p + 0.03 * jnp.sin(
                jnp.arange(p.size, dtype=jnp.float32)).reshape(p.shape
                                                               ).astype(p.dtype),
            params)
        ref = np.asarray(model.apply(params, x, t), np.float64).ravel()
        with int8_dense_compute():
            q = np.asarray(jax.jit(
                lambda p, xx, tt: model.apply(p, xx, tt))(params, x, t),
                np.float64).ravel()
        denom = np.sqrt((ref ** 2).mean()) + 1e-12
        rel = np.sqrt(((q - ref) ** 2).mean()) / denom
        assert rel < 0.15, f"relative error {rel}"
        corr = np.corrcoef(ref, q)[0, 1]
        assert corr > 0.99, corr

    def test_int8_dot_lands_in_hlo(self):
        """The compiled program must contain a real s8 x s8 -> s32 dot —
        the MXU int8 path, not a dequantize-then-bf16 fallback."""
        from eo_diffusion_tpu.nn.primitives import int8_dense_compute

        model, params, x, t = self._dit()
        with int8_dense_compute():
            lowered = jax.jit(
                lambda p, xx, tt: model.apply(p, xx, tt)).lower(params, x, t)
        hlo = lowered.as_text()  # StableHLO spells int8 as i8
        assert "xi8>" in hlo and "xi32>" in hlo, "no int8 dot in the program"

    def test_small_matmuls_stay_float(self):
        """Below the measured break-even (rows/dims), Dense stays on the
        float path — the timestep-embedding MLPs must not quantize."""
        import flax.linen as nn_

        from eo_diffusion_tpu.nn.primitives import Dense, int8_dense_compute

        class Tiny(nn_.Module):
            @nn_.compact
            def __call__(self, x):
                return Dense(64, name="d")(x)

        x = jnp.ones((4, 32))
        m = Tiny()
        p = m.init(jax.random.PRNGKey(0), x)
        with int8_dense_compute():
            hlo = jax.jit(lambda pp, xx: m.apply(pp, xx)).lower(p, x).as_text()
        assert "xi8>" not in hlo

    def test_routing_restored_after_context(self):
        import flax.linen as nn_

        from eo_diffusion_tpu.nn import primitives as P

        assert P._INT8_DENSE is False
        with P.int8_dense_compute():
            assert P._INT8_DENSE is True
        assert P._INT8_DENSE is False
        assert isinstance(P.Dense(8), nn_.Dense)
