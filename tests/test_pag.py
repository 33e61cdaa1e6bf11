"""Perturbed-Attention Guidance (diffusion/pag.py + ops.attention
identity_attention). Beyond-reference: the reference's only guidance is CFG
(diffusion/ddim.py:177-181); PAG (arXiv:2403.17377) needs no condition and
no second model, so it applies to the unconditional EO presets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import eo_diffusion_tpu.ops.attention as A
from eo_diffusion_tpu.diffusion.pag import pag_model_fn


def _jitter(params, amp=0.05):
    """Deterministic nonzero perturbation of every leaf (the zero-init
    proj_out convs must become nonzero for the perturbed branch to differ)."""
    return jax.tree.map(
        lambda p: p + amp * jnp.sin(jnp.arange(p.size, dtype=jnp.float32)
                                    ).reshape(p.shape).astype(p.dtype),
        params)


class TestIdentityAttention:
    def test_returns_values_both_layouts(self):
        rng = np.random.default_rng(0)
        b, t, h, d = 2, 16, 4, 8
        qkv = jnp.asarray(rng.normal(size=(b, t, 3 * h * d)), jnp.float32)
        for new_order in (False, True):
            with A.identity_attention():
                out = A.attention_from_qkv(qkv, h, new_order=new_order)
            if new_order:
                v = qkv.reshape(b, t, 3, h, d)[:, :, 2]
            else:
                v = qkv.reshape(b, t, h, 3, d)[:, :, :, 2]
            np.testing.assert_array_equal(np.asarray(out),
                                          np.asarray(v.reshape(b, t, h * d)))

    def test_restored_after_context(self):
        rng = np.random.default_rng(1)
        qkv = jnp.asarray(rng.normal(size=(1, 16, 3 * 32)), jnp.float32)
        ref = A.attention_from_qkv(qkv, 2)
        with A.identity_attention():
            pert = A.attention_from_qkv(qkv, 2)
        again = A.attention_from_qkv(qkv, 2)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(again))
        assert not np.allclose(np.asarray(ref), np.asarray(pert))

    def test_unet_perturbed_branch_differs(self):
        """On a UNet whose proj_out is nonzero, the perturbed forward differs
        (the OpenAI builder always places attention in the middle block, so
        every UNet config has a perturbable map)."""
        from eo_diffusion_tpu.models.unet import UNet, UNetConfig

        rng = np.random.default_rng(3)
        # spatially VARYING input: on a constant image attention over
        # identical tokens is the identity map and PAG perturbs nothing
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)), jnp.float32)
        t = jnp.zeros((2,), jnp.int32)
        cfg = UNetConfig(image_size=8, in_channels=3, model_channels=16,
                         out_channels=3, num_res_blocks=1,
                         attention_resolutions=(2,),
                         channel_mult=(1, 2), num_heads=2)
        model = UNet(cfg)
        params = _jitter(jax.jit(model.init)(jax.random.PRNGKey(0), x, t))
        plain = model.apply(params, x, t)
        with A.identity_attention():
            pert = model.apply(params, x, t)
        assert not np.allclose(np.asarray(plain), np.asarray(pert), atol=1e-6)

    def test_works_under_jit_trace(self):
        """The routing is trace-time: entering the context around the traced
        call bakes the identity branch into the jaxpr."""
        rng = np.random.default_rng(2)
        qkv = jnp.asarray(rng.normal(size=(1, 16, 3 * 32)), jnp.float32)
        f = jax.jit(lambda x: A.attention_from_qkv(x, 2))
        with A.identity_attention():
            pert = f(qkv)
        v = qkv.reshape(1, 16, 2, 3, 16)[:, :, :, 2].reshape(1, 16, 32)
        np.testing.assert_allclose(np.asarray(pert), np.asarray(v), atol=1e-6)


class TestPagModelFn:
    def test_combine_algebra(self):
        """e + s(e - e_p) exactly, with e/e_p from the two branches."""
        import eo_diffusion_tpu.ops.attention as AA

        def model_fn(x, t, c, y):
            flag = 1.0 if AA._IDENTITY else 0.0
            if AA._IDENTITY:  # simulate a routed self-attention site
                AA._IDENTITY_HITS += 1
            return x * 2.0 + flag  # perturbed branch shifts by +1

        x = jnp.ones((2, 4, 4, 3)) * 0.5
        out = pag_model_fn(model_fn, 3.0)(x, None, None, None)
        # e = 1.0, e_p = 2.0 -> guided = 1 + 3*(1-2) = -2
        np.testing.assert_allclose(np.asarray(out), -2.0, atol=1e-6)

    def test_scale_zero_is_identity(self):
        def model_fn(x, t, c, y):
            return x * 2.0

        x = jnp.ones((1, 4, 4, 3))
        out = pag_model_fn(model_fn, 0.0)(x, None, None, None)
        np.testing.assert_allclose(np.asarray(out), 2.0, atol=1e-6)

    def test_learned_variance_tail_passes_through(self):
        import eo_diffusion_tpu.ops.attention as AA

        def model_fn(x, t, c, y):
            flag = 1.0 if AA._IDENTITY else 0.0
            if AA._IDENTITY:  # simulate a routed self-attention site
                AA._IDENTITY_HITS += 1
            return jnp.concatenate([x + flag, x * 5.0], axis=-1)

        x = jnp.ones((1, 4, 4, 2)) * 0.2
        out = pag_model_fn(model_fn, 2.0)(x, None, None, None)
        # eps half: e=0.2, e_p=1.2 -> 0.2 + 2*(-1) = -1.8; tail: 1.0 as-is
        np.testing.assert_allclose(np.asarray(out[..., :2]), -1.8, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out[..., 2:]), 1.0, atol=1e-6)

    def test_no_attention_site_raises(self):
        """A backbone that never routes through attention_from_qkv makes the
        perturbed branch equal the plain one — the wrapper must fail loudly
        instead of silently sampling unguided (ADVICE r3)."""
        def attention_free_model(x, t, c, y):
            return x * 2.0

        x = jnp.ones((1, 4, 4, 3))
        with pytest.raises(ValueError, match="no-op on this backbone"):
            pag_model_fn(attention_free_model, 2.0)(x, None, None, None)

    def test_scale_zero_skips_perturbed_branch(self):
        """pag_scale=0 returns the plain model_fn — no double forward, and
        no no-op guard (nothing is guided at s=0)."""
        def model_fn(x, t, c, y):
            return x * 2.0

        assert pag_model_fn(model_fn, 0.0) is model_fn

    def test_guides_a_real_sampler(self):
        """PAG shifts DDIM output on a jittered tiny UNet; pag_scale=0 does
        not. One jit traces both branches (trace-time context)."""
        from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
        from eo_diffusion_tpu.models.unet import UNet, UNetConfig

        cfg = UNetConfig(image_size=8, in_channels=3, model_channels=16,
                         out_channels=3, num_res_blocks=1,
                         attention_resolutions=(2,), channel_mult=(1, 2),
                         num_heads=2)
        model = UNet(cfg)
        x = jnp.zeros((2, 8, 8, 3))
        t = jnp.zeros((2,), jnp.int32)
        params = _jitter(jax.jit(model.init)(jax.random.PRNGKey(0), x, t))
        diff = GaussianDiffusion.create(timesteps=20, image_size=8,
                                        in_channels=3)
        base_fn = lambda x, t, c, y: model.apply(params, x, t)

        def run(fn):
            return jax.jit(lambda k: diff.ddim_sample(
                fn, k, n_samples=2, num_steps=5).x)(jax.random.PRNGKey(1))

        plain = run(base_fn)
        pag = run(pag_model_fn(base_fn, 3.0))
        pag0 = run(pag_model_fn(base_fn, 0.0))
        assert np.all(np.isfinite(np.asarray(pag)))
        np.testing.assert_allclose(np.asarray(pag0), np.asarray(plain),
                                   atol=1e-5)
        assert not np.allclose(np.asarray(pag), np.asarray(plain), atol=1e-4)
