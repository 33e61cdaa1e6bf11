"""DeepCache (arXiv 2312.00858) tests: the UNet shallow/deep split is exact,
and the cached sampler degrades to the plain sampler at refresh_every=1."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eo_diffusion_tpu.diffusion.deepcache import deepcache_model_fn
from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
from eo_diffusion_tpu.models.unet import UNet, UNetConfig

SIZE = 16


@pytest.fixture(scope="module")
def model_and_params():
    cfg = UNetConfig(
        image_size=SIZE, in_channels=3, model_channels=32, out_channels=3,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_heads=4,
    )
    model = UNet(cfg)
    x = jnp.zeros((2, SIZE, SIZE, 3))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, jnp.zeros((2,), jnp.int32))
    # zero-init heads (ZeroConv/ZeroDense) make a fresh model output exactly
    # zero -- perturb every leaf so the tests compare non-trivial features
    leaves, treedef = jax.tree.flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    params = jax.tree.unflatten(
        treedef,
        [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
         for l, k in zip(leaves, keys)],
    )
    return model, params


class TestUNetSplit:
    def test_splice_is_exact(self, model_and_params):
        """partial(x, t, cache=full(x, t).deep) must equal full(x, t) bitwise:
        the shallow path applies the same layers to the same inputs."""
        model, params = model_and_params
        x = jax.random.normal(jax.random.PRNGKey(1), (2, SIZE, SIZE, 3))
        t = jnp.array([3, 7], jnp.int32)
        out_full, deep = model.apply(params, x, t, return_deep=True)
        out_partial = model.apply(params, x, t, deep_cache=deep)
        np.testing.assert_array_equal(np.asarray(out_full), np.asarray(out_partial))

    def test_partial_differs_with_stale_cache(self, model_and_params):
        model, params = model_and_params
        x = jax.random.normal(jax.random.PRNGKey(1), (2, SIZE, SIZE, 3))
        t = jnp.array([3, 7], jnp.int32)
        out_full, deep = model.apply(params, x, t, return_deep=True)
        # element-wise noise: uniform scale/shift would be normalized away by
        # the first GroupNorm in the shallow output blocks
        noise = jax.random.normal(jax.random.PRNGKey(9), deep.shape, deep.dtype)
        stale = model.apply(params, x, t, deep_cache=deep + 0.5 * noise)
        assert not np.allclose(np.asarray(out_full), np.asarray(stale))

    def test_cache_depth_bounds(self, model_and_params):
        model, params = model_and_params
        x = jnp.zeros((1, SIZE, SIZE, 3))
        t = jnp.zeros((1,), jnp.int32)
        with pytest.raises(AssertionError):
            model.apply(params, x, t, return_deep=True, cache_depth=99)

    def test_default_forward_unchanged(self, model_and_params):
        """The plain call path must not change shape/semantics."""
        model, params = model_and_params
        x = jax.random.normal(jax.random.PRNGKey(2), (1, SIZE, SIZE, 3))
        t = jnp.zeros((1,), jnp.int32)
        out = model.apply(params, x, t)
        assert out.shape == (1, SIZE, SIZE, 3)


class TestCachedSampler:
    def test_refresh_every_1_matches_plain(self, model_and_params):
        model, params = model_and_params
        d = GaussianDiffusion.create(timesteps=20, image_size=SIZE, in_channels=3)
        plain_fn = lambda x, t, c, y: model.apply(params, x, t, cond=c, y=y)
        fn, state0 = deepcache_model_fn(
            model, params, jnp.zeros((2, SIZE, SIZE, 3)), refresh_every=1
        )
        rng = jax.random.PRNGKey(0)
        ref = d.ddim_sample(plain_fn, rng, 2, num_steps=5).x
        out = d.ddim_sample(fn, rng, 2, num_steps=5, model_state=state0).x
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_refresh_every_2_runs(self, model_and_params):
        model, params = model_and_params
        d = GaussianDiffusion.create(timesteps=20, image_size=SIZE, in_channels=3)
        fn, state0 = deepcache_model_fn(
            model, params, jnp.zeros((2, SIZE, SIZE, 3)), refresh_every=2
        )
        out = d.ddim_sample(fn, jax.random.PRNGKey(0), 2, num_steps=6,
                            model_state=state0).x
        assert out.shape == (2, SIZE, SIZE, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_ddpm_refresh_every_1_matches_plain(self, model_and_params):
        """DDPM (the RePaint cloud-removal sampler) with a stateful model at
        refresh_every=1 must reproduce the plain trajectory."""
        model, params = model_and_params
        d = GaussianDiffusion.create(timesteps=10, image_size=SIZE, in_channels=3)
        plain_fn = lambda x, t, c, y: model.apply(params, x, t, cond=c, y=y)
        fn, state0 = deepcache_model_fn(
            model, params, jnp.zeros((2, SIZE, SIZE, 3)), refresh_every=1
        )
        rng = jax.random.PRNGKey(0)
        ref = d.ddpm_sample(plain_fn, rng, 2).x
        out = d.ddpm_sample(fn, rng, 2, model_state=state0).x
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_ddpm_repaint_cached_runs(self, model_and_params):
        model, params = model_and_params
        d = GaussianDiffusion.create(timesteps=10, image_size=SIZE, in_channels=3,
                                     cond_type="sum")
        gt = jnp.zeros((2, SIZE, SIZE, 3))
        mask = jnp.ones((2, SIZE, SIZE, 1))
        cond = jnp.concatenate([gt, mask], axis=-1)
        fn, state0 = deepcache_model_fn(
            model, params, jnp.zeros((2, SIZE, SIZE, 3)), refresh_every=2
        )
        out = d.ddpm_sample(fn, jax.random.PRNGKey(0), 2, cond=cond,
                            model_state=state0).x
        assert np.isfinite(np.asarray(out)).all()

    def test_cached_close_to_plain(self, model_and_params):
        """With a random-init model the deep feature still varies smoothly in
        t, so the cached trajectory should stay in the same ballpark."""
        model, params = model_and_params
        d = GaussianDiffusion.create(timesteps=20, image_size=SIZE, in_channels=3)
        plain_fn = lambda x, t, c, y: model.apply(params, x, t, cond=c, y=y)
        fn, state0 = deepcache_model_fn(
            model, params, jnp.zeros((2, SIZE, SIZE, 3)), refresh_every=2
        )
        rng = jax.random.PRNGKey(0)
        ref = np.asarray(d.ddim_sample(plain_fn, rng, 2, num_steps=6).x)
        out = np.asarray(d.ddim_sample(fn, rng, 2, num_steps=6,
                                       model_state=state0).x)
        # same rng stream -> same init noise; trajectories stay correlated
        err = np.abs(out - ref).mean() / (np.abs(ref).mean() + 1e-8)
        assert err < 0.5, err


class TestCachedGuidance:
    """DeepCache composes with batch-doubling guidance: the cache rides the
    doubled batch (state built at batch 2N)."""

    @pytest.fixture(scope="class")
    def cond_model(self):
        cfg = UNetConfig(
            image_size=SIZE, in_channels=6, model_channels=32, out_channels=3,
            num_res_blocks=1, attention_resolutions=(), channel_mult=(1, 2),
        )
        model = UNet(cfg)
        x = jnp.zeros((2, SIZE, SIZE, 3))
        c = jnp.zeros((2, SIZE, SIZE, 3))
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), x, jnp.zeros((2,), jnp.int32), cond=c
        )
        leaves, treedef = jax.tree.flatten(params)
        keys = jax.random.split(jax.random.PRNGKey(5), len(leaves))
        params = jax.tree.unflatten(
            treedef,
            [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
             for l, k in zip(leaves, keys)],
        )
        return model, params

    def test_cfg_refresh_every_1_matches_plain(self, cond_model):
        model, params = cond_model
        d = GaussianDiffusion.create(timesteps=20, image_size=SIZE, in_channels=3,
                                     cond_type="concat")
        cond = jax.random.normal(jax.random.PRNGKey(2), (2, SIZE, SIZE, 3))
        uncond = jnp.zeros_like(cond)
        plain_fn = lambda x, t, c, y: model.apply(params, x, t, cond=c, y=y)
        # guidance doubles the batch: build the cache at 2N
        fn, st0 = deepcache_model_fn(
            model, params, jnp.zeros((4, SIZE, SIZE, 3)),
            example_cond=jnp.zeros((4, SIZE, SIZE, 3)), refresh_every=1,
        )
        rng = jax.random.PRNGKey(0)
        ref = d.ddim_sample(plain_fn, rng, 2, num_steps=5, cond=cond,
                            uncond=uncond, guidance_scale=2.0).x
        out = d.ddim_sample(fn, rng, 2, num_steps=5, cond=cond,
                            uncond=uncond, guidance_scale=2.0,
                            model_state=st0).x
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_cfg_cached_runs(self, cond_model):
        model, params = cond_model
        d = GaussianDiffusion.create(timesteps=20, image_size=SIZE, in_channels=3,
                                     cond_type="concat")
        cond = jax.random.normal(jax.random.PRNGKey(2), (2, SIZE, SIZE, 3))
        fn, st0 = deepcache_model_fn(
            model, params, jnp.zeros((4, SIZE, SIZE, 3)),
            example_cond=jnp.zeros((4, SIZE, SIZE, 3)), refresh_every=2,
        )
        out = d.ddim_sample(fn, jax.random.PRNGKey(0), 2, num_steps=6,
                            cond=cond, uncond=jnp.zeros_like(cond),
                            guidance_scale=1.5, model_state=st0).x
        assert np.isfinite(np.asarray(out)).all()
