"""Data-parallel sampling on the virtual mesh (the serving scale-out path).

The samplers are pure jittable functions, so multi-chip batch sampling is
just ``jax.jit`` with a batch-sharded ``NamedSharding`` — GSPMD partitions
the whole S-step scan over the 'data' axis with zero collectives in the
loop (each shard denoises its own images). These tests pin that contract:
sharded == unsharded results, for both the DDIM chain and the flow ODE,
with the UNet and the DiT.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from eo_diffusion_tpu.parallel.mesh import make_mesh


def _mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return make_mesh(jax.devices()[:8])


class TestShardedSampling:
    def test_ddim_unet_sharded_matches(self):
        from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
        from eo_diffusion_tpu.models.unet import UNet, UNetConfig

        mesh = _mesh()
        ucfg = UNetConfig(image_size=8, in_channels=3, model_channels=16,
                          out_channels=3, num_res_blocks=1,
                          attention_resolutions=(), channel_mult=(1, 2))
        model = UNet(ucfg)
        diff = GaussianDiffusion.create(timesteps=20, image_size=8, in_channels=3)
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 8, 8, 3)),
                                     jnp.zeros((1,), jnp.int32))

        def sample(params, x_T):
            fn = lambda x, t, c, y: model.apply(params, x, t, cond=c, y=y)
            return diff.ddim_sample(fn, jax.random.PRNGKey(1), 16,
                                    num_steps=5, x_T=x_T).x

        x_T = jax.random.normal(jax.random.PRNGKey(2), (16, 8, 8, 3))
        ref = jax.jit(sample)(params, x_T)
        sharded = jax.jit(
            sample,
            in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))),
            out_shardings=NamedSharding(mesh, P("data")),
        )(params, jax.device_put(x_T, NamedSharding(mesh, P("data"))))
        np.testing.assert_allclose(np.asarray(ref), np.asarray(sharded),
                                   rtol=2e-4, atol=2e-5)

    def test_flow_dit_sharded_matches(self):
        from eo_diffusion_tpu.diffusion.flow import FlowMatching
        from eo_diffusion_tpu.models.dit import DiT, DiTConfig

        mesh = _mesh()
        cfg = DiTConfig(image_size=16, in_channels=3, out_channels=3,
                        patch_size=4, hidden_size=64, depth=2, num_heads=4)
        model = DiT(cfg)
        fm = FlowMatching.create(image_size=16, in_channels=3)
        params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 16, 16, 3)),
                                     jnp.zeros((1,), jnp.int32))
        params = jax.tree.map(
            lambda p: p + 0.03 * jax.random.normal(jax.random.PRNGKey(3), p.shape),
            params)

        def sample(params, x_T):
            fn = lambda x, t, c, y: model.apply(params, x, t, cond=c, y=y)
            return fm.sample(fn, jax.random.PRNGKey(1), 16, num_steps=4,
                             method="heun", x_T=x_T).x

        x_T = jax.random.normal(jax.random.PRNGKey(2), (16, 16, 16, 3))
        ref = jax.jit(sample)(params, x_T)
        sharded = jax.jit(
            sample,
            in_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P("data"))),
            out_shardings=NamedSharding(mesh, P("data")),
        )(params, jax.device_put(x_T, NamedSharding(mesh, P("data"))))
        np.testing.assert_allclose(np.asarray(ref), np.asarray(sharded),
                                   rtol=2e-4, atol=2e-5)
