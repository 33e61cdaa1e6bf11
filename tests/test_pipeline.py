"""Pipeline-parallel tests (parallel/pipeline.py): GPipe over the DiT block
stack on the virtual CPU mesh — forward parity vs the sequential model,
gradient parity through scan+ppermute, and DP x PP composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from eo_diffusion_tpu.models.dit import DiT, DiTConfig
from eo_diffusion_tpu.parallel.pipeline import (
    gpipe_blocks,
    pp_dit_apply,
    stack_block_params,
)


def make_model(depth=4):
    cfg = DiTConfig(image_size=16, in_channels=3, out_channels=3, patch_size=4,
                    hidden_size=64, depth=depth, num_heads=4)
    m = DiT(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 3))
    t = jnp.arange(8) * 10
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x, t)
    # nudge params so blocks aren't adaLN-Zero identities
    params = jax.tree.map(
        lambda p: p + 0.03 * jax.random.normal(jax.random.PRNGKey(2), p.shape),
        params)
    return m, params, x, t


def stage_mesh(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(jax.devices()[:n]).reshape(n), ("stage",))


class TestStackedParams:
    def test_stack_shape_and_order(self):
        m, params, _, _ = make_model(depth=4)
        stacked = stack_block_params(params, 4)
        leaf = jax.tree.leaves(stacked)[0]
        assert leaf.shape[0] == 4
        # stacked row i must equal block_i's corresponding leaf
        b2 = params["params"]["block_2"]
        for (pa, sa), (pb, lb) in zip(
                jax.tree_util.tree_flatten_with_path(stacked)[0],
                jax.tree_util.tree_flatten_with_path(b2)[0]):
            np.testing.assert_array_equal(np.asarray(sa[2]), np.asarray(lb))


class TestForwardParity:
    @pytest.mark.parametrize("n_micro", [1, 2, 4])
    def test_pp_matches_sequential(self, n_micro):
        m, params, x, t = make_model(depth=4)
        mesh = stage_mesh(4)
        ref = m.apply(params, x, t)
        out = jax.jit(lambda p: pp_dit_apply(m, p, x, t, mesh,
                                             n_micro=n_micro))(params)
        rel = float(jnp.abs(out - ref).max() / (jnp.abs(ref).max() + 1e-9))
        assert rel < 1e-5, rel

    def test_two_stages_two_blocks_each(self):
        m, params, x, t = make_model(depth=4)
        mesh = stage_mesh(2)
        ref = m.apply(params, x, t)
        out = jax.jit(lambda p: pp_dit_apply(m, p, x, t, mesh, n_micro=2))(params)
        assert float(jnp.abs(out - ref).max()) < 1e-4

    def test_depth_not_divisible_raises(self):
        m, params, x, t = make_model(depth=4)
        if len(jax.devices()) < 3:
            pytest.skip("needs 3 devices")
        mesh = Mesh(np.array(jax.devices()[:3]).reshape(3), ("stage",))
        with pytest.raises(AssertionError, match="divisible"):
            pp_dit_apply(m, params, x, t, mesh, n_micro=2)


class TestGradParity:
    def test_grads_match_sequential(self):
        m, params, x, t = make_model(depth=4)
        mesh = stage_mesh(4)

        def loss_seq(p):
            return jnp.mean(m.apply(p, x, t) ** 2)

        def loss_pp(p):
            return jnp.mean(pp_dit_apply(m, p, x, t, mesh, n_micro=2) ** 2)

        g_seq = jax.grad(loss_seq)(params)
        g_pp = jax.jit(jax.grad(loss_pp))(params)
        errs = jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-9)),
            g_seq, g_pp)
        assert max(jax.tree.leaves(errs)) < 1e-5


class TestDPxPP:
    def test_composed_mesh(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        m, params, x, t = make_model(depth=4)
        mesh = Mesh(np.array(jax.devices()[:8]).reshape(2, 4),
                    ("data", "stage"))
        ref = m.apply(params, x, t)
        out = jax.jit(lambda p: pp_dit_apply(m, p, x, t, mesh, n_micro=2,
                                             data_axis="data"))(params)
        assert float(jnp.abs(out - ref).max() /
                     (jnp.abs(ref).max() + 1e-9)) < 1e-5


class TestGenericBlocks:
    def test_gpipe_on_plain_mlp_stack(self):
        """gpipe_blocks is model-agnostic: a stacked Dense-like block chain
        must match the sequential scan."""
        mesh = stage_mesh(4)
        depth, b, d = 8, 4, 16
        k = jax.random.PRNGKey(0)
        ws = jax.random.normal(k, (depth, d, d)) * 0.3
        h = jax.random.normal(jax.random.PRNGKey(1), (b, d))
        c = jnp.zeros((b, 0))

        def block_fn(w, hh, cc):
            return jnp.tanh(hh @ w)

        ref = h
        for i in range(depth):
            ref = jnp.tanh(ref @ ws[i])
        out = jax.jit(lambda ws: gpipe_blocks(block_fn, ws, h, c, mesh,
                                              n_micro=2))(ws)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)
