"""MoE-DiT: routed-expert FFN (models/moe.py) + expert parallelism.

Beyond-reference axis: SURVEY.md §2.3 lists EP as N/A (the reference has
no MoE); these tests pin the dense-dispatch routing semantics, the aux
load-balance loss plumbing through the Trainer, and annotation-only EP
sharding parity on the virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from eo_diffusion_tpu.models.dit import DiT, DiTConfig
from eo_diffusion_tpu.models.moe import MoEMLP

TINY_MOE = DiTConfig(image_size=8, in_channels=3, out_channels=3,
                     patch_size=2, hidden_size=32, depth=2, num_heads=2,
                     num_experts=4, moe_every=2, moe_top_k=1)


class TestMoEMLP:
    def test_single_expert_equals_dense_mlp(self):
        """E=1, k=1, capacity >= S: routing is the identity and the layer
        must equal the plain gelu-MLP computed from the same weights."""
        m = MoEMLP(hidden_size=16, mlp_hidden=32, num_experts=1, top_k=1,
                   capacity_factor=1.0)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 16))
        params = m.init(jax.random.PRNGKey(1), x)
        y = m.apply(params, x)
        p = params["params"]
        ref = jax.nn.gelu(
            x.reshape(-1, 16) @ p["w_in"][0] + p["b_in"][0],
            approximate=True) @ p["w_out"][0] + p["b_out"][0]
        np.testing.assert_allclose(np.asarray(y).reshape(-1, 16),
                                   np.asarray(ref), rtol=1e-5, atol=1e-5)

    def test_topk_gates_renormalized(self):
        """top-2 into 2 experts with ample capacity: every token reaches
        both experts and the combine weights sum to 1 per token."""
        m = MoEMLP(hidden_size=8, mlp_hidden=8, num_experts=2, top_k=2,
                   capacity_factor=2.0)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 10, 8))
        params = m.init(jax.random.PRNGKey(1), x)
        # zero expert weights: output reduces to the per-token sum of
        # combine * b_out (the bias), i.e. exactly b_out if gates sum to 1
        zeroed = jax.tree.map(jnp.zeros_like, params)
        bias = jnp.ones((2, 8))  # identical bias for both experts
        zeroed["params"]["b_out"] = bias
        y = m.apply(zeroed, x)
        np.testing.assert_allclose(np.asarray(y), 1.0, rtol=1e-5, atol=1e-6)

    def test_capacity_drops_overflow_tokens(self):
        """capacity 1 token/expert: later tokens routed to a full expert
        contribute zero (their residual path lives in the DiT block)."""
        m = MoEMLP(hidden_size=8, mlp_hidden=8, num_experts=2, top_k=1,
                   capacity_factor=2.0 / 10.0)  # C = S*k/E * cf = 1
        x = jnp.ones((1, 10, 8))  # identical tokens -> identical routing
        params = m.init(jax.random.PRNGKey(1), x)
        y = np.asarray(m.apply(params, x))
        tok = y.reshape(10, 8)
        # identical tokens all pick the same expert; only the first fits
        assert np.abs(tok[0]).max() > 0
        np.testing.assert_array_equal(tok[1:], 0.0)

    def test_aux_loss_sown_and_finite(self):
        m = MoEMLP(hidden_size=8, mlp_hidden=8, num_experts=4, top_k=1)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8))
        params = m.init(jax.random.PRNGKey(1), x)
        assert "intermediates" not in params, (
            "init must not capture the sown aux into the param tree")
        y, variables = m.apply(params, x, mutable=["intermediates"])
        (aux,) = jax.tree.leaves(variables["intermediates"])
        assert np.isfinite(float(aux)) and float(aux) > 0
        # immutable apply (sampling path): sow is a no-op, no error
        y2 = m.apply(params, x)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))

    def test_router_gradients_flow(self):
        """The gate values multiply expert outputs, so router weights must
        receive gradients through the combine path."""
        m = MoEMLP(hidden_size=8, mlp_hidden=8, num_experts=2, top_k=2,
                   capacity_factor=2.0)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8))
        params = m.init(jax.random.PRNGKey(1), x)
        g = jax.grad(lambda p: jnp.sum(m.apply(p, x) ** 2))(params)
        assert np.abs(np.asarray(
            g["params"]["router"]["kernel"])).max() > 0


class TestMoEDiT:
    def test_interleave_pattern(self):
        """moe_every=2, depth=2: block_0 dense, block_1 MoE."""
        model = DiT(TINY_MOE)
        x = jnp.zeros((1, 8, 8, 3))
        params = model.init(jax.random.PRNGKey(0), x,
                            jnp.zeros((1,), jnp.int32))
        blocks = params["params"]
        assert "mlp_in" in blocks["block_0"] and "moe" not in blocks["block_0"]
        assert "moe" in blocks["block_1"] and "mlp_in" not in blocks["block_1"]
        assert blocks["block_1"]["moe"]["w_in"].shape == (4, 32, 128)

    def test_forward_and_sampling(self):
        from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion

        model = DiT(TINY_MOE)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x,
                                     jnp.zeros((2,), jnp.int32))
        diffusion = GaussianDiffusion.create(timesteps=10, image_size=8,
                                             in_channels=3)
        fn = lambda xx, tt, c, yy: model.apply(params, xx, tt)
        out = jax.jit(lambda r: diffusion.ddim_sample(fn, r, 2, num_steps=4).x)(
            jax.random.PRNGKey(1))
        assert out.shape == (2, 8, 8, 3)
        assert np.isfinite(np.asarray(out)).all()


class TestMoETrainer:
    def _run(self, ep: bool, steps: int = 3):
        from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
        from eo_diffusion_tpu.parallel.mesh import make_mesh
        from eo_diffusion_tpu.train.trainer import Trainer, TrainerConfig

        cfg = TrainerConfig(lr=1e-3, batch_size=8, epochs=1, timesteps=10,
                            model_ema_steps=1, warmup_epochs=1, seed=3,
                            ep=ep)
        mesh = make_mesh(model=2) if ep else None
        model = DiT(TINY_MOE)
        diffusion = GaussianDiffusion.create(timesteps=10, image_size=8,
                                             in_channels=3)
        tr = Trainer(cfg, model, diffusion, steps_per_epoch=steps, mesh=mesh)
        rng = np.random.default_rng(7)
        batches = [{"image": rng.normal(size=(8, 8, 8, 3)).astype(np.float32) * 0.3}
                   for _ in range(steps)]
        state = tr.init(jax.random.PRNGKey(0), batches[0])
        losses = []
        for b in batches:
            state, m = tr.step(state, b)
            losses.append(float(m["loss"]))
        return tr, state, losses

    def test_trains_with_aux_loss(self):
        """Loss finite, expert weights AND router receive updates."""
        tr, state, losses = self._run(ep=False)
        assert all(np.isfinite(l) for l in losses)
        moe = state.params["params"]["block_1"]["moe"]
        w = jax.device_get(moe["w_in"])
        model = DiT(TINY_MOE)
        p0 = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32))
        w0 = np.asarray(p0["params"]["block_1"]["moe"]["w_in"])
        assert np.abs(w - w0).max() > 0
        r0 = np.asarray(p0["params"]["block_1"]["moe"]["router"]["kernel"])
        r1 = jax.device_get(moe["router"]["kernel"])
        assert np.abs(r1 - r0).max() > 0

    def test_ep_shards_expert_leaves(self):
        tr, state, _ = self._run(ep=True)
        moe = state.params["params"]["block_1"]["moe"]
        assert "model" in str(moe["w_in"].sharding.spec)
        assert "model" in str(moe["w_out"].sharding.spec)
        # router replicates
        assert "model" not in str(moe["router"]["kernel"].sharding.spec)

    def test_ep_matches_replicated_loss(self):
        """EP is annotation-only: sharded == replicated numerics."""
        _, s_rep, l_rep = self._run(ep=False)
        _, s_ep, l_ep = self._run(ep=True)
        np.testing.assert_allclose(l_rep, l_ep, rtol=2e-4, atol=2e-5)
        a = jax.tree.leaves(jax.device_get(s_rep.params))
        b = jax.tree.leaves(jax.device_get(s_ep.params))
        for x, y in zip(a, b):
            np.testing.assert_allclose(x, y, rtol=2e-3, atol=2e-5)

    def test_ep_without_moe_rejected(self):
        from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
        from eo_diffusion_tpu.parallel.mesh import make_mesh
        from eo_diffusion_tpu.train.trainer import Trainer, TrainerConfig

        dense = DiTConfig(image_size=8, in_channels=3, out_channels=3,
                          patch_size=2, hidden_size=32, depth=2, num_heads=2)
        cfg = TrainerConfig(lr=1e-3, batch_size=8, epochs=1, timesteps=10,
                            ep=True)
        tr = Trainer(cfg, DiT(dense),
                     GaussianDiffusion.create(timesteps=10, image_size=8,
                                              in_channels=3),
                     steps_per_epoch=1, mesh=make_mesh(model=2))
        with pytest.raises(AssertionError, match="no MoE"):
            tr.init(jax.random.PRNGKey(0),
                    {"image": np.zeros((8, 8, 8, 3), np.float32)})


class TestMoECLI:
    def test_train_ep_infer_roundtrip(self, tmp_path):
        """tiny-moe preset: expert-parallel training (--ep over a 2-wide
        model axis) -> checkpoint -> ddim inference, both argparse mains."""
        import os

        from eo_diffusion_tpu.cli import inference as infer_cli
        from eo_diffusion_tpu.cli import train as train_cli

        cwd = os.getcwd()
        os.chdir(str(tmp_path))
        try:
            train_cli.main(train_cli.parse_args([
                "--preset", "tiny-moe", "--epochs", "1",
                "--steps_per_epoch", "3", "--batch_size", "8",
                "--dir", "res_moe", "--sample_every", "0",
                "--save_every", "3", "--log_freq", "1",
                "--ep", "--model_parallel", "2",
            ]))
            ckpt_root = os.path.join(str(tmp_path), "logs", "res_moe")
            step = sorted(d for d in os.listdir(ckpt_root)
                          if d.startswith("steps_"))[-1]
            outdir = str(tmp_path / "infer_moe")
            infer_cli.main(infer_cli.parse_args([
                "--preset", "tiny-moe", "--ckpt",
                os.path.join(ckpt_root, step), "--sampler", "ddim",
                "--sampler_steps", "4", "--save", "--n_iter", "0",
                "--batch_size", "4", "--outdir", outdir,
            ]))
            assert os.listdir(os.path.join(outdir, "samples"))
        finally:
            os.chdir(cwd)


class TestEPSpecs:
    def test_specs_shape(self):
        from eo_diffusion_tpu.parallel.mesh import ep_param_specs, make_mesh

        model = DiT(TINY_MOE)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                            jnp.zeros((1,), jnp.int32))
        mesh = make_mesh(model=2)
        specs = ep_param_specs(params, mesh)
        moe = specs["params"]["block_1"]["moe"]
        assert moe["w_in"] == P("model", None, None)
        assert moe["b_out"] == P("model", None)
        assert moe["router"]["kernel"] == P()
        # dense blocks untouched
        assert specs["params"]["block_0"]["mlp_in"]["kernel"] == P()
