"""Sequence-parallel ring attention (ops.attention.ring_attention).

The reference is single-GPU (SURVEY.md §2.3) — this is the framework's own
SP/context-parallel commitment: K/V shards rotate around the mesh axis with
ppermute while online-softmax statistics merge, so peak per-chip activation
memory is O(T/n). Tests run on the virtual 8-device CPU mesh (conftest).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import eo_diffusion_tpu.ops.attention as A
from eo_diffusion_tpu.parallel.mesh import make_mesh


def _qkv(b=2, t=256, h=4, d=16, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    mk = lambda s: jnp.asarray(rng.normal(size=(b, t, h, d)), dtype)
    return mk(0), mk(1), mk(2)


class TestRingAttention:
    def test_matches_xla_forward(self):
        q, k, v = _qkv()
        mesh = make_mesh(data=jax.device_count() // 4, model=4)
        ref = A.xla_attention(q, k, v)
        out = jax.jit(lambda *a: A.ring_attention(*a, mesh=mesh))(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_is_a_real_ring_not_a_gather(self):
        """The compiled HLO must move K/V by collective-permute (one-hop ring
        traffic) and never all-gather the full sequence onto one chip."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        q, k, v = _qkv(t=512)
        mesh = make_mesh(data=jax.device_count() // 8, model=8)
        shd = NamedSharding(mesh, P(None, "model", None, None))
        args = [jax.device_put(x, shd) for x in (q, k, v)]
        compiled = jax.jit(
            lambda *a: A.ring_attention(*a, mesh=mesh),
            in_shardings=(shd,) * 3, out_shardings=shd,
        ).lower(*args).compile()
        hlo = compiled.as_text()
        assert "collective-permute" in hlo, "no ring traffic in the HLO"
        assert "all-gather" not in hlo, "ring attention all-gathered K/V"
        out = compiled(*args)
        ref = A.xla_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_gradients_match_xla(self):
        """Differentiable end-to-end: ppermute's transpose is the reverse
        ring, so training with sequence-sharded activations works."""
        q, k, v = _qkv(t=128)
        mesh = make_mesh(data=jax.device_count() // 4, model=4)
        loss_ref = lambda q, k, v: jnp.sum(A.xla_attention(q, k, v) ** 2)
        loss_ring = lambda q, k, v: jnp.sum(
            A.ring_attention(q, k, v, mesh=mesh) ** 2)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
        for a, b in zip(g_ring, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)

    def test_bf16_inputs(self):
        """bf16 activations with f32 statistics (the training dtype mix)."""
        q, k, v = _qkv(t=128, dtype=jnp.bfloat16)
        mesh = make_mesh(data=jax.device_count() // 4, model=4)
        ref = A.xla_attention(q, k, v)
        out = jax.jit(lambda *a: A.ring_attention(*a, mesh=mesh))(q, k, v)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=2e-2, rtol=2e-2)

    def test_indivisible_seq_asserts(self):
        q, k, v = _qkv(t=100)
        mesh = make_mesh(data=jax.device_count() // 8, model=8)
        with pytest.raises(AssertionError, match="seq len"):
            A.ring_attention(q, k, v, mesh=mesh)

    def test_dp_sp_compose_without_batch_replication(self):
        """With a data axis > 1 the batch dim must ride P('data', ...) inside
        the shard_map — otherwise every chip replicates the full batch and
        recomputes all data shards' attention (ADVICE r3). Check both parity
        and that batch-sharded inputs stay sharded (no all-gather over data
        in the compiled HLO)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        q, k, v = _qkv(b=4, t=256)
        mesh = make_mesh(data=2, model=4)
        shd = NamedSharding(mesh, P("data", "model", None, None))
        args = [jax.device_put(x, shd) for x in (q, k, v)]
        compiled = jax.jit(
            lambda *a: A.ring_attention(*a, mesh=mesh),
            in_shardings=(shd,) * 3, out_shardings=shd,
        ).lower(*args).compile()
        hlo = compiled.as_text()
        assert "all-gather" not in hlo, "batch was replicated over data"
        out = compiled(*args)
        ref = A.xla_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_long_seq_beyond_resident_cap_shards(self):
        """T > _MAX_RESIDENT_KV is exactly the regime ring attention is for:
        per-chip KV residency is T/n. Run one at 8192 over 8 shards (1024
        resident per device) against the XLA reference."""
        q, k, v = _qkv(b=1, t=8192, h=1, d=8, seed=3)
        mesh = make_mesh(data=jax.device_count() // 8, model=8)
        ref = A.xla_attention(q, k, v)
        out = jax.jit(lambda *a: A.ring_attention(*a, mesh=mesh))(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-5, rtol=5e-5)


class TestSequenceShardedContext:
    """sequence_sharded_attention routes the shared attention dispatch
    (attention_from_qkv) through the ring — any backbone using it (UNet
    AttentionBlock, DiTBlock) runs context-parallel with no model changes."""

    def test_qkv_dispatch_matches_xla_both_layouts(self):
        rng = np.random.default_rng(4)
        b, t, h, d = 2, 64, 4, 16
        qkv = jnp.asarray(rng.normal(size=(b, t, 3 * h * d)), jnp.float32)
        mesh = make_mesh(data=jax.device_count() // 4, model=4)
        for new_order in (False, True):
            ref = A.attention_from_qkv(qkv, h, new_order=new_order,
                                       impl="xla")
            with A.sequence_sharded_attention(mesh, "model"):
                out = jax.jit(lambda x, _no=new_order: A.attention_from_qkv(
                    x, h, new_order=_no))(qkv)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       atol=2e-5, rtol=2e-5)

    def test_indivisible_seq_falls_back(self):
        rng = np.random.default_rng(5)
        qkv = jnp.asarray(rng.normal(size=(1, 50, 3 * 32)), jnp.float32)
        mesh = make_mesh(data=jax.device_count() // 8, model=8)
        ref = A.attention_from_qkv(qkv, 2, impl="xla")
        with A.sequence_sharded_attention(mesh, "model"):
            out = jax.jit(lambda x: A.attention_from_qkv(x, 2))(qkv)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    def test_dit_forward_parity_under_context(self):
        """Whole-model check: a DiT forward traced inside the context equals
        the plain forward (16 tokens ring over 4 shards)."""
        from eo_diffusion_tpu.models.dit import DiT, DiTConfig

        cfg = DiTConfig(image_size=16, in_channels=3, out_channels=3,
                        patch_size=4, hidden_size=32, depth=2, num_heads=4)
        model = DiT(cfg)
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.normal(size=(2, 16, 16, 3)), jnp.float32)
        t = jnp.zeros((2,), jnp.int32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t)
        mesh = make_mesh(data=jax.device_count() // 4, model=4)
        ref = model.apply(params, x, t)
        with A.sequence_sharded_attention(mesh, "model"):
            out = jax.jit(lambda p, xx, tt: model.apply(p, xx, tt))(
                params, x, t)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=5e-5, rtol=5e-5)


class TestTrainerSP:
    """TrainerConfig.sp routes training-time attention through the ring
    (mirrors the tp head-sharded activation at trainer.py _attn_ctx)."""

    def _run(self, sp):
        from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
        from eo_diffusion_tpu.models.unet import UNet, UNetConfig
        from eo_diffusion_tpu.train.trainer import Trainer, TrainerConfig

        cfg = TrainerConfig(lr=1e-3, batch_size=8, epochs=1, timesteps=10,
                            model_ema_steps=1, warmup_epochs=1, seed=3, sp=sp)
        ucfg = UNetConfig(image_size=8, in_channels=3, model_channels=32,
                          out_channels=3, num_res_blocks=1,
                          attention_resolutions=(2,), channel_mult=(1, 2),
                          num_heads=4)
        model = UNet(ucfg)
        diffusion = GaussianDiffusion.create(timesteps=10, image_size=8,
                                             in_channels=3)
        mesh = make_mesh(model=4) if sp else None
        tr = Trainer(cfg, model, diffusion, steps_per_epoch=1, mesh=mesh)
        rng = np.random.default_rng(7)
        batch = {"image": rng.normal(size=(8, 8, 8, 3)).astype(np.float32) * 0.3}
        state = tr.init(jax.random.PRNGKey(0), batch)
        _, m = tr.step(state, batch)
        return float(m["loss"])

    def test_sp_loss_matches_replicated(self):
        np.testing.assert_allclose(self._run(False), self._run(True),
                                   rtol=2e-4, atol=2e-5)

    def test_tp_and_sp_mutually_exclusive(self):
        from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
        from eo_diffusion_tpu.models.unet import UNet, UNetConfig
        from eo_diffusion_tpu.train.trainer import Trainer, TrainerConfig

        cfg = TrainerConfig(lr=1e-3, batch_size=8, epochs=1, timesteps=10,
                            tp=True, sp=True)
        ucfg = UNetConfig(image_size=8, in_channels=3, model_channels=16,
                          out_channels=3, num_res_blocks=1,
                          attention_resolutions=(2,), channel_mult=(1, 2),
                          num_heads=2)
        with pytest.raises(AssertionError, match="pick one"):
            Trainer(cfg, UNet(ucfg),
                    GaussianDiffusion.create(timesteps=10, image_size=8,
                                             in_channels=3),
                    steps_per_epoch=1, mesh=make_mesh(model=4))
