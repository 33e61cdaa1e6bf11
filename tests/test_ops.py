"""Pallas kernel tests (interpreter mode on CPU): flash attention and fused
GroupNorm match their XLA reference implementations, including gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eo_diffusion_tpu.ops import attention as A
from eo_diffusion_tpu.ops import group_norm as G


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(A, "_INTERPRET", True)
    yield


def _qkv(b=2, t=64, h=4, d=16, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda s: jnp.asarray(rng.normal(size=(b, t, h, d)), dtype)
    return mk(0), mk(1), mk(2)


class TestXLAAttention:
    def test_matches_manual_softmax(self):
        q, k, v = _qkv()
        scale = 1.0 / np.sqrt(np.sqrt(16))
        w = jnp.einsum("bthc,bshc->bhts", q * scale, k * scale)
        w = jax.nn.softmax(w, axis=-1)
        ref = jnp.einsum("bhts,bshc->bthc", w, v)
        np.testing.assert_allclose(np.asarray(A.xla_attention(q, k, v)),
                                   np.asarray(ref), atol=1e-5)


class TestFlashAttention:
    def test_matches_xla(self):
        q, k, v = _qkv()
        ref = A.xla_attention(q, k, v)
        out = A.flash_attention(q, k, v, 32, 32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_uneven_seq_padding(self):
        # T=56 not divisible by the 32-block: padded KV must be masked out
        q, k, v = _qkv(t=56)
        ref = A.xla_attention(q, k, v)
        out = A.flash_attention(q, k, v, 32, 32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_odd_head_dim_padding(self):
        q, k, v = _qkv(d=48)
        ref = A.xla_attention(q, k, v)
        out = A.flash_attention(q, k, v, 32, 32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_gradients_match(self):
        q, k, v = _qkv(t=32)

        def loss_flash(q, k, v):
            return jnp.sum(A.flash_attention(q, k, v, 32, 32) ** 2)

        def loss_xla(q, k, v):
            return jnp.sum(A.xla_attention(q, k, v) ** 2)

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_resident_kernel_multi_chunk(self):
        # T=96 with block_k=32 -> 3 in-kernel chunks incl. online-softmax carry
        q, k, v = _qkv(t=96)
        ref = A.xla_attention(q, k, v)
        out = A.flash_attention(q, k, v, 32, 32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_gradients_multi_chunk_uneven(self):
        # Pallas backward with padded q rows (T=56 -> 64), a masked KV tail
        # chunk, and lane-padded head dim (48 -> 128)
        q, k, v = _qkv(t=56, d=48)

        def loss_flash(q, k, v):
            return jnp.sum(A.flash_attention(q, k, v, 32, 32) ** 2)

        def loss_xla(q, k, v):
            return jnp.sum(A.xla_attention(q, k, v) ** 2)

        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_gradients_grid_tiled_fallback(self, monkeypatch):
        # beyond the resident cap the vjp recomputes with XLA einsums
        monkeypatch.setattr(A, "_MAX_RESIDENT_KV", 48)
        q, k, v = _qkv(t=96)
        gf = jax.grad(lambda q, k, v: jnp.sum(A.flash_attention(q, k, v, 32, 32) ** 2),
                      argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(lambda q, k, v: jnp.sum(A.xla_attention(q, k, v) ** 2),
                      argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_grid_tiled_path(self, monkeypatch):
        # force T > _MAX_RESIDENT_KV so the grid-tiled online-softmax kernel runs
        monkeypatch.setattr(A, "_MAX_RESIDENT_KV", 32)
        q, k, v = _qkv(t=64)
        ref = A.xla_attention(q, k, v)
        out = A.flash_attention(q, k, v, 32, 32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_fused_dispatch_cpu_falls_back(self):
        # on CPU fused_attention must route to XLA regardless of seq length
        q, k, v = _qkv(t=64)
        out = A.fused_attention(q, k, v, min_seq=1)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(A.xla_attention(q, k, v)), atol=1e-5)


class TestAttentionFromQKV:
    """Zero-copy fused-qkv entry: kernel output must equal slice+reference
    for both reference head orders (unet_openai.py:456-519)."""

    def _qkv(self, b=2, t=64, heads=4, d=16, seed=0):
        rng = np.random.default_rng(seed)
        return jnp.asarray(rng.normal(size=(b, t, 3 * heads * d)), jnp.float32)

    @pytest.mark.parametrize("new_order", [False, True])
    def test_matches_sliced_reference(self, new_order):
        qkv = self._qkv()
        b, t, c3 = qkv.shape
        heads, d = 4, 16
        if new_order:
            r = qkv.reshape(b, t, 3, heads, d)
            q, k, v = r[:, :, 0], r[:, :, 1], r[:, :, 2]
        else:
            r = qkv.reshape(b, t, heads, 3, d)
            q, k, v = r[:, :, :, 0], r[:, :, :, 1], r[:, :, :, 2]
        ref = A.xla_attention(q, k, v).reshape(b, t, heads * d)
        out = A.attention_from_qkv(qkv, heads, new_order=new_order,
                                   impl="pallas", block_q=32, block_k=32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_gradients_match(self):
        qkv = self._qkv(t=32)

        def loss_k(qkv):
            return jnp.sum(A.attention_from_qkv(qkv, 4, impl="pallas",
                                                block_q=32, block_k=32) ** 2)

        def loss_ref(qkv):
            return jnp.sum(A.attention_from_qkv(qkv, 4, impl="xla") ** 2)

        gk = jax.grad(loss_k)(qkv)
        gr = jax.grad(loss_ref)(qkv)
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gr), atol=1e-4)

    def test_unaligned_t_falls_back(self):
        # T=56 doesn't align to the 8-row block constraint -> sliced path
        qkv = self._qkv(t=56)
        out = A.attention_from_qkv(qkv, 4, impl="auto", min_seq=1)
        r = qkv.reshape(2, 56, 4, 3, 16)
        ref = A.xla_attention(r[:, :, :, 0], r[:, :, :, 1], r[:, :, :, 2])
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(ref.reshape(2, 56, 64)), atol=1e-5)


class TestGroupNorm:
    def _xy(self, n=2, h=8, w=8, c=64, seed=0):
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.normal(size=(n, h, w, c)), jnp.float32)
        gamma = jnp.asarray(rng.normal(1, 0.1, (n, c)), jnp.float32)
        beta = jnp.asarray(rng.normal(0, 0.1, (n, c)), jnp.float32)
        return x, gamma, beta

    def test_reference_matches_flax_groupnorm(self):
        from flax import linen as nn

        x, gamma, beta = self._xy()
        # per-sample affine == flax GN when gamma/beta identical across batch
        gamma1 = jnp.broadcast_to(gamma[:1], gamma.shape)
        beta1 = jnp.broadcast_to(beta[:1], beta.shape)
        ref = nn.GroupNorm(num_groups=32, epsilon=1e-5).apply(
            {"params": {"scale": gamma1[0], "bias": beta1[0]}}, x
        )
        out = G.group_norm_reference(x, gamma1, beta1, 32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_pallas_matches_reference(self):
        x, gamma, beta = self._xy()
        ref = G.group_norm_reference(x, gamma, beta, 32, act="silu")
        out = G._gn_pallas(x, gamma, beta, 32, 1e-5, "silu", interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_pallas_no_act(self):
        x, gamma, beta = self._xy(c=128)
        ref = G.group_norm_reference(x, gamma, beta, 32, act="none")
        out = G._gn_pallas(x, gamma, beta, 32, 1e-5, "none", interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_film_composition(self):
        # fused per-sample affine == GN -> *(1+s)+t composition
        x, _, _ = self._xy()
        rng = np.random.default_rng(1)
        scale_p = jnp.asarray(rng.normal(1, 0.1, (64,)), jnp.float32)
        bias_p = jnp.asarray(rng.normal(0, 0.1, (64,)), jnp.float32)
        s = jnp.asarray(rng.normal(0, 0.2, (2, 64)), jnp.float32)
        t = jnp.asarray(rng.normal(0, 0.2, (2, 64)), jnp.float32)
        base = G.group_norm_reference(
            x, jnp.broadcast_to(scale_p[None], (2, 64)),
            jnp.broadcast_to(bias_p[None], (2, 64)), 32)
        ref = base * (1 + s[:, None, None, :]) + t[:, None, None, :]
        gamma_eff = scale_p[None] * (1 + s)
        beta_eff = bias_p[None] * (1 + s) + t
        out = G.group_norm_reference(x, gamma_eff, beta_eff, 32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_dispatch_cpu(self):
        x, gamma, beta = self._xy()
        out = G.fused_group_norm(x, gamma[0], beta[0], 32, act="silu")
        ref = G.group_norm_reference(
            x, jnp.broadcast_to(gamma[:1], gamma.shape),
            jnp.broadcast_to(beta[:1], beta.shape), 32, act="silu")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


class TestSinglePassKernel:
    def test_default_blocks_single_pass_matches(self):
        q, k, v = _qkv(t=56)
        ref = A.xla_attention(q, k, v)
        out = A.flash_attention(q, k, v)  # default block_k >= t -> single pass
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_single_pass_gradients(self):
        q, k, v = _qkv(t=32)
        gf = jax.grad(lambda q, k, v: jnp.sum(A.flash_attention(q, k, v) ** 2),
                      argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(lambda q, k, v: jnp.sum(A.xla_attention(q, k, v) ** 2),
                      argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestHeadShardedTP:
    """TP routing for the Pallas kernel (VERDICT r2 #4 / ADVICE r2 medium):
    under head_sharded_attention the fused-qkv kernel runs shard_mapped over
    the head axis with ZERO collectives -- no GSPMD all-gather of the full
    [B,3,H,T,D] activation around the Mosaic custom call."""

    def _qkv_flat(self, b=1, t=512, h=4, d=16):
        rng = np.random.default_rng(0)
        return jnp.asarray(rng.normal(size=(b, t, 3 * h * d)), jnp.float32), h

    def test_matches_xla_with_zero_collectives(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from eo_diffusion_tpu.parallel.mesh import make_mesh

        qkv, h = self._qkv_flat()
        mesh = make_mesh(data=jax.device_count() // 2, model=2)
        ref = A.attention_from_qkv(qkv, h, impl="xla")

        # legacy head-major channel layout: sharding the last dim over
        # 'model' IS a contiguous head sharding (what the Megatron
        # column-parallel qkv projection produces, mesh.tp_param_specs)
        shd = NamedSharding(mesh, P(None, None, "model"))
        f = lambda x: A.attention_from_qkv(x, h, impl="pallas")
        with A.head_sharded_attention(mesh, "model"):
            lowered = jax.jit(f, in_shardings=shd, out_shardings=shd).lower(qkv)
        compiled = lowered.compile()
        out = compiled(jax.device_put(qkv, shd))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

        hlo = compiled.as_text()
        for coll in ("all-gather", "all-to-all", "collective-permute", "all-reduce"):
            assert coll not in hlo, f"TP attention emitted a {coll}"

    def test_indivisible_heads_fall_back(self):
        """3 heads on a model=2 axis: routing declines, plain dispatch runs."""
        from eo_diffusion_tpu.parallel.mesh import make_mesh

        qkv, _ = self._qkv_flat(h=4)
        qkv = qkv[..., : 3 * 3 * 16]  # 3 heads of d=16
        mesh = make_mesh(data=jax.device_count() // 2, model=2)
        ref = A.attention_from_qkv(qkv, 3, impl="xla")
        with A.head_sharded_attention(mesh, "model"):
            out = jax.jit(lambda x: A.attention_from_qkv(x, 3, impl="pallas"))(qkv)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    def test_gradients_through_sharded_kernel(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from eo_diffusion_tpu.parallel.mesh import make_mesh

        qkv, h = self._qkv_flat(t=256)
        mesh = make_mesh(data=jax.device_count() // 2, model=2)
        gx = jax.grad(lambda x: jnp.sum(A.attention_from_qkv(x, h, impl="xla") ** 2))(qkv)
        loss = lambda x: jnp.sum(A.attention_from_qkv(x, h, impl="pallas") ** 2)
        with A.head_sharded_attention(mesh, "model"):
            gp = jax.jit(jax.grad(loss))(qkv)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=2e-3)


class TestFullLaneHeadDim:
    """D=128 takes the non-transposed kernels (no lane padding to dodge);
    keep that path covered now D<128 routes through the tpv variants."""

    def test_fwd_and_grads_at_d128(self):
        q, k, v = _qkv(b=1, t=64, h=2, d=128)
        ref = A.xla_attention(q, k, v)
        out = A.flash_attention(q, k, v, 32, 32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
        gf = jax.grad(lambda q, k, v: jnp.sum(A.flash_attention(q, k, v, 32, 32) ** 2),
                      argnums=(0, 1, 2))(q, k, v)
        gx = jax.grad(lambda q, k, v: jnp.sum(A.xla_attention(q, k, v) ** 2),
                      argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gx):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)

    def test_qkv5_fwd_at_d128(self):
        rng = np.random.default_rng(0)
        qkv5 = jnp.asarray(rng.normal(size=(1, 3, 2, 64, 128)), jnp.float32)
        ref = A._qkv5_ref_attention(qkv5)
        out = A._qkv5_flash(qkv5, 32, 32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_qkv5_fwd_at_d48(self):
        """The clouds head dim: tpv path, numerics vs XLA."""
        rng = np.random.default_rng(1)
        qkv5 = jnp.asarray(rng.normal(size=(1, 3, 2, 64, 48)), jnp.float32)
        ref = A._qkv5_ref_attention(qkv5)
        out = A._qkv5_flash(qkv5, 32, 32)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_qkv5_grad_at_d48(self):
        rng = np.random.default_rng(2)
        qkv5 = jnp.asarray(rng.normal(size=(1, 3, 2, 64, 48)), jnp.float32)
        gp = jax.grad(lambda x: jnp.sum(A._qkv5_flash(x, 32, 32) ** 2))(qkv5)
        gx = jax.grad(lambda x: jnp.sum(A._qkv5_ref_attention(x) ** 2))(qkv5)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=1e-3)
