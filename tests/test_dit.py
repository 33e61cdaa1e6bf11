"""DiT backbone tests (models/dit.py — beyond-reference model family).

Covers the adaLN-Zero contract (exact identity/zero output at init), the
UNet-compatible call surface (cond concat, class labels + CFG null row),
learning on a tiny config, sampler integration, and TP sharding of the
qkv/proj_out projections via the existing tp_param_specs matcher.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from eo_diffusion_tpu.models.dit import DiT, DiTConfig, dit_b, dit_s, posemb_sincos_2d


def tiny_cfg(**kw):
    base = dict(image_size=16, in_channels=3, out_channels=3, patch_size=4,
                hidden_size=64, depth=2, num_heads=4)
    base.update(kw)
    return DiTConfig(**base)


def init_model(cfg, **init_kw):
    m = DiT(cfg)
    x = jnp.zeros((2, cfg.image_size, cfg.image_size,
                   cfg.in_channels - init_kw.get("cond", jnp.zeros((2, 1, 1, 0))).shape[-1]
                   if "cond" in init_kw else cfg.in_channels), jnp.float32)
    t = jnp.zeros((2,), jnp.int32)
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x, t, **init_kw)
    return m, params, x, t


class TestForward:
    def test_shape_and_zero_init(self):
        m, params, x, t = init_model(tiny_cfg())
        out = m.apply(params, x + 1.0, t)
        assert out.shape == x.shape
        # adaLN-Zero + zero-init head: a fresh DiT predicts exactly zero
        assert float(jnp.abs(out).max()) == 0.0

    def test_params_f32_under_bf16_compute(self):
        cfg = tiny_cfg(dtype=jnp.bfloat16)
        m = DiT(cfg)
        x = jnp.zeros((1, 16, 16, 3), jnp.bfloat16)
        params = jax.jit(m.init)(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32))
        assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(params))
        out = m.apply(params, x, jnp.zeros((1,), jnp.int32))
        assert out.dtype == jnp.bfloat16

    def test_cond_concat(self):
        cfg = tiny_cfg(in_channels=6)  # 3 image + 3 cond channels
        m = DiT(cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
        c = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 3))
        t = jnp.zeros((2,), jnp.int32)
        params = jax.jit(m.init)(jax.random.PRNGKey(0), x, t, cond=c)
        assert m.apply(params, x, t, cond=c).shape == (2, 16, 16, 3)

    def test_float_timesteps_accepted(self):
        # flow-matching feeds fractional t * time_scale
        m, params, x, t = init_model(tiny_cfg())
        out = m.apply(params, x, jnp.array([13.7, 999.2], jnp.float32))
        assert out.shape == x.shape

    def test_posemb_distinct_rows(self):
        pe = posemb_sincos_2d(4, 4, 64)
        assert pe.shape == (16, 64)
        d = np.linalg.norm(np.asarray(pe)[:, None] - np.asarray(pe)[None], axis=-1)
        assert (d + np.eye(16) * 1e9).min() > 1e-3  # no two positions collide

    def test_factory_configs(self):
        s = dit_s(64)
        b = dit_b(256)
        assert s.tokens == 256 and s.hidden_size // s.num_heads == 64
        assert b.tokens == 1024 and b.hidden_size // b.num_heads == 64


class TestClassConditioning:
    def test_label_changes_output_after_perturb(self):
        cfg = tiny_cfg(num_classes=5, class_dropout_prob=0.1)
        m = DiT(cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
        t = jnp.full((2,), 10, jnp.int32)
        params = jax.jit(m.init)(jax.random.PRNGKey(0), x, t,
                                 y=jnp.zeros((2,), jnp.int32))
        # zero-init gates hide label influence at init; nudge the head
        params = jax.tree.map(
            lambda p: p + 0.05 * jax.random.normal(jax.random.PRNGKey(3), p.shape),
            params)
        o0 = m.apply(params, x, t, y=jnp.array([0, 0]))
        o1 = m.apply(params, x, t, y=jnp.array([3, 3]))
        assert float(jnp.abs(o0 - o1).max()) > 1e-6

    def test_null_row_exists_for_cfg(self):
        cfg = tiny_cfg(num_classes=5, class_dropout_prob=0.1)
        assert cfg.label_vocab == 6
        m = DiT(cfg)
        x = jnp.zeros((1, 16, 16, 3))
        t = jnp.zeros((1,), jnp.int32)
        params = jax.jit(m.init)(jax.random.PRNGKey(0), x, t,
                                 y=jnp.zeros((1,), jnp.int32))
        emb = params["params"]["label_embed"]["embedding"]
        assert emb.shape[0] == 6
        # the null index (== num_classes) is a valid label at apply time
        m.apply(params, x, t, y=jnp.array([5]))

    def test_train_step_owns_label_dropout(self):
        """The module never drops labels (single-owner convention); the
        Trainer reads class_dropout_prob from DiT.cfg and make_train_step
        applies the dropout — null-row gradient must be nonzero under
        prob=1 (every label dropped to the null class)."""
        from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
        from eo_diffusion_tpu.train.trainer import TrainState, make_train_step

        cfg = tiny_cfg(num_classes=5, class_dropout_prob=1.0)
        m = DiT(cfg)
        x = jnp.zeros((4, 16, 16, 3))
        t = jnp.zeros((4,), jnp.int32)
        y = jnp.zeros((4,), jnp.int32)
        params = jax.jit(m.init)(jax.random.PRNGKey(0), x, t, y=y)
        # module-level: train=True must NOT drop (output independent of rngs)
        a = m.apply(params, x, t, y=y, train=True)
        b = m.apply(params, x, t, y=y)
        assert float(jnp.abs(a - b).max()) == 0.0

        import optax
        tx = optax.sgd(1.0)
        # zero-init gates/head block all gradients at init; nudge params so
        # the conditioning path carries gradient
        params = jax.tree.map(
            lambda p: p + 0.05 * jax.random.normal(jax.random.PRNGKey(9), p.shape),
            params)
        state = TrainState.create(params, tx)
        apply_fn = (lambda p, xx, tt, cond=None, y=None, train=False,
                    dropout_rng=None: m.apply(p, xx, tt, cond=cond, y=y))
        diff = GaussianDiffusion.create(timesteps=10, image_size=16,
                                        in_channels=3)
        step = jax.jit(make_train_step(
            diff, apply_fn, tx, ema_decay=0.9, ema_every=1,
            class_conditional=True, class_dropout_prob=1.0, num_classes=5))
        data = jax.random.normal(jax.random.PRNGKey(2), (4, 16, 16, 3))
        state2, _ = step(state, {"image": data, "label": y},
                         jax.random.PRNGKey(3))
        emb0 = state.params["params"]["label_embed"]["embedding"]
        emb1 = state2.params["params"]["label_embed"]["embedding"]
        delta = jnp.abs(emb1 - emb0)
        # with prob=1 every sample trains the null row (index 5) and only it
        assert float(delta[5].max()) > 0.0
        assert float(delta[:5].max()) == 0.0


class TestCrossAttention:
    def test_identity_at_init_and_context_sensitivity(self):
        """context_dim > 0: zero-init cross-attn is an exact no-op at init;
        after a nudge the output depends on the context tokens."""
        cfg = tiny_cfg(context_dim=12)
        m = DiT(cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
        t = jnp.full((2,), 7, jnp.int32)
        ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 5, 12))
        params = jax.jit(m.init)(jax.random.PRNGKey(0), x, t, context=ctx)
        # fresh model: zero output head regardless of context
        assert float(jnp.abs(m.apply(params, x, t, context=ctx)).max()) == 0.0
        params = jax.tree.map(
            lambda p: p + 0.05 * jax.random.normal(jax.random.PRNGKey(3), p.shape),
            params)
        o1 = m.apply(params, x, t, context=ctx)
        o2 = m.apply(params, x, t, context=ctx[:, ::-1] * 2.0)
        assert float(jnp.abs(o1 - o2).max()) > 1e-6

    def test_wrapper_crossattn_and_hybrid_keys(self):
        """The ConditioningWrapper key matrix covers the DiT family too."""
        from eo_diffusion_tpu.models.wrapper import ConditioningWrapper

        cfg = tiny_cfg(in_channels=6, context_dim=12)
        m = DiT(cfg)
        x = jnp.zeros((2, 16, 16, 3))
        t = jnp.zeros((2,), jnp.int32)
        ctx = jnp.zeros((2, 5, 12))
        cond = jnp.zeros((2, 16, 16, 3))
        params = jax.jit(m.init)(jax.random.PRNGKey(0), x, t, cond=cond,
                                 context=ctx)
        w = ConditioningWrapper(m, "hybrid")
        out = w(params, x, t, {"c_concat": cond, "c_crossattn": ctx})
        assert out.shape == (2, 16, 16, 3)

    def test_context_required_when_configured(self):
        cfg = tiny_cfg(context_dim=12)
        m = DiT(cfg)
        x = jnp.zeros((1, 16, 16, 3))
        t = jnp.zeros((1,), jnp.int32)
        with pytest.raises(AssertionError, match="context"):
            jax.jit(m.init)(jax.random.PRNGKey(0), x, t)


class TestLearning:
    def test_fits_eps_on_fixed_target(self):
        """A tiny DiT must learn to predict a fixed target from noise input
        (gradient flows through patchify, blocks, adaLN and the head)."""
        cfg = tiny_cfg()
        m = DiT(cfg)
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (8, 16, 16, 3))
        target = jnp.tile(jnp.linspace(-1, 1, 16)[None, :, None, None], (8, 1, 16, 3))
        t = jnp.zeros((8,), jnp.int32)
        params = jax.jit(m.init)(rng, x, t)
        tx = optax.adam(2e-3)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt):
            def loss_fn(p):
                return jnp.mean((m.apply(p, x, t) - target) ** 2)
            loss, g = jax.value_and_grad(loss_fn)(params)
            u, opt = tx.update(g, opt, params)
            return optax.apply_updates(params, u), opt, loss

        l0 = None
        for _ in range(60):
            params, opt, loss = step(params, opt)
            l0 = float(loss) if l0 is None else l0
        assert float(loss) < 0.25 * l0, (l0, float(loss))


class TestSamplerIntegration:
    def test_ddim_sample_runs(self):
        from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion

        cfg = tiny_cfg()
        m = DiT(cfg)
        x = jnp.zeros((1, 16, 16, 3))
        params = jax.jit(m.init)(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32))
        diff = GaussianDiffusion.create(timesteps=20, image_size=16, in_channels=3)
        fn = lambda xx, tt, c, y: m.apply(params, xx, tt, cond=c, y=y)
        out = jax.jit(lambda r: diff.ddim_sample(fn, r, 2, num_steps=5).x)(
            jax.random.PRNGKey(1))
        assert out.shape == (2, 16, 16, 3)
        assert np.isfinite(np.asarray(out)).all()


class TestTrainerTP:
    """DiT through the real Trainer with TrainerConfig.tp: loss parity vs
    the replicated run + 'model'-sharded qkv leaves (the same contract
    test_train.TestTPTrainer establishes for the UNet)."""

    def _run(self, tp: bool, steps: int = 2):
        from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
        from eo_diffusion_tpu.parallel.mesh import make_mesh
        from eo_diffusion_tpu.train.trainer import Trainer, TrainerConfig

        if tp and len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        cfg = TrainerConfig(lr=1e-3, batch_size=8, epochs=1, timesteps=10,
                            model_ema_steps=1, warmup_epochs=1, seed=3, tp=tp)
        model = DiT(tiny_cfg())
        diffusion = GaussianDiffusion.create(timesteps=10, image_size=16,
                                             in_channels=3)
        mesh = make_mesh(model=4) if tp else None
        tr = Trainer(cfg, model, diffusion, steps_per_epoch=steps, mesh=mesh)
        rng = np.random.default_rng(7)
        batches = [{"image": rng.normal(size=(8, 16, 16, 3)).astype(np.float32) * 0.3}
                   for _ in range(steps)]
        state = tr.init(jax.random.PRNGKey(0), batches[0])
        losses = []
        for b in batches:
            state, m = tr.step(state, b)
            losses.append(float(m["loss"]))
        return state, losses

    def test_tp_state_sharded_and_loss_matches(self):
        s_rep, l_rep = self._run(tp=False)
        s_tp, l_tp = self._run(tp=True)
        np.testing.assert_allclose(l_rep, l_tp, rtol=2e-4, atol=2e-5)
        shardings = [l.sharding for l in jax.tree.leaves(s_tp.params)]
        assert any("model" in str(s.spec) for s in shardings), shardings


class TestTensorParallel:
    def test_tp_specs_shard_qkv_and_proj(self):
        from jax.sharding import PartitionSpec as P

        from eo_diffusion_tpu.parallel.mesh import make_mesh, tp_param_specs

        if len(jax.devices()) < 2:
            pytest.skip("needs multi-device mesh")
        mesh = make_mesh(jax.devices()[:4], model=2)
        cfg = tiny_cfg()
        m = DiT(cfg)
        x = jnp.zeros((1, 16, 16, 3))
        params = jax.jit(m.init)(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32))
        specs = tp_param_specs(params, mesh)
        flat = jax.tree_util.tree_flatten_with_path(
            specs, is_leaf=lambda s: isinstance(s, P))[0]
        qkv_k = [s for p, s in flat if "qkv" in str(p) and "kernel" in str(p)]
        out_k = [s for p, s in flat if "proj_out" in str(p) and "kernel" in str(p)]
        assert qkv_k and all(s == P(None, "model") for s in qkv_k)
        assert out_k and all(s == P("model", None) for s in out_k)
