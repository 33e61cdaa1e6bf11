"""UNet backbone tests: shapes, param-count parity with the reference, plan
construction, conditioning paths, and preset configs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eo_diffusion_tpu.models.unet import (
    UNet,
    UNetConfig,
    build_unet_plan,
    unet_clouds,
    unet_eo_train,
    unet_small,
)


def _args(cfg, img=None, y=None, cond=None, dtype=jnp.float32):
    n = 2
    size = img if img is not None else cfg.image_size
    cc = cfg.in_channels - (cond or 0)
    x = jnp.zeros((n, size, size, cc), dtype)
    t = jnp.zeros((n,), jnp.int32)
    kwargs = {}
    if cond:
        kwargs["cond"] = jnp.zeros((n, size, size, cond), dtype)
    if y is not None:
        kwargs["y"] = jnp.zeros((n,), jnp.int32)
    return x, t, kwargs


def _init(cfg, img=None, y=None, cond=None):
    # jit the whole init: one XLA program instead of hundreds of slow
    # eager-op compiles (single-core CPU CI).
    model = UNet(cfg)
    x, t, kwargs = _args(cfg, img=img, y=y, cond=cond)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, **kwargs)
    return model, params, x, t, kwargs


def _shape_init(cfg, y=None, cond=None):
    """Param shapes only -- no compute (for param-count parity tests)."""
    model = UNet(cfg)
    x, t, kwargs = _args(cfg, y=y, cond=cond)
    return jax.eval_shape(model.init, jax.random.PRNGKey(0), x, t, **kwargs)


def n_params(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


TINY = UNetConfig(
    image_size=16, in_channels=3, model_channels=32, out_channels=3,
    num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2), num_heads=4,
)


class TestShapes:
    def test_forward_shape(self):
        model, params, x, t, kw = _init(TINY)
        out = model.apply(params, x, t)
        assert out.shape == x.shape

    def test_zero_init_output(self):
        # zero-init out conv => fresh model predicts exactly 0 (reference zero_module)
        model, params, x, t, kw = _init(TINY)
        out = model.apply(params, jnp.ones_like(x), t)
        np.testing.assert_array_equal(np.asarray(out), 0.0)

    def test_cond_concat(self):
        cfg = UNetConfig(
            image_size=16, in_channels=7, model_channels=32, out_channels=3,
            num_res_blocks=1, attention_resolutions=(), channel_mult=(1, 2),
        )
        model, params, x, t, kw = _init(cfg, cond=4)
        out = model.apply(params, x, t, **kw)
        assert out.shape == (2, 16, 16, 3)

    def test_class_conditional(self):
        cfg = UNetConfig(
            image_size=16, in_channels=3, model_channels=32, out_channels=3,
            num_res_blocks=1, attention_resolutions=(), channel_mult=(1, 2),
            num_classes=5,
        )
        model, params, x, t, kw = _init(cfg, y=True)
        out = model.apply(params, x, t, **kw)
        assert out.shape == x.shape
        # missing y must fail loudly (reference unet_openai.py:758-760)
        with pytest.raises(AssertionError):
            model.apply(params, x, t)

    def test_bf16_compute(self):
        cfg = TINY.__class__(**{**TINY.__dict__, "dtype": jnp.bfloat16})
        model, params, x, t, kw = _init(cfg)
        out = model.apply(params, x.astype(jnp.bfloat16), t)
        assert out.dtype == jnp.bfloat16

    def test_odd_28px_updown(self):
        cfg = unet_small(28)
        model, params, x, t, kw = _init(cfg)
        out = model.apply(params, x, t)
        assert out.shape == x.shape


class TestParamParity:
    """Golden param counts from the torch reference (dead nout/act/conv_out
    head excluded -- see unet_openai.py:744 and SURVEY.md §2.4)."""

    def test_eo_train_config(self):
        assert n_params(_shape_init(unet_eo_train(64))) == 55_564_419

    def test_clouds_config(self):
        assert n_params(_shape_init(unet_clouds(64))) == 88_217_219

    def test_unet_small_32(self):
        assert n_params(_shape_init(unet_small(32))) == 2_578_883

    def test_class_conditional_count(self):
        cfg = UNetConfig(
            image_size=64, in_channels=3, model_channels=64, out_channels=3,
            num_res_blocks=2, attention_resolutions=(4, 8), channel_mult=(1, 2, 3, 4),
            num_heads=8, num_classes=5,
        )
        assert n_params(_shape_init(cfg, y=True)) == 22_081_603


class TestPlan:
    def test_plan_matches_reference_structure(self):
        # clouds config: 1 stem conv + 4 levels x 2 res(+attn at ds 4,8) + 3 downs
        plan = build_unet_plan(unet_clouds(64))
        assert len(plan.input_blocks) == 1 + 4 * 2 + 3
        assert plan.input_blocks[0][0].kind == "conv"
        assert len(plan.middle_block) == 3
        assert [s.kind for s in plan.middle_block] == ["res", "attn", "res"]
        assert len(plan.output_blocks) == 4 * 3
        assert plan.out_ch == 128

    def test_attention_placement(self):
        plan = build_unet_plan(unet_clouds(64))
        # ds sequence for input blocks: level0 ds=1 (no attn), level1 ds=2 (no),
        # level2 ds=4 (attn), level3 ds=8 (attn)
        attn_blocks = [b for b in plan.input_blocks if any(s.kind == "attn" for s in b)]
        assert len(attn_blocks) == 4  # 2 res-blocks at each of levels 2,3

    def test_skip_channel_bookkeeping(self):
        plan = build_unet_plan(unet_eo_train(64))
        # every output res block consumes ch + popped skip channels
        total_in = [b[0].in_ch for b in plan.output_blocks]
        assert all(c > 0 for c in total_in)


class TestAttentionOrders:
    @pytest.mark.parametrize("new_order", [False, True])
    def test_orders_run(self, new_order):
        cfg = UNetConfig(
            image_size=8, in_channels=3, model_channels=32, out_channels=3,
            num_res_blocks=1, attention_resolutions=(1,), channel_mult=(1,),
            num_heads=4, use_new_attention_order=new_order,
        )
        model, params, x, t, kw = _init(cfg)
        out = model.apply(params, x, t)
        assert out.shape == x.shape

    def test_orders_differ_only_in_weight_layout(self):
        # same math: with heads=1 both orders are identical given equal params
        kw = dict(
            image_size=8, in_channels=3, model_channels=32, out_channels=3,
            num_res_blocks=1, attention_resolutions=(1,), channel_mult=(1,),
            num_heads=1,
        )
        cfg_a = UNetConfig(**kw, use_new_attention_order=False)
        cfg_b = UNetConfig(**kw, use_new_attention_order=True)
        model_a, params, x, t, _ = _init(cfg_a)
        model_b = UNet(cfg_b)
        # use non-trivial params so attention actually mixes
        params = jax.tree.map(
            lambda p: jnp.asarray(np.random.default_rng(0).normal(0, 0.02, p.shape), p.dtype),
            params,
        )
        xa = jnp.asarray(np.random.default_rng(1).normal(size=x.shape), jnp.float32)
        out_a = model_a.apply(params, xa, t)
        out_b = model_b.apply(params, xa, t)
        np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5)


class TestRemat:
    def test_use_checkpoint_trains(self):
        """Gradient checkpointing path: loss+grad must work (regression: the
        traced `train` flag used to crash flax remat's Dropout bool-check)."""
        cfg = UNetConfig(
            image_size=8, in_channels=3, model_channels=32, out_channels=3,
            num_res_blocks=1, attention_resolutions=(), channel_mult=(1, 2),
            use_checkpoint=True, dropout=0.1,
        )
        model = UNet(cfg)
        x = jnp.ones((2, 8, 8, 3))
        t = jnp.zeros((2,), jnp.int32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t)

        def loss(p):
            out = model.apply(p, x, t, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
            return jnp.mean(out**2)

        g = jax.jit(jax.grad(loss))(params)
        assert all(np.isfinite(float(jnp.abs(l).max())) for l in jax.tree.leaves(g))

    def test_remat_matches_no_remat(self):
        kw = dict(image_size=8, in_channels=3, model_channels=32, out_channels=3,
                  num_res_blocks=1, attention_resolutions=(), channel_mult=(1, 2))
        m_plain = UNet(UNetConfig(**kw))
        m_remat = UNet(UNetConfig(**kw, use_checkpoint=True))
        x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 8, 3)), jnp.float32)
        t = jnp.asarray([1, 5])
        params = jax.jit(m_plain.init)(jax.random.PRNGKey(0), x, t)
        a = m_plain.apply(params, x, t)
        b = m_remat.apply(params, x, t)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
