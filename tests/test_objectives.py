"""Tests for prediction objectives (eps/x0/v), p2 reweighting, and
classifier-free guidance (label dropout + guided sampling)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
from eo_diffusion_tpu.models.unet import UNet, UNetConfig

SIZE = 8


def make(objective="eps", **kw):
    return GaussianDiffusion.create(
        timesteps=50, image_size=SIZE, in_channels=3, objective=objective, **kw
    )


class TestObjectives:
    def test_v_target_identity(self):
        # v = a*eps - s*x0 and the inverse maps must roundtrip
        d = make("v")
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.normal(size=(4, SIZE, SIZE, 3)), jnp.float32)
        noise = jnp.asarray(rng.normal(size=x0.shape), jnp.float32)
        t = jnp.asarray([0, 10, 25, 49])
        x_t = d.q_sample(x0, t, noise)
        v = d._target(x0, t, noise)
        eps_rec, x0_rec = d._to_eps_x0(v, x_t, t)
        np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(noise), atol=1e-4)
        np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)

    def test_x0_objective_roundtrip(self):
        d = make("x0")
        rng = np.random.default_rng(0)
        x0 = jnp.asarray(rng.normal(size=(4, SIZE, SIZE, 3)), jnp.float32)
        noise = jnp.asarray(rng.normal(size=x0.shape), jnp.float32)
        t = jnp.asarray([1, 10, 25, 48])
        x_t = d.q_sample(x0, t, noise)
        eps_rec, x0_rec = d._to_eps_x0(x0, x_t, t)
        np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)
        np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(noise), atol=1e-3)

    def test_perfect_v_model_zero_loss(self):
        d = make("v")

        # with x0=0: x_t = s*eps => v = a*eps - 0 = a/s * x_t
        def oracle(x, t, c, y):
            a = d.schedule.sqrt_alphas_cumprod[t][:, None, None, None]
            s = d.schedule.sqrt_one_minus_alphas_cumprod[t][:, None, None, None]
            return (a / s) * x

        loss = d.train_loss(oracle, jax.random.PRNGKey(0), jnp.zeros((16, SIZE, SIZE, 3)))
        assert float(loss) < 1e-9

    def test_sampling_equivalent_across_objectives(self):
        # a denoiser family expressing the SAME underlying score must produce
        # identical DDIM trajectories regardless of parameterization
        d_eps, d_v = make("eps"), make("v")
        x_T = jax.random.normal(jax.random.PRNGKey(0), (2, SIZE, SIZE, 3))

        def eps_model(x, t, c, y):
            return 0.2 * x

        def v_model(x, t, c, y):
            # v such that _to_eps_x0 gives eps = 0.2 x:
            # eps = s*x + a*v => v = (0.2*x - s*x)/a
            a = jnp.asarray(d_v.schedule.sqrt_alphas_cumprod)[t][:, None, None, None]
            s = jnp.asarray(d_v.schedule.sqrt_one_minus_alphas_cumprod)[t][:, None, None, None]
            return (0.2 - s) * x / a

        out_eps = d_eps.ddim_sample(eps_model, jax.random.PRNGKey(1), 2, num_steps=10, x_T=x_T).x
        out_v = d_v.ddim_sample(v_model, jax.random.PRNGKey(1), 2, num_steps=10, x_T=x_T).x
        np.testing.assert_allclose(np.asarray(out_eps), np.asarray(out_v), atol=1e-3)

    def test_invalid_objective_raises(self):
        with pytest.raises(AssertionError):
            make("nope")


class TestP2Weight:
    def test_gamma_zero_disables(self):
        d = make("eps")
        assert d._p2_weight(jnp.asarray([0, 10])) is None

    def test_weight_monotone_in_t(self):
        d = make("eps", p2_loss_weight_gamma=1.0)
        w = np.asarray(d._p2_weight(jnp.arange(50)))
        # high snr (small t) -> small weight; weight increases with t
        assert np.all(np.diff(w) > 0)
        assert w[0] < 0.1

    def test_formula(self):
        d = make("eps", p2_loss_weight_gamma=1.0, p2_loss_weight_k=1.0)
        t = jnp.asarray([25])
        acp = d.schedule.alphas_cumprod[25]
        snr = acp / (1 - acp)
        np.testing.assert_allclose(
            np.asarray(d._p2_weight(t))[0], 1.0 / (1.0 + snr), rtol=1e-5
        )


class TestLabelCFG:
    def test_null_class_embedding_row(self):
        cfg = UNetConfig(
            image_size=SIZE, in_channels=3, model_channels=32, out_channels=3,
            num_res_blocks=1, attention_resolutions=(), channel_mult=(1,),
            num_classes=5, class_dropout_prob=0.1,
        )
        assert cfg.label_vocab == 6
        model = UNet(cfg)
        x = jnp.zeros((1, SIZE, SIZE, 3))
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32), y=jnp.zeros((1,), jnp.int32)
        )
        assert params["params"]["label_emb"]["embedding"].shape == (6, 128)
        # null index runs
        out = model.apply(params, x, jnp.zeros((1,), jnp.int32), y=jnp.asarray([5]))
        assert out.shape == x.shape

    def test_ddpm_label_guidance_batches_double(self):
        d = make("eps")
        calls = []

        def spy(x, t, c, y):
            calls.append((x.shape[0], None if y is None else y.shape[0]))
            return jnp.zeros_like(x)

        y = jnp.asarray([1, 2])
        y_null = jnp.asarray([5, 5])
        d.ddpm_sample(spy, jax.random.PRNGKey(0), 2, y=y,
                      guidance_scale=3.0, y_uncond=y_null)
        assert calls[0] == (4, 4)

    def test_guided_combine_math(self):
        # e_u + g*(e_c - e_u) must reproduce through the label-CFG wrapper:
        # use a denoiser that returns y-dependent constants
        d = make("eps")

        def model(x, t, c, y):
            return jnp.broadcast_to(
                y.astype(jnp.float32)[:, None, None, None], x.shape
            )

        out = d.ddpm_sample(model, jax.random.PRNGKey(0), 1,
                            y=jnp.asarray([2]), y_uncond=jnp.asarray([0]),
                            guidance_scale=3.0, clip=False)
        # guided eps = 0 + 3*(2-0) = 6 at every step; just check finiteness &
        # that guidance changed the trajectory vs unguided y=2 (eps=2)
        out2 = d.ddpm_sample(model, jax.random.PRNGKey(0), 1,
                             y=jnp.asarray([2]), clip=False)
        assert not np.allclose(np.asarray(out.x), np.asarray(out2.x))

    def test_ddim_label_guidance(self):
        d = make("eps")
        calls = []

        def spy(x, t, c, y):
            calls.append(x.shape[0])
            return jnp.zeros_like(x)

        d.ddim_sample(spy, jax.random.PRNGKey(0), 2, num_steps=5,
                      y=jnp.asarray([0, 1]), y_uncond=jnp.asarray([5, 5]),
                      guidance_scale=2.0)
        assert calls[0] == 4

    def test_guidance_scale_one_no_double(self):
        d = make("eps")
        calls = []

        def spy(x, t, c, y):
            calls.append(x.shape[0])
            return jnp.zeros_like(x)

        d.ddpm_sample(spy, jax.random.PRNGKey(0), 2, y=jnp.asarray([0, 1]),
                      guidance_scale=1.0, y_uncond=jnp.asarray([5, 5]))
        assert calls[0] == 2

    def test_label_dropout_in_train_step(self):
        import optax

        from eo_diffusion_tpu.train.trainer import TrainState, make_train_step

        cfg = UNetConfig(
            image_size=SIZE, in_channels=3, model_channels=32, out_channels=3,
            num_res_blocks=1, attention_resolutions=(), channel_mult=(1,),
            num_classes=5, class_dropout_prob=1.0,  # always drop -> y==5 inside
        )
        model = UNet(cfg)
        seen = []

        def apply_fn(params, x, t, cond=None, y=None, train=False, dropout_rng=None):
            seen.append(np.asarray(y))
            return model.apply(params, x, t, cond=cond, y=y)

        d = make("eps")
        tx = optax.adamw(1e-3)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)),
            jnp.zeros((1,), jnp.int32), y=jnp.zeros((1,), jnp.int32))
        state = TrainState.create(params, tx)
        step = make_train_step(d, apply_fn, tx, ema_decay=0.9,
                               class_conditional=True, class_dropout_prob=1.0,
                               num_classes=5)
        batch = {"image": jnp.zeros((2, SIZE, SIZE, 3)), "label": jnp.asarray([0, 3])}
        step(state, batch, jax.random.PRNGKey(0))  # eager so `seen` fills
        assert np.all(seen[0] == 5)


class TestSelfConditioning:
    def _diffusion(self):
        return GaussianDiffusion.create(
            timesteps=20, image_size=SIZE, in_channels=3, self_condition=True
        )

    def test_train_loss_feeds_self_cond_channels(self):
        d = self._diffusion()
        shapes = []

        def spy(x, t, c, y):
            shapes.append(None if c is None else c.shape[-1])
            return jnp.zeros_like(x)

        d.train_loss(spy, jax.random.PRNGKey(0), jnp.zeros((4, SIZE, SIZE, 3)))
        # two passes, both with 3 self-cond channels
        assert shapes == [3, 3]

    def test_composes_with_cond(self):
        d = self._diffusion()
        shapes = []

        def spy(x, t, c, y):
            shapes.append(c.shape[-1])
            return jnp.zeros_like(x)

        cond = jnp.zeros((4, SIZE, SIZE, 4))
        d.train_loss(spy, jax.random.PRNGKey(0), jnp.zeros((4, SIZE, SIZE, 3)), cond=cond)
        assert shapes == [7, 7]  # 4 cond + 3 self-cond

    def test_sampling_carries_estimate(self):
        d = self._diffusion()
        seen = []

        def spy(x, t, c, y):
            seen.append(c is not None and c.shape[-1] == 3)
            return 0.1 * x

        out = d.ddpm_sample(spy, jax.random.PRNGKey(0), 2)
        assert out.x.shape == (2, SIZE, SIZE, 3)
        assert all(seen)

    def test_ddim_self_cond(self):
        d = self._diffusion()
        model = lambda x, t, c, y: 0.1 * x
        out = d.ddim_sample(model, jax.random.PRNGKey(0), 2, num_steps=5)
        assert np.isfinite(np.asarray(out.x)).all()

    def test_gradients_flow(self):
        d = self._diffusion()

        def loss(scale):
            model = lambda x, t, c, y: scale * (x + 0.01 * c.sum(-1, keepdims=True))
            return d.train_loss(model, jax.random.PRNGKey(0), jnp.ones((2, SIZE, SIZE, 3)))

        g = jax.grad(loss)(0.5)
        assert np.isfinite(float(g))


class TestDDIMClip:
    def test_clip_bounds_pred(self):
        d = make("eps")
        # adversarial model: huge eps -> unclipped pred_x0 explodes
        model = lambda x, t, c, y: 10.0 * jnp.ones_like(x)
        x_T = jax.random.normal(jax.random.PRNGKey(0), (1, SIZE, SIZE, 3))
        unclipped = d.ddim_sample(model, jax.random.PRNGKey(0), 1, num_steps=10, x_T=x_T).x
        clipped = d.ddim_sample(model, jax.random.PRNGKey(0), 1, num_steps=10, x_T=x_T, clip=True).x
        assert float(jnp.abs(clipped).max()) < float(jnp.abs(unclipped).max())
        assert float(jnp.abs(clipped).max()) < 10.0

    def test_clip_noop_when_in_range(self):
        # a well-behaved model: clip must not change the trajectory
        d = make("eps")

        def oracle(x, t, c, y):
            a = jnp.asarray(d.schedule.sqrt_alphas_cumprod)[t][:, None, None, None]
            s = jnp.asarray(d.schedule.sqrt_one_minus_alphas_cumprod)[t][:, None, None, None]
            return (x - a * 0.4) / s

        x_T = jax.random.normal(jax.random.PRNGKey(0), (1, SIZE, SIZE, 3))
        a = d.ddim_sample(oracle, jax.random.PRNGKey(0), 1, num_steps=10, x_T=x_T).x
        b = d.ddim_sample(oracle, jax.random.PRNGKey(0), 1, num_steps=10, x_T=x_T, clip=True).x
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestVLBWeight:
    def test_disabled_by_default(self):
        d = make("eps")
        assert d.elbo_weight == 0.0

    def test_lvlb_weights_finite_positive(self):
        d = make("eps", elbo_weight=1e-3)
        w = np.asarray(d._lvlb_weights())
        assert w.shape == (50,)
        assert np.all(np.isfinite(w)) and np.all(w > 0)
        assert w[0] == w[1]  # t=0 copied from t=1 (ddpm.py:173)

    def test_elbo_increases_loss(self):
        d0 = make("eps")
        d1 = make("eps", elbo_weight=1e-3)
        x0 = jnp.zeros((8, SIZE, SIZE, 3))
        l0 = float(d0.train_loss(lambda x, t, c, y: jnp.zeros_like(x), jax.random.PRNGKey(0), x0))
        l1 = float(d1.train_loss(lambda x, t, c, y: jnp.zeros_like(x), jax.random.PRNGKey(0), x0))
        assert l1 > l0


class TestZeroTerminalSNR:
    """v-prediction + zero-terminal-SNR (arXiv:2305.08891) through the process."""

    def _make(self):
        return GaussianDiffusion.create(
            timesteps=50, image_size=SIZE, in_channels=3, objective="v",
            zero_terminal_snr=True)

    def test_eps_objective_rejected(self):
        with pytest.raises(AssertionError, match="zero_terminal_snr"):
            GaussianDiffusion.create(timesteps=50, image_size=SIZE,
                                     in_channels=3, zero_terminal_snr=True)

    def test_ddpm_unclipped_rejected(self):
        d = self._make()
        model = lambda x, t, c, y: jnp.zeros_like(x)
        with pytest.raises(AssertionError, match="clip"):
            d.ddpm_sample(model, jax.random.PRNGKey(0), 1, clip=False)

    def test_ddpm_clipped_finite(self):
        d = self._make()
        model = lambda x, t, c, y: 0.1 * x
        out = d.ddpm_sample(model, jax.random.PRNGKey(0), 2, clip=True)
        assert np.isfinite(np.asarray(out.x)).all()

    def test_ddim_trailing_visits_terminal_step(self):
        # a model that poisons its output exactly where sqrt(acp[t]) == 0
        # (only the ZTSNR terminal row): trailing spacing must hit it,
        # uniform spacing must not (it starts below t = T-1)
        d = self._make()
        a_tab = jnp.asarray(d.schedule.sqrt_alphas_cumprod)

        def poison_at_terminal(x, t, c, y):
            a = a_tab[t][:, None, None, None]
            return jnp.ones_like(x) / jnp.maximum(a, 0.0)  # inf iff a == 0

        k = jax.random.PRNGKey(0)
        tr = d.ddim_sample(poison_at_terminal, k, 1, num_steps=5,
                           method="trailing").x
        assert not np.isfinite(np.asarray(tr)).all()
        uni = d.ddim_sample(poison_at_terminal, k, 1, num_steps=5).x
        assert np.isfinite(np.asarray(uni)).all()

    def test_ddim_trailing_finite(self):
        # at t=T-1 the v-param conversion x0 = a*x - s*v, eps = s*x + a*v has
        # a=0, s=1 -- exact and finite (no reciprocal-acp table involved)
        d = self._make()
        oracle = lambda x, t, c, y: -0.5 * x
        out = d.ddim_sample(oracle, jax.random.PRNGKey(0), 2, num_steps=10,
                            method="trailing")
        assert np.isfinite(np.asarray(out.x)).all()

    def test_terminal_pred_x0_ignores_x_T(self):
        # at the ZTSNR terminal step pred_x0 = a*x - s*v = -v: the signal
        # component of the first update cannot leak x_T's mean (the paper's
        # flaw); only the true-noise direction term carries x forward, and a
        # single trailing step at eta=0 with a constant-v model exposes the
        # split: d/dx_T x_prev = sqrt(1 - a_prev) exactly (no x0 leak), vs
        # the flawed schedule where pred_x0 itself depends on x_T
        d = self._make()
        vconst = lambda x, t, c, y: jnp.ones_like(x) * 0.3
        k = jax.random.PRNGKey(0)
        xa = jax.random.normal(k, (1, SIZE, SIZE, 3))
        delta = 100.0
        xb = xa + delta
        oa = d.ddim_sample(vconst, k, 1, num_steps=1, method="trailing", x_T=xa).x
        ob = d.ddim_sample(vconst, k, 1, num_steps=1, method="trailing", x_T=xb).x
        # single-step schedule: alphas_prev[0] = acp[0] (reference convention)
        a_prev = float(d.schedule.alphas_cumprod[0])
        expect = np.sqrt(1.0 - a_prev) * delta
        np.testing.assert_allclose(np.asarray(ob - oa),
                                   np.full_like(np.asarray(oa), expect),
                                   rtol=1e-4)

    def test_train_loss_finite(self):
        d = self._make()
        model = lambda x, t, c, y: 0.1 * x
        loss = d.train_loss(model, jax.random.PRNGKey(0),
                            jnp.zeros((8, SIZE, SIZE, 3)))
        assert np.isfinite(float(loss))


class TestMinSNRWeight:
    """min-SNR-gamma loss weighting (arXiv:2303.09556)."""

    def _mk(self, objective="eps", gamma=5.0):
        return GaussianDiffusion.create(
            timesteps=100, image_size=SIZE, in_channels=3,
            objective=objective, min_snr_gamma=gamma)

    def test_weight_formula_eps(self):
        d = self._mk("eps")
        t = jnp.arange(100)
        acp = jnp.asarray(d.schedule.alphas_cumprod)
        snr = acp / (1 - acp)
        w = d._min_snr_weight(t)
        expect = jnp.minimum(snr, 5.0) / snr
        np.testing.assert_allclose(np.asarray(w), np.asarray(expect),
                                   rtol=1e-5)
        # low-noise (high-SNR) steps are down-weighted, high-noise keep 1
        assert float(w[0]) < 1.0 and abs(float(w[-1]) - 1.0) < 1e-5

    def test_weight_formula_v_and_x0(self):
        dv, dx = self._mk("v"), self._mk("x0")
        t = jnp.arange(100)
        acp = jnp.asarray(dv.schedule.alphas_cumprod)
        snr = acp / (1 - acp)
        np.testing.assert_allclose(
            np.asarray(dv._min_snr_weight(t)),
            np.asarray(jnp.minimum(snr, 5.0) / (snr + 1.0)), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(dx._min_snr_weight(t)),
            np.asarray(jnp.minimum(snr, 5.0)), rtol=1e-5)

    def test_disabled_by_default_and_loss_changes(self):
        d0 = GaussianDiffusion.create(timesteps=100, image_size=SIZE,
                                      in_channels=3)
        assert d0._min_snr_weight(jnp.arange(3)) is None
        d1 = self._mk("eps")
        model = lambda x, t, c, y: jnp.zeros_like(x)
        x0 = jnp.full((8, SIZE, SIZE, 3), 0.3)
        l0 = float(d0.train_loss(model, jax.random.PRNGKey(0), x0))
        l1 = float(d1.train_loss(model, jax.random.PRNGKey(0), x0))
        assert np.isfinite([l0, l1]).all() and l1 < l0  # down-weighted only

    def test_training_tuple_carries_weighting(self):
        """r5: reweighted configs decompose too — training_tuple +
        training_weight reproduce the fused loss (the PP loss head's
        contract; full parity in test_pipeline_train.TestReweightedPP)."""
        d = self._mk("eps")
        rng = jax.random.PRNGKey(0)
        x0 = jnp.full((4, SIZE, SIZE, 3), 0.2)
        x_t, t, target = d.training_tuple(rng, x0)
        w = d.training_weight(t)
        assert w is not None and w.shape == (4,)
        model = lambda x, tt, c, y: 0.1 * x
        err = (model(x_t, t, None, None).astype(jnp.float32) - target) ** 2
        decomposed = float(jnp.mean(err * w[:, None, None, None]))
        fused = float(d.train_loss(model, rng, x0))
        np.testing.assert_allclose(decomposed, fused, rtol=1e-5)

    def test_ztsnr_v_composes(self):
        d = GaussianDiffusion.create(timesteps=100, image_size=SIZE,
                                     in_channels=3, objective="v",
                                     zero_terminal_snr=True,
                                     min_snr_gamma=5.0)
        w = d._min_snr_weight(jnp.arange(100))
        assert np.all(np.isfinite(np.asarray(w)))  # SNR=0 terminal row ok
        loss = d.train_loss(lambda x, t, c, y: 0.1 * x,
                            jax.random.PRNGKey(0),
                            jnp.zeros((8, SIZE, SIZE, 3)))
        assert np.isfinite(float(loss))
