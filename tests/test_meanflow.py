"""MeanFlow (arXiv:2505.13447): average-velocity one-step generation.

The math tests pin the jvp-based loss and the sampler update against an
ANALYTIC average-velocity field: for point-mass data at x*, straight-line
trajectories all pass through x*, so

    u*(z, r, t) = (z - x*) / t      (independent of r),

its total derivative along the flow is exactly zero, and one sampling step
from any noise must land exactly on x*. This validates the MeanFlow
identity wiring (jvp tangents, time packing, signs) end to end without a
trained network.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eo_diffusion_tpu.diffusion.meanflow import MeanFlow

SIZE, CHANS = 8, 3


def _analytic_field(x_star, time_scale):
    """The exact average-velocity field for point-mass data at x_star."""

    def model_fn(z, t_packed, cond, y):
        t = t_packed[:, 0] / time_scale
        return (z.astype(jnp.float32) - x_star) / t[:, None, None, None]

    return model_fn


class TestMeanFlowMath:
    def setup_method(self):
        self.mf = MeanFlow.create(image_size=SIZE, in_channels=CHANS,
                                  time_sampling="uniform", adaptive_p=0.0)
        self.x_star = jnp.tanh(
            jnp.arange(SIZE * SIZE * CHANS, dtype=jnp.float32)
            .reshape(1, SIZE, SIZE, CHANS) / 37.0)

    def test_analytic_field_has_zero_loss(self):
        """u* satisfies the MeanFlow identity exactly: du*/dt along the
        trajectory is 0 and u* == v, so the loss vanishes (up to f32)."""
        x0 = jnp.tile(self.x_star, (16, 1, 1, 1))
        model_fn = _analytic_field(self.x_star, self.mf.time_scale)
        loss = self.mf.train_loss(model_fn, jax.random.PRNGKey(0), x0)
        # scale-relative: v = (z - x*)/t can be large at small t
        assert float(loss) < 1e-6, float(loss)

    def test_perturbed_field_has_positive_loss(self):
        x0 = jnp.tile(self.x_star, (16, 1, 1, 1))
        exact = _analytic_field(self.x_star, self.mf.time_scale)
        bad = lambda z, tp, c, y: exact(z, tp, c, y) + 0.1
        loss = self.mf.train_loss(bad, jax.random.PRNGKey(0), x0)
        assert float(loss) > 1e-3, float(loss)



    @pytest.mark.parametrize("num_steps", [1, 4])
    def test_sampling_exact_on_analytic_field(self, num_steps):
        """x = eps - 1 * u*(eps, 0, 1) = x* — one call, exact landing; the
        n-step split must land on x* too (u* is exact on every segment)."""
        model_fn = _analytic_field(self.x_star, self.mf.time_scale)
        out = self.mf.sample(model_fn, jax.random.PRNGKey(3), 4,
                             num_steps=num_steps)
        np.testing.assert_allclose(
            np.asarray(out.x), np.tile(np.asarray(self.x_star), (4, 1, 1, 1)),
            atol=1e-4)

    def test_sample_tr_ordering_and_ratio(self):
        t, r = self.mf._sample_tr(jax.random.PRNGKey(1), 4096)
        assert bool(jnp.all(r <= t))
        frac_ne = float(jnp.mean(r < t))
        assert abs(frac_ne - self.mf.ratio_rt) < 0.05, frac_ne
        mf0 = dataclasses.replace(self.mf, ratio_rt=0.0)
        t0, r0 = mf0._sample_tr(jax.random.PRNGKey(1), 256)
        assert bool(jnp.all(t0 == r0))

    def test_r_equals_t_reduces_to_flow_matching(self):
        """At ratio_rt=0 the (t-r) term vanishes: the target is exactly the
        conditional velocity v, i.e. plain flow matching on (t, t)."""
        mf0 = dataclasses.replace(self.mf, ratio_rt=0.0)
        x0 = jnp.tile(self.x_star, (8, 1, 1, 1))
        # a model that returns a constant c: loss must equal mean((c - v)^2)
        const = 0.3 * jnp.ones((), jnp.float32)
        model_fn = lambda z, tp, c, y: jnp.full(
            (z.shape[0], SIZE, SIZE, CHANS), const)
        rng = jax.random.PRNGKey(5)
        loss = mf0.train_loss(model_fn, rng, x0)
        # reproduce the internal draws (same split structure as train_loss)
        tr_rng, n_rng = jax.random.split(rng)
        t, _ = mf0._sample_tr(tr_rng, 8)
        eps = jax.random.normal(n_rng, x0.shape, jnp.float32)
        v = eps - x0
        expect = jnp.mean((const - v) ** 2)
        np.testing.assert_allclose(float(loss), float(expect), rtol=1e-5)

    def test_adaptive_weight_normalizes(self):
        """With p=1 each sample contributes ~sq/(sq+c) <= 1: the loss is
        bounded regardless of per-sample error scale (paper eq. 21)."""
        mf = dataclasses.replace(self.mf, adaptive_p=1.0, adaptive_c=1e-3)
        x0 = jnp.tile(self.x_star, (8, 1, 1, 1))
        bad = lambda z, tp, c, y: jnp.full_like(z, 100.0, dtype=jnp.float32)
        loss = mf.train_loss(bad, jax.random.PRNGKey(0), x0)
        assert 0.5 < float(loss) <= 1.0 + 1e-6, float(loss)

    def test_method_heun_rejected(self):
        model_fn = _analytic_field(self.x_star, self.mf.time_scale)
        with pytest.raises(AssertionError, match="average-velocity"):
            self.mf.sample(model_fn, jax.random.PRNGKey(0), 2, num_steps=2,
                           method="heun")

    def test_mask_inpainting_final_paste(self):
        model_fn = _analytic_field(self.x_star, self.mf.time_scale)
        mask = jnp.zeros((1, SIZE, SIZE, 1)).at[:, :4].set(1.0)
        known = 0.5 * jnp.ones((4, SIZE, SIZE, CHANS))
        out = self.mf.sample(model_fn, jax.random.PRNGKey(2), 4, num_steps=2,
                             mask=mask, x0=known)
        got = np.asarray(out.x)
        np.testing.assert_allclose(got[:, :4], 0.5, atol=1e-6)

    def test_log_every_frames(self):
        model_fn = _analytic_field(self.x_star, self.mf.time_scale)
        out = self.mf.sample(model_fn, jax.random.PRNGKey(2), 2, num_steps=4,
                             log_every=2)
        assert out.intermediates.shape == (2, 2, SIZE, SIZE, CHANS)


class TestCFGIntegrated:
    """CFG-integrated training (paper §4, eq. 24): the tangent/target
    velocity becomes v~ = omega v + (1-omega) sg(u(z,t,t|null))."""

    def setup_method(self):
        self.mf = MeanFlow.create(image_size=SIZE, in_channels=CHANS,
                                  time_sampling="uniform", adaptive_p=0.0,
                                  cfg_omega=2.0, cfg_null_index=5,
                                  cfg_dropout=0.25)
        self.x_star = jnp.tanh(
            jnp.arange(SIZE * SIZE * CHANS, dtype=jnp.float32)
            .reshape(1, SIZE, SIZE, CHANS) / 37.0)

    def test_requires_labels(self):
        x0 = jnp.tile(self.x_star, (8, 1, 1, 1))
        model_fn = _analytic_field(self.x_star, self.mf.time_scale)
        with pytest.raises(AssertionError, match="CFG-integrated"):
            self.mf.train_loss(model_fn, jax.random.PRNGKey(0), x0)

    def test_analytic_field_still_zero_loss(self):
        """For point-mass data the marginal field equals the conditional
        one, so v~ == v for ANY omega and the exact u* stays a zero of the
        guided objective — the identity wiring is omega-invariant."""
        x0 = jnp.tile(self.x_star, (16, 1, 1, 1))
        y = jnp.zeros((16,), jnp.int32)
        model_fn = _analytic_field(self.x_star, self.mf.time_scale)
        loss = self.mf.train_loss(model_fn, jax.random.PRNGKey(0), x0, y=y)
        assert float(loss) < 1e-6, float(loss)

    def test_null_branch_sees_null_labels(self):
        """The extra stop-graded forward must be called with the null row
        (it estimates the MARGINAL field); the primal call must see real
        (possibly dropped) labels."""
        seen = []

        def spy(z, tp, c, y):
            seen.append(np.asarray(y))
            t = tp[:, 0] / self.mf.time_scale
            return (z.astype(jnp.float32) - self.x_star) / t[:, None, None, None]

        x0 = jnp.tile(self.x_star, (8, 1, 1, 1))
        y = jnp.asarray(np.arange(8) % 5, jnp.int32)
        self.mf.train_loss(spy, jax.random.PRNGKey(3), x0, y=y)
        # first trace call = u_null (all-null labels), later = primal/jvp
        assert (seen[0] == 5).all()
        assert any((s != 5).any() for s in seen[1:])

    def test_guided_target_differs_from_plain(self):
        """On a field whose null branch disagrees with the conditional one,
        omega != 1 must change the loss (the guided mixture is real)."""
        x0 = jnp.tile(self.x_star, (16, 1, 1, 1))
        y = jnp.zeros((16,), jnp.int32)

        def classy(z, tp, c, yy):
            t = tp[:, 0] / self.mf.time_scale
            base = (z.astype(jnp.float32) - self.x_star) / t[:, None, None, None]
            return base + 0.3 * (yy == 5).astype(jnp.float32)[:, None, None, None]

        plain = dataclasses.replace(self.mf, cfg_omega=1.0)
        l_plain = float(plain.train_loss(classy, jax.random.PRNGKey(0), x0,
                                         y=y))
        l_cfg = float(self.mf.train_loss(classy, jax.random.PRNGKey(0), x0,
                                         y=y))
        assert abs(l_plain - l_cfg) > 1e-4, (l_plain, l_cfg)

    def test_grads_flow_only_through_primal(self):
        """stop_gradient walls: grads w.r.t. a scale on the null branch
        must be zero; on the primal branch nonzero."""
        x0 = jnp.tile(self.x_star, (8, 1, 1, 1))
        y = jnp.zeros((8,), jnp.int32)

        def loss_of(s_null, s_primal):
            def fn(z, tp, c, yy):
                t = tp[:, 0] / self.mf.time_scale
                base = (z.astype(jnp.float32) - self.x_star
                        ) / t[:, None, None, None]
                is_null = (yy == 5).astype(jnp.float32)[:, None, None, None]
                return base * (is_null * s_null + (1 - is_null) * s_primal)

            # cfg_dropout=0 so no sample routes through the null PRIMAL path
            mf = dataclasses.replace(self.mf, cfg_dropout=0.0)
            return mf.train_loss(fn, jax.random.PRNGKey(1), x0, y=y)

        g_null = float(jax.grad(loss_of, argnums=0)(1.0, 1.0))
        g_primal = float(jax.grad(loss_of, argnums=1)(1.0, 1.0))
        assert g_null == 0.0, g_null
        assert abs(g_primal) > 1e-8, g_primal
class TestDualTimeModels:
    def _loss_and_grads(self, model, params, mf, x0):
        """Grads after 2 warmup steps: the zero-init output heads make all
        INTERIOR gradients exactly zero at init (out = 0 * h), so the
        r-embedding path only sees gradient once the heads move."""
        import optax

        def loss(p, rng):
            fn = lambda x, t, c, y: model.apply(p, x, t, cond=c, y=y)
            return mf.train_loss(fn, rng, x0)

        tx = optax.adam(1e-3)
        opt = tx.init(params)
        for i in range(2):
            _, g = jax.value_and_grad(loss)(params, jax.random.PRNGKey(i))
            up, opt = tx.update(g, opt)
            params = optax.apply_updates(params, up)
        return jax.value_and_grad(loss)(params, jax.random.PRNGKey(7))

    def test_unet_dual_time_grads_flow_into_r_embed(self):
        from eo_diffusion_tpu.models.unet import UNet, UNetConfig

        cfg = UNetConfig(image_size=SIZE, in_channels=CHANS,
                         model_channels=16, out_channels=CHANS,
                         num_res_blocks=1, channel_mult=(1, 2),
                         dual_time=True)
        model = UNet(cfg)
        mf = MeanFlow.create(image_size=SIZE, in_channels=CHANS,
                             ratio_rt=1.0)  # every sample exercises r != t
        x = jnp.zeros((2, SIZE, SIZE, CHANS))
        t_packed = mf.pack_time(jnp.array([0.7, 0.9]), jnp.array([0.2, 0.9]))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t_packed)
        flat = jax.tree_util.tree_leaves_with_path(params)
        r_leaves = [p for p, _ in flat if "time_embed_r0" in str(p)]
        assert r_leaves, "dual_time UNet grew no r-embedding params"
        loss, grads = self._loss_and_grads(model, params, mf,
                                           jnp.ones((2, SIZE, SIZE, CHANS)))
        assert np.isfinite(float(loss))
        gnorm = sum(
            float(jnp.sum(jnp.abs(g))) for p, g in
            jax.tree_util.tree_leaves_with_path(grads)
            if "time_embed_r" in str(p))
        assert gnorm > 0, "no gradient reached the r-embedding MLP"

    def test_unet_rejects_unpacked_t_when_dual(self):
        from eo_diffusion_tpu.models.unet import UNet, UNetConfig

        cfg = UNetConfig(image_size=SIZE, in_channels=CHANS,
                         model_channels=16, out_channels=CHANS,
                         num_res_blocks=1, channel_mult=(1, 2),
                         dual_time=True)
        x = jnp.zeros((2, SIZE, SIZE, CHANS))
        with pytest.raises(AssertionError, match="dual_time"):
            jax.eval_shape(UNet(cfg).init, jax.random.PRNGKey(0), x,
                           jnp.zeros((2,)))

    def test_dit_dual_time_forward_and_grads(self):
        from eo_diffusion_tpu.models.dit import DiT, DiTConfig

        cfg = DiTConfig(image_size=16, in_channels=CHANS, out_channels=CHANS,
                        patch_size=4, hidden_size=32, depth=2, num_heads=2,
                        dual_time=True, attn_impl="xla")
        model = DiT(cfg)
        mf = MeanFlow.create(image_size=16, in_channels=CHANS, ratio_rt=1.0)
        x = jnp.zeros((2, 16, 16, CHANS))
        t_packed = mf.pack_time(jnp.array([0.7, 0.9]), jnp.array([0.2, 0.1]))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t_packed)
        assert "r_embed_0" in params["params"], list(params["params"])
        out = model.apply(params, x, t_packed)
        assert out.shape == x.shape
        loss, grads = self._loss_and_grads(model, params, mf,
                                           jnp.ones((2, 16, 16, CHANS)))
        assert np.isfinite(float(loss))
        gnorm = sum(
            float(jnp.sum(jnp.abs(g))) for p, g in
            jax.tree_util.tree_leaves_with_path(grads)
            if "r_embed" in str(p))
        assert gnorm > 0


class TestMeanFlowLearns:
    def test_one_step_samples_approach_point_mass(self):
        """End-to-end learning evidence on the cheapest possible task: with
        point-mass data the optimum is u*(z,r,t) = (z - x*)/t; after a
        short training run the ONE-CALL samples must be much closer to x*
        than the untrained model's."""
        import optax

        from eo_diffusion_tpu.models.unet import UNet, UNetConfig

        cfg = UNetConfig(image_size=SIZE, in_channels=CHANS,
                         model_channels=16, out_channels=CHANS,
                         num_res_blocks=1, channel_mult=(1, 2),
                         dual_time=True)
        model = UNet(cfg)
        mf = MeanFlow.create(image_size=SIZE, in_channels=CHANS)
        x_star = 0.4 * jnp.ones((1, SIZE, SIZE, CHANS))
        x0 = jnp.tile(x_star, (16, 1, 1, 1))
        t0 = mf.pack_time(jnp.zeros((16,)), jnp.zeros((16,)))
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x0, t0)
        tx = optax.adam(2e-3)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt, rng):
            fn = lambda p: mf.train_loss(
                lambda x, t, c, y: model.apply(p, x, t, cond=c, y=y),
                rng, x0)
            loss, g = jax.value_and_grad(fn)(params)
            up, opt = tx.update(g, opt)
            return optax.apply_updates(params, up), opt, loss

        @jax.jit
        def one_step_err(params, rng):
            fn = lambda x, t, c, y: model.apply(params, x, t, cond=c, y=y)
            out = mf.sample(fn, rng, 8, num_steps=1)
            return jnp.mean((out.x - x_star) ** 2)

        err0 = float(one_step_err(params, jax.random.PRNGKey(99)))
        rng = jax.random.PRNGKey(1)
        for _ in range(150):
            rng, k = jax.random.split(rng)
            params, opt, loss = step(params, opt, k)
        err1 = float(one_step_err(params, jax.random.PRNGKey(99)))
        assert err1 < 0.25 * err0, (err0, err1)


class TestMeanFlowParallel:
    """The loss jvp composes with sharded training: FSDP-sharded params
    (forward-mode AD through jit-inserted collectives) train to the same
    losses as replicated — the meanflow x parallelism contract."""

    def _run(self, fsdp, steps=2):
        from eo_diffusion_tpu.cli.presets import build_process, get_preset
        from eo_diffusion_tpu.train.trainer import Trainer, TrainerConfig

        preset = get_preset("tiny-meanflow")
        cfg = TrainerConfig(lr=1e-3, batch_size=8, epochs=1, timesteps=50,
                            model_ema_steps=1, warmup_epochs=1, seed=3,
                            fsdp=fsdp, fsdp_min_size=2**10)
        from eo_diffusion_tpu.cli.presets import build_denoiser

        model = build_denoiser(preset.model_config(bf16=False))
        proc = build_process(preset, 50, preset.image_size)
        tr = Trainer(cfg, model, proc, steps_per_epoch=steps)
        rng = np.random.default_rng(7)
        batches = [{"image": rng.normal(size=(8, SIZE, SIZE, 3))
                    .astype(np.float32) * 0.3} for _ in range(steps)]
        state = tr.init(jax.random.PRNGKey(0), batches[0])
        losses = []
        for b in batches:
            state, m = tr.step(state, b)
            losses.append(float(m["loss"]))
        return state, losses

    def test_fsdp_matches_replicated(self):
        s_rep, l_rep = self._run(fsdp=False)
        s_fsdp, l_fsdp = self._run(fsdp=True)
        assert any("data" in str(l.sharding.spec)
                   for l in jax.tree.leaves(s_fsdp.params))
        np.testing.assert_allclose(l_rep, l_fsdp, rtol=2e-4, atol=2e-5)


class TestMeanFlowCLI:
    @pytest.fixture(scope="class")
    def ckpt(self, tmp_path_factory):
        from eo_diffusion_tpu.cli import train as train_cli

        root = tmp_path_factory.mktemp("cli_meanflow")
        sample_dir = str(root / "results_mf")
        cwd = os.getcwd()
        os.chdir(str(root))
        try:
            args = train_cli.parse_args([
                "--preset", "tiny-meanflow", "--epochs", "1",
                "--steps_per_epoch", "3", "--batch_size", "8", "--lr", "2e-3",
                "--dir", sample_dir, "--sample_every", "2",
                "--save_every", "3", "--log_freq", "1", "--n_samples", "4",
            ])
            train_cli.main(args)
        finally:
            os.chdir(cwd)
        ckpt_root = os.path.join(str(root), "logs", "results_mf")
        steps = sorted(d for d in os.listdir(ckpt_root)
                       if d.startswith("steps_"))
        assert steps, ckpt_root
        return os.path.join(ckpt_root, steps[-1]), str(root)

    @pytest.mark.parametrize("steps", ["1", "4"])
    def test_inference_roundtrip_one_step(self, ckpt, steps):
        from eo_diffusion_tpu.cli import inference as infer_cli

        ckpt_dir, root = ckpt
        outdir = os.path.join(root, f"infer_mf{steps}")
        args = infer_cli.parse_args([
            "--preset", "tiny-meanflow", "--ckpt", ckpt_dir,
            "--sampler_steps", steps, "--save", "--samples_fid",
            "--n_iter", "0", "--batch_size", "4", "--outdir", outdir,
        ])
        infer_cli.main(args)
        assert os.listdir(os.path.join(outdir, "samples_fid"))

    def test_dit_meanflow_train_smoke(self, tmp_path):
        """Backbone x process composition: dual-time DiT under MeanFlow
        trains through the CLI (the jvp runs through attention blocks)."""
        from eo_diffusion_tpu.cli import train as train_cli

        cwd = os.getcwd()
        os.chdir(str(tmp_path))
        try:
            args = train_cli.parse_args([
                "--preset", "tiny-dit-meanflow", "--epochs", "1",
                "--steps_per_epoch", "2", "--batch_size", "8",
                "--dir", str(tmp_path / "r"), "--sample_every", "100",
                "--save_every", "2", "--log_freq", "1", "--n_samples", "4",
            ])
            train_cli.main(args)
        finally:
            os.chdir(cwd)
