"""Muon optimizer tests (train/muon.py): Newton-Schulz orthogonalization
quality, leaf routing (matrix kernels vs embeddings/biases), optimization
behavior vs plain momentum, Trainer integration + checkpoint roundtrip,
and FSDP composition. No reference counterpart (reference is AdamW-only,
train.py:75) — this is a beyond-reference training axis."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
from eo_diffusion_tpu.models.unet import UNet, UNetConfig
from eo_diffusion_tpu.train.muon import (
    muon_label_fn,
    muon_with_adamw,
    newton_schulz5,
    scale_by_muon,
)
from eo_diffusion_tpu.train.trainer import Trainer, TrainerConfig

TINY = UNetConfig(
    image_size=8, in_channels=3, model_channels=32, out_channels=3,
    num_res_blocks=1, attention_resolutions=(), channel_mult=(1, 2),
)


class TestNewtonSchulz:
    @pytest.mark.parametrize("shape", [(64, 64), (96, 32), (32, 96)])
    def test_singular_values_near_one(self, shape):
        g = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
        o = np.asarray(newton_schulz5(g))
        s = np.linalg.svd(o, compute_uv=False)
        # the official quintic converges to sigma in ~[0.7, 1.2] by design
        assert s.max() <= 1.35, s.max()
        assert s.min() >= 0.5, s.min()

    def test_preserves_singular_vectors(self):
        # NS approximates the polar factor UV^T: for a well-conditioned g
        # the result must align with the exact polar factor, not just be
        # orthogonal-ish
        g = jax.random.normal(jax.random.PRNGKey(1), (48, 48), jnp.float32)
        g = g + 5.0 * jnp.eye(48)  # push away from degenerate spectrum
        u, _, vt = np.linalg.svd(np.asarray(g))
        polar = u @ vt
        o = np.asarray(newton_schulz5(g))
        # cosine alignment per-element is too strict; check the subspace
        # agreement via the product o @ polar.T ~ I scaled
        prod = o @ polar.T
        offdiag = prod - np.diag(np.diag(prod))
        assert np.abs(offdiag).max() < 0.15 * np.abs(np.diag(prod)).mean()

    def test_zero_matrix_is_safe(self):
        o = np.asarray(newton_schulz5(jnp.zeros((16, 8))))
        assert np.isfinite(o).all()


class TestRouting:
    def _params(self):
        model = UNet(UNetConfig(
            image_size=8, in_channels=3, model_channels=32, out_channels=3,
            num_res_blocks=1, attention_resolutions=(), channel_mult=(1, 2),
            num_classes=4,
        ))
        return jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
            jnp.zeros((1,), jnp.int32), None, jnp.zeros((1,), jnp.int32))

    def test_kernels_muon_rest_adamw(self):
        params = self._params()
        labels = muon_label_fn(params)
        flat_p = jax.tree_util.tree_flatten_with_path(params)[0]
        flat_l = jax.tree.leaves(labels)
        assert len(flat_p) == len(flat_l)
        for (path, leaf), lab in zip(flat_p, flat_l):
            p = jax.tree_util.keystr(path).lower()
            if "label_emb" in p or "embedding" in p:
                assert lab == "adamw", p
            elif leaf.ndim >= 2:
                assert lab == "muon", p
            else:
                assert lab == "adamw", p
        # the UNet actually has both branches populated
        assert "muon" in flat_l and "adamw" in flat_l

    def test_update_shapes_and_finite(self):
        params = self._params()
        tx = muon_with_adamw(1e-3)
        state = tx.init(params)
        grads = jax.tree.map(lambda p: jnp.ones_like(p) * 0.01, params)
        updates, _ = tx.update(grads, state, params)
        for u, p in zip(jax.tree.leaves(updates), jax.tree.leaves(params)):
            assert u.shape == p.shape
            assert np.isfinite(np.asarray(u)).all()


class TestOptimization:
    def test_quadratic_converges(self):
        # min ||W - A||_F^2 with a deliberately ill-conditioned target: Muon's
        # orthogonalized steps move the small-singular-value directions as
        # fast as the dominant ones
        key = jax.random.PRNGKey(2)
        a = jax.random.normal(key, (32, 32)) * jnp.geomspace(1.0, 1e-3, 32)[None, :]
        params = {"w": jnp.zeros((32, 32))}

        def loss_fn(p):
            return jnp.sum((p["w"] - a) ** 2)

        tx = muon_with_adamw(3e-2)
        state = tx.init(params)

        @jax.jit
        def step(params, state):
            g = jax.grad(loss_fn)(params)
            u, state = tx.update(g, state, params)
            return optax.apply_updates(params, u), state

        l0 = float(loss_fn(params))
        # orthogonalized updates travel ~lr per singular direction per step
        # (not gradient-proportional), so convergence needs |sigma_max|/lr
        # steps — this is the point of the optimizer, not a weakness of it
        for _ in range(250):
            params, state = step(params, state)
        assert float(loss_fn(params)) < 0.05 * l0

    def test_lr_mult_scales_muon_branch_only(self):
        params = {"w": jnp.ones((8, 8)), "b": jnp.ones((8,))}
        grads = {"w": jnp.full((8, 8), 0.1), "b": jnp.full((8,), 0.1)}
        u1, _ = (tx1 := muon_with_adamw(1e-2, muon_lr_mult=1.0)).update(
            grads, tx1.init(params), params)
        u2, _ = (tx2 := muon_with_adamw(1e-2, muon_lr_mult=2.0)).update(
            grads, tx2.init(params), params)
        np.testing.assert_allclose(np.asarray(u2["w"]), 2 * np.asarray(u1["w"]),
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(u2["b"]), np.asarray(u1["b"]),
                                   rtol=1e-6)

    def test_schedule_callable_shared(self):
        sched = optax.linear_schedule(1e-2, 0.0, 10)
        params = {"w": jnp.ones((4, 4))}
        tx = muon_with_adamw(sched, muon_lr_mult=1.0)
        state = tx.init(params)
        g = {"w": jnp.full((4, 4), 0.1)}
        u_first, state = tx.update(g, state, params)
        for _ in range(9):
            _, state = tx.update(g, state, params)
        u_last, _ = tx.update(g, state, params)
        assert np.abs(np.asarray(u_last["w"])).max() < \
            0.2 * np.abs(np.asarray(u_first["w"])).max()

    def test_momentum_buffer_accumulates(self):
        params = {"w": jnp.ones((4, 4))}
        tx = scale_by_muon(momentum=0.9)
        state = tx.init(params)
        g = {"w": jnp.full((4, 4), 1.0)}
        _, s1 = tx.update(g, state, params)
        np.testing.assert_allclose(np.asarray(s1.momentum["w"]), 1.0)
        _, s2 = tx.update(g, s1, params)
        np.testing.assert_allclose(np.asarray(s2.momentum["w"]), 1.9)


class TestTrainerIntegration:
    def _run(self, optimizer, steps=3, fsdp=False, **kw):
        cfg = TrainerConfig(lr=1e-3, batch_size=8, epochs=1, timesteps=10,
                            model_ema_steps=1, warmup_epochs=1, seed=3,
                            optimizer=optimizer, fsdp=fsdp,
                            fsdp_min_size=2**10, **kw)
        model = UNet(TINY)
        diffusion = GaussianDiffusion.create(timesteps=10, image_size=8,
                                             in_channels=3)
        tr = Trainer(cfg, model, diffusion, steps_per_epoch=steps)
        rng = np.random.default_rng(7)
        batches = [{"image": rng.normal(size=(8, 8, 8, 3)).astype(np.float32) * 0.3}
                   for _ in range(steps)]
        state = tr.init(jax.random.PRNGKey(0), batches[0])
        losses = []
        for b in batches:
            state, m = tr.step(state, b)
            losses.append(float(m["loss"]))
        return tr, state, losses

    def test_muon_trains(self):
        _, state, losses = self._run("muon")
        assert all(np.isfinite(losses))
        # optimizer actually moved params (vs init through the same seed)
        _, state0, _ = self._run("muon", steps=1)
        moved = [np.abs(np.asarray(a) - np.asarray(b)).max()
                 for a, b in zip(jax.tree.leaves(jax.device_get(state.params)),
                                 jax.tree.leaves(jax.device_get(state0.params)))]
        assert max(moved) > 0

    def test_muon_differs_from_adamw(self):
        _, s_m, _ = self._run("muon", steps=2)
        _, s_a, _ = self._run("adamw", steps=2)
        diffs = [np.abs(np.asarray(a) - np.asarray(b)).max()
                 for a, b in zip(jax.tree.leaves(jax.device_get(s_m.params)),
                                 jax.tree.leaves(jax.device_get(s_a.params)))]
        assert max(diffs) > 1e-6

    def test_muon_checkpoint_roundtrip(self, tmp_path):
        from eo_diffusion_tpu.train.checkpoint import (
            restore_checkpoint,
            save_checkpoint,
        )

        tr, state, _ = self._run("muon")
        path = save_checkpoint(str(tmp_path), jax.device_get(state), step=3)
        tr2, template, _ = self._run("muon", steps=1)
        restored = restore_checkpoint(path, template)
        assert int(restored.step) == int(state.step)
        # the MuonState momentum buffers survive the roundtrip
        for x, y in zip(jax.tree.leaves(jax.device_get(state.opt_state)),
                        jax.tree.leaves(jax.device_get(restored.opt_state))):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        restored, m = tr2.step(restored,
                               {"image": np.zeros((8, 8, 8, 3), np.float32)})
        assert np.isfinite(float(m["loss"]))

    def test_muon_fsdp_matches_replicated(self):
        _, s_rep, l_rep = self._run("muon", fsdp=False)
        _, s_sh, l_sh = self._run("muon", fsdp=True)
        np.testing.assert_allclose(l_rep, l_sh, rtol=2e-4, atol=2e-5)
        for x, y in zip(jax.tree.leaves(jax.device_get(s_rep.params)),
                        jax.tree.leaves(jax.device_get(s_sh.params))):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=2e-3, atol=2e-5)

    def test_muon_with_grad_clip_and_skip_nonfinite(self):
        _, _, losses = self._run("muon", grad_clip=1.0, skip_nonfinite=True)
        assert all(np.isfinite(losses))


class TestCLI:
    def test_train_cli_muon(self, tmp_path):
        import os

        from eo_diffusion_tpu.cli import train as train_cli

        cwd = os.getcwd()
        os.chdir(tmp_path)
        try:
            args = train_cli.parse_args([
                "--preset", "tiny", "--epochs", "1", "--steps_per_epoch", "2",
                "--batch_size", "8", "--optimizer", "muon",
                "--muon_lr_mult", "0.5", "--dir", str(tmp_path / "samples"),
                "--sample_every", "0", "--save_every", "2", "--log_freq", "1",
            ])
            assert args.optimizer == "muon"
            train_cli.main(args)
        finally:
            os.chdir(cwd)
        ckpts = os.listdir(tmp_path / "logs" / "samples")
        assert any(e.startswith("steps_") for e in ckpts)
