"""Training-stack tests: EMA math, keyframe LR schedule golden values,
sharded train step over the virtual 8-device mesh, checkpoint roundtrip."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
from eo_diffusion_tpu.models.unet import UNet, UNetConfig
from eo_diffusion_tpu.parallel.mesh import (
    data_sharding,
    fsdp_param_specs,
    make_mesh,
)
from eo_diffusion_tpu.train.ema import adjusted_decay, ema_update, ema_update_every
from eo_diffusion_tpu.train.lr_schedules import KeyframeSchedule, warmup_cos_exp
from eo_diffusion_tpu.train.trainer import TrainState, Trainer, TrainerConfig, make_train_step


class TestEMA:
    def test_update_formula(self):
        ema = {"w": jnp.ones((4,))}
        p = {"w": jnp.zeros((4,))}
        out = ema_update(ema, p, 0.9)
        np.testing.assert_allclose(np.asarray(out["w"]), 0.9, rtol=1e-6)

    def test_adjusted_decay_matches_reference(self):
        # reference train.py:70-72 with defaults bs=128, steps=10, epochs=100
        adjust = 128 * 10 / 100
        alpha = min(1.0, (1 - 0.995) * adjust)
        assert adjusted_decay(0.995, 128, 10, 100) == pytest.approx(1 - alpha)

    def test_update_every_gating(self):
        ema = {"w": jnp.ones((2,))}
        p = {"w": jnp.zeros((2,))}
        hit = ema_update_every(ema, p, 0.5, jnp.int32(10), 5)
        miss = ema_update_every(ema, p, 0.5, jnp.int32(11), 5)
        np.testing.assert_allclose(np.asarray(hit["w"]), 0.5)
        np.testing.assert_allclose(np.asarray(miss["w"]), 1.0)


class TestKeyframeLR:
    def test_reference_composite_schedule(self):
        # golden: the exact train.py:76-85 schedule
        base_lr, spe, epochs = 1e-3, 100, 20
        sched = warmup_cos_exp(base_lr, spe, epochs, warmup_epochs=10)
        posmax, max_steps = 10 * spe, spe * epochs
        assert sched(0) == pytest.approx(base_lr / 100)
        assert sched(posmax) == pytest.approx(base_lr)
        # cos midpoint of warmup
        mid = posmax // 2
        expected = base_lr / 100 + (base_lr - base_lr / 100) * (1 - (1 + math.cos(0.5 * math.pi)) / 2)
        assert sched(mid) == pytest.approx(expected)
        # exp tail
        pos = posmax + 500
        assert sched(pos) == pytest.approx(base_lr * math.exp(-3 * 500 / (max_steps - posmax)))

    def test_table_matches_scalar_eval(self):
        sched = warmup_cos_exp(1e-3, 10, 4, warmup_epochs=2)
        tbl = sched.table(40)
        fresh = warmup_cos_exp(1e-3, 10, 4, warmup_epochs=2)
        for s in (0, 7, 20, 39):
            assert tbl[s] == pytest.approx(fresh(s), rel=1e-6)

    def test_optax_bridge_traceable(self):
        sched = warmup_cos_exp(1e-3, 10, 4, warmup_epochs=2).as_optax(40)
        val = jax.jit(sched)(jnp.int32(20))
        assert np.isfinite(float(val))

    def test_shorthand_frames(self):
        s = KeyframeSchedule([(0, 0.1), "cos", (10, 1.0)], end=10, units="steps")
        assert s(0) == pytest.approx(0.1)
        assert s(10) == pytest.approx(1.0)

    def test_out_of_order_raises(self):
        with pytest.raises(ValueError):
            KeyframeSchedule([(5, 0.1), (2, 0.2)], end=10, units="steps")

    def test_percent_units(self):
        s = KeyframeSchedule([{"position": 0, "lr": 0.0}, {"position": 1, "lr": 1.0}],
                             end=100, units="percent")
        assert s(50) == pytest.approx(0.5)

    def test_time_units(self, monkeypatch):
        """units="time" (reference train_utils.py:23,50-54,190-197): end is
        expected seconds, position = elapsed/end against the wall clock; past
        the expected end the last LR holds (get_lr_at_pos fallthrough)."""
        import eo_diffusion_tpu.train.lr_schedules as L

        now = [100.0]
        monkeypatch.setattr(L, "_timer", lambda: now[0])
        s = KeyframeSchedule([(0, 0.0), (1, 1.0)], end=10.0, units="time")
        assert s(0) == pytest.approx(0.0)
        now[0] = 105.0  # halfway through the expected 10 s
        assert s(123) == pytest.approx(0.5)  # step arg ignored
        assert s.progress == pytest.approx(0.5)
        now[0] = 112.0  # past the expected end: hold last LR
        assert s(0) == pytest.approx(0.5)

    def test_time_units_reject_table(self):
        s = KeyframeSchedule([(0, 0.0), (1, 1.0)], end=10.0, units="time")
        with pytest.raises(ValueError, match="wall clock"):
            s.table(10)

    def test_sample_lrs(self):
        """sample_lrs (train_utils.py:204-222) spans the schedule in every
        unit without disturbing schedule state."""
        s = KeyframeSchedule([(0, 0.0), (10, 1.0)], end=10, units="steps")
        lrs = s.sample_lrs(n=5)
        assert lrs == pytest.approx([0.0, 0.2, 0.4, 0.6, 0.8])
        assert s.last_lr == 0.0


TINY = UNetConfig(
    image_size=8, in_channels=3, model_channels=32, out_channels=3,
    num_res_blocks=1, attention_resolutions=(), channel_mult=(1, 2),
)


def _setup_state():
    model = UNet(TINY)
    diffusion = GaussianDiffusion.create(timesteps=10, image_size=8, in_channels=3)
    tx = optax.adamw(1e-3)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32)
    )
    state = TrainState.create(params, tx)
    apply_fn = lambda p, x, t, cond=None, y=None, train=False, dropout_rng=None: model.apply(p, x, t, cond=cond, y=y)
    step = make_train_step(diffusion, apply_fn, tx, ema_decay=0.9, ema_every=2)
    return state, step


class TestTrainStep:
    def test_step_updates_and_metrics(self):
        state, step = _setup_state()
        batch = {"image": jnp.ones((8, 8, 8, 3))}
        new_state, m = jax.jit(step)(state, batch, jax.random.PRNGKey(0))
        assert int(new_state.step) == 1
        assert np.isfinite(float(m["loss"])) and np.isfinite(float(m["grad_norm"]))
        # params changed
        diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), state.params, new_state.params)
        assert max(jax.tree.leaves(diff)) > 0

    def test_ema_gating_inside_step(self):
        state, step = _setup_state()
        batch = {"image": jnp.ones((4, 8, 8, 3))}
        jstep = jax.jit(step)
        # step 0: ema updates (0 % 2 == 0); step 1: frozen
        s1, _ = jstep(state, batch, jax.random.PRNGKey(0))
        ema_after_1 = jax.tree.leaves(s1.ema_params)[0].copy()
        s2, _ = jstep(s1, batch, jax.random.PRNGKey(1))
        ema_after_2 = jax.tree.leaves(s2.ema_params)[0]
        np.testing.assert_array_equal(np.asarray(ema_after_1), np.asarray(ema_after_2))

    def test_sharded_step_on_mesh(self):
        mesh = make_mesh()  # 8 virtual CPU devices
        assert mesh.shape["data"] * mesh.shape["model"] == 8
        state, step = _setup_state()
        bsh = data_sharding(mesh)
        jstep = jax.jit(step, in_shardings=(None, {"image": bsh}, None))
        batch = {"image": jax.device_put(jnp.ones((16, 8, 8, 3)), bsh)}
        new_state, m = jstep(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(m["loss"]))

    def test_fsdp_specs_shard_large_params(self):
        mesh = make_mesh(model=2)
        state, _ = _setup_state()
        specs = fsdp_param_specs(state.params, mesh, min_size=2**10)
        leaves = jax.tree.leaves(specs, is_leaf=lambda s: hasattr(s, "__iter__") or s == ())
        flat_params = jax.tree.leaves(state.params)
        flat_specs = jax.tree.leaves(specs, is_leaf=lambda x: not isinstance(x, dict))
        # at least one large param is sharded over 'model'
        assert any("model" in str(s) for s in flat_specs)


class TestGradAccum:
    """optax.MultiSteps accumulation (reference gradient_accumulate_every,
    denoising_diffusion_pytorch.py:757,795)."""

    def test_two_microsteps_equal_one_double_batch_step(self):
        # two identical micro-batches with the same rng produce the same grad
        # as the equivalent double batch (concat of the micro-batch with
        # itself); after k=2 micro-steps params must equal one plain step
        model = UNet(TINY)
        diffusion = GaussianDiffusion.create(timesteps=10, image_size=8, in_channels=3)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32)
        )
        apply_fn = (lambda p, x, t, cond=None, y=None, train=False, dropout_rng=None:
                    model.apply(p, x, t))
        batch = {"image": jnp.linspace(-0.5, 0.5, 4 * 8 * 8 * 3).reshape(4, 8, 8, 3)}
        rng = jax.random.PRNGKey(5)

        base = optax.adamw(1e-3)
        s_plain = TrainState.create(params, base)
        plain_step = jax.jit(make_train_step(diffusion, apply_fn, base, ema_decay=0.9))
        s_plain, _ = plain_step(s_plain, batch, rng)

        acc = optax.MultiSteps(optax.adamw(1e-3), 2)
        s_acc = TrainState.create(params, acc)
        acc_step = jax.jit(make_train_step(diffusion, apply_fn, acc, ema_decay=0.9))
        s_acc, _ = acc_step(s_acc, batch, rng)
        # mid-accumulation: no optimizer update has been applied yet
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(s_acc.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        s_acc, _ = acc_step(s_acc, batch, rng)
        for a, b in zip(jax.tree.leaves(s_plain.params), jax.tree.leaves(s_acc.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)

    def test_trainer_grad_accum_config(self):
        cfg = TrainerConfig(lr=1e-3, batch_size=8, epochs=1, timesteps=10,
                            model_ema_steps=1, warmup_epochs=1, grad_accum=2)
        model = UNet(TINY)
        diffusion = GaussianDiffusion.create(timesteps=10, image_size=8, in_channels=3)
        tr = Trainer(cfg, model, diffusion, steps_per_epoch=4)
        batch = {"image": np.full((8, 8, 8, 3), 0.2, np.float32)}
        state = tr.init(jax.random.PRNGKey(0), batch)
        p0 = jax.tree.leaves(jax.device_get(state.params))
        state, _ = tr.step(state, batch)
        p1 = jax.tree.leaves(jax.device_get(state.params))
        for a, b in zip(p0, p1):  # first micro-step: params frozen
            np.testing.assert_array_equal(a, b)
        state, _ = tr.step(state, batch)
        p2 = jax.tree.leaves(jax.device_get(state.params))
        assert any(np.abs(a - b).max() > 0 for a, b in zip(p1, p2))
        # LR table is indexed by optimizer step
        assert tr.current_lr(0) == tr.current_lr(1)


class TestFSDPTrainer:
    """TrainerConfig.fsdp shards the full TrainState (params + EMA + Adam
    moments) over the 'data' axis and trains equivalently to replicated."""

    def _run(self, fsdp: bool, steps: int = 2):
        cfg = TrainerConfig(lr=1e-3, batch_size=8, epochs=1, timesteps=10,
                            model_ema_steps=1, warmup_epochs=1, seed=3,
                            fsdp=fsdp, fsdp_min_size=2**10)
        model = UNet(TINY)
        diffusion = GaussianDiffusion.create(timesteps=10, image_size=8, in_channels=3)
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

    def test_state_is_sharded(self):
        tr, state, _ = self._run(fsdp=True)
        shardings = [l.sharding for l in jax.tree.leaves(state.params)]
        assert any("data" in str(s.spec) for s in shardings), shardings
        # optimizer moments shard too (the ZeRO part)
        opt_sh = [l.sharding for l in jax.tree.leaves(state.opt_state)
                  if hasattr(l, "sharding")]
        assert any("data" in str(s.spec) for s in opt_sh)

    def test_fsdp_matches_replicated_loss(self):
        _, s_rep, l_rep = self._run(fsdp=False)
        _, s_fsdp, l_fsdp = self._run(fsdp=True)
        np.testing.assert_allclose(l_rep, l_fsdp, rtol=2e-4, atol=2e-5)
        # final params agree leaf-wise too
        a = jax.tree.leaves(jax.device_get(s_rep.params))
        b = jax.tree.leaves(jax.device_get(s_fsdp.params))
        for x, y in zip(a, b):
            np.testing.assert_allclose(x, y, rtol=2e-3, atol=2e-5)

    def test_fsdp_checkpoint_roundtrip(self, tmp_path):
        from eo_diffusion_tpu.train.checkpoint import restore_checkpoint, save_checkpoint

        tr, state, _ = self._run(fsdp=True)
        path = save_checkpoint(str(tmp_path), jax.device_get(state), step=2)
        # fresh trainer, fresh sharded template, restore into it
        tr2, template, _ = self._run(fsdp=True, steps=1)
        restored = restore_checkpoint(path, template)
        assert int(restored.step) == int(state.step)
        for x, y in zip(jax.tree.leaves(jax.device_get(state.params)),
                        jax.tree.leaves(jax.device_get(restored.params))):
            np.testing.assert_array_equal(x, y)
        # restored state keeps training under the fsdp-jitted step
        restored, m = tr2.step(restored, {"image": np.zeros((8, 8, 8, 3), np.float32)})
        assert np.isfinite(float(m["loss"]))


class TestDropoutRNG:
    """Regression: dropout keys must derive from the per-step rng.

    Round-1 bug: the trainer baked ``rngs={'dropout': PRNGKey(0)}`` into the
    jitted step, freezing the dropout mask for the whole run (ADVICE.md)."""

    def test_per_step_dropout_key_and_effect(self):
        cfg = UNetConfig(
            image_size=8, in_channels=3, model_channels=32, out_channels=3,
            num_res_blocks=1, attention_resolutions=(), channel_mult=(1, 2),
            dropout=0.5,
        )
        model = UNet(cfg)
        diffusion = GaussianDiffusion.create(timesteps=10, image_size=8, in_channels=3)
        tx = optax.adamw(1e-3)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32)
        )
        seen = []

        def apply_fn(p, x, t, cond=None, y=None, train=False, dropout_rng=None):
            seen.append(np.asarray(dropout_rng))
            return model.apply(
                p, x, t, train=train,
                rngs=None if dropout_rng is None else {"dropout": dropout_rng},
            )

        step = make_train_step(diffusion, apply_fn, tx, ema_decay=0.9)
        state = TrainState.create(params, tx)
        batch = {"image": jnp.ones((2, 8, 8, 3)) * 0.3}
        state, m0 = step(state, batch, jax.random.PRNGKey(0))  # eager so `seen` fills
        state, m1 = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(m0["loss"])) and np.isfinite(float(m1["loss"]))
        # two consecutive steps see two distinct dropout keys
        assert not np.array_equal(seen[0], seen[-1])
        # and the dropout key materially changes the masked forward (use the
        # post-step params: at init the zero-init out conv zeroes everything)
        x = jnp.ones((2, 8, 8, 3)) * 0.3
        t = jnp.zeros((2,), jnp.int32)
        p = state.params
        o1 = model.apply(p, x, t, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
        o2 = model.apply(p, x, t, train=True, rngs={"dropout": jax.random.PRNGKey(2)})
        assert float(jnp.abs(o1 - o2).max()) > 0

    def test_dropout_preset_trains_via_trainer(self):
        cfg = TrainerConfig(lr=1e-3, batch_size=8, epochs=1, timesteps=10,
                            model_ema_steps=2, warmup_epochs=1)
        ucfg = UNetConfig(
            image_size=8, in_channels=3, model_channels=32, out_channels=3,
            num_res_blocks=1, attention_resolutions=(), channel_mult=(1, 2),
            dropout=0.1,
        )
        model = UNet(ucfg)
        diffusion = GaussianDiffusion.create(timesteps=10, image_size=8, in_channels=3)
        tr = Trainer(cfg, model, diffusion, steps_per_epoch=2)
        batch = {"image": np.ones((8, 8, 8, 3), np.float32) * 0.2}
        state = tr.init(jax.random.PRNGKey(0), batch)
        for _ in range(2):
            state, m = tr.step(state, batch)
            assert np.isfinite(float(m["loss"]))


class TestTrainerIntegration:
    def test_loss_decreases_tiny(self):
        cfg = TrainerConfig(lr=2e-3, batch_size=8, epochs=1, timesteps=10,
                            model_ema_steps=2, warmup_epochs=1)
        model = UNet(TINY)
        diffusion = GaussianDiffusion.create(timesteps=10, image_size=8, in_channels=3)
        tr = Trainer(cfg, model, diffusion, steps_per_epoch=30)
        rng = np.random.default_rng(0)
        mk = lambda: {"image": (rng.choice([-0.5, 0.5], (8, 1, 1, 1))
                                * np.ones((8, 8, 8, 3))).astype(np.float32)}
        state = tr.init(jax.random.PRNGKey(0), mk())
        losses = []
        for _ in range(30):
            state, m = tr.step(state, mk())
            losses.append(float(m["loss"]))
        assert np.mean(losses[-5:]) < np.mean(losses[:5])

    def test_sample_shape(self):
        cfg = TrainerConfig(batch_size=4, epochs=1, timesteps=10, n_samples=2)
        model = UNet(TINY)
        diffusion = GaussianDiffusion.create(timesteps=10, image_size=8, in_channels=3)
        tr = Trainer(cfg, model, diffusion, steps_per_epoch=1)
        state = tr.init(jax.random.PRNGKey(0), {"image": np.zeros((1, 8, 8, 3), np.float32)})
        x = tr.sample(state, jax.random.PRNGKey(1))
        assert x.shape == (2, 8, 8, 3)


class TestDistributed:
    def test_initialize_single_process_noop(self):
        from eo_diffusion_tpu.parallel.distributed import initialize, process_shard

        info = initialize()
        assert info["process_count"] == 1
        assert info["global_devices"] == 8
        assert process_shard() == (0, 1)

    def test_global_batch_from_local(self):
        from eo_diffusion_tpu.parallel.distributed import global_batch_from_local

        mesh = make_mesh()
        local = {"image": np.ones((16, 4, 4, 3), np.float32)}
        out = global_batch_from_local(local, mesh)
        assert out["image"].shape == (16, 4, 4, 3)  # single-process: global == local
        assert "data" in str(out["image"].sharding.spec)


class TestShardedSampling:
    def test_ddpm_sample_on_mesh(self):
        """Data-parallel sampling: batch sharded over the 8-device mesh."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = make_mesh()
        model = UNet(TINY)
        d = GaussianDiffusion.create(timesteps=10, image_size=8, in_channels=3)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32)
        )
        mf = lambda x, t, c, y: model.apply(params, x, t, cond=c, y=y)
        out_sh = NamedSharding(mesh, P("data"))
        f = jax.jit(lambda k: d.ddpm_sample(mf, k, 16).x, out_shardings=out_sh)
        x = f(jax.random.PRNGKey(0))
        assert x.shape == (16, 8, 8, 3)
        assert "data" in str(x.sharding.spec)


class TestEMAWarmup:
    def test_early_ema_tracks_params(self):
        """With warmup, the first EMA updates average aggressively (decay
        (1+n)/(10+n) << 0.999) so early EMA is close to current params."""
        model = UNet(TINY)
        diffusion = GaussianDiffusion.create(timesteps=10, image_size=8, in_channels=3)
        tx = optax.adamw(1e-2)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32))
        apply_fn = lambda p, x, t, cond=None, y=None, train=False, dropout_rng=None: model.apply(p, x, t)
        batch = {"image": jnp.ones((4, 8, 8, 3)) * 0.5}

        def run(warmup):
            state = TrainState.create(params, tx)
            step = jax.jit(make_train_step(diffusion, apply_fn, tx, ema_decay=0.999,
                                           ema_every=1, ema_warmup=warmup))
            for i in range(20):
                state, _ = step(state, batch, jax.random.PRNGKey(i))
            d = jax.tree.map(lambda e, p: float(jnp.abs(e - p).max()),
                             state.ema_params, state.params)
            return max(jax.tree.leaves(d))

        gap_warm = run(True)
        gap_cold = run(False)
        assert gap_warm < gap_cold * 0.5


class TestCheckpointManager:
    def test_retention_and_restore(self, tmp_path):
        from eo_diffusion_tpu.train.checkpoint import CheckpointManager

        state = {"w": jnp.arange(4.0), "step": jnp.int32(0)}
        mgr = CheckpointManager(str(tmp_path), max_to_keep=2, async_save=False)
        for s in (1, 2, 3, 4):
            mgr.save(s, {"w": jnp.arange(4.0) + s, "step": jnp.int32(s)})
        mgr.wait()
        restored = mgr.restore_latest(state)
        assert int(restored["step"]) == 4
        np.testing.assert_allclose(np.asarray(restored["w"]), np.arange(4.0) + 4)
        # retention: only 2 step dirs remain
        import os

        dirs = [d for d in os.listdir(tmp_path) if d.isdigit()]
        assert len(dirs) <= 2
        mgr.close()

    def test_restore_latest_empty(self, tmp_path):
        from eo_diffusion_tpu.train.checkpoint import CheckpointManager

        mgr = CheckpointManager(str(tmp_path / "empty"))
        assert mgr.restore_latest({"w": jnp.zeros(2)}) is None
        mgr.close()


class TestDeterminism:
    def test_same_seed_same_losses(self):
        """Full train-step determinism: same seeds -> identical loss stream
        (guards against nondeterministic ops sneaking into the step)."""

        def run():
            model = UNet(TINY)
            diffusion = GaussianDiffusion.create(timesteps=10, image_size=8, in_channels=3)
            tx = optax.adamw(1e-3)
            params = jax.jit(model.init)(
                jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32))
            state = TrainState.create(params, tx)
            apply_fn = lambda p, x, t, cond=None, y=None, train=False, dropout_rng=None: model.apply(p, x, t)
            step = jax.jit(make_train_step(diffusion, apply_fn, tx, ema_decay=0.9))
            losses = []
            for i in range(5):
                batch = {"image": jnp.full((4, 8, 8, 3), 0.1 * i)}
                state, m = step(state, batch, jax.random.PRNGKey(i))
                losses.append(float(m["loss"]))
            return losses

        np.testing.assert_array_equal(run(), run())


class TestTensorParallel:
    """tp_param_specs: Megatron-style column/row-parallel attention
    projections over the 'model' axis -- numerics preserved, kernels
    actually sharded."""

    def _setup(self):
        from eo_diffusion_tpu.parallel.mesh import make_mesh, tp_param_specs
        from eo_diffusion_tpu.models.unet import UNet, UNetConfig

        mesh = make_mesh(model=4)  # 2x4 over the virtual 8-device mesh
        cfg = UNetConfig(image_size=8, in_channels=3, model_channels=32,
                         out_channels=3, num_res_blocks=1,
                         attention_resolutions=(1, 2), channel_mult=(1, 2),
                         num_heads=4)
        model = UNet(cfg)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 3)),
            jnp.zeros((2,), jnp.int32))
        specs = tp_param_specs(params, mesh)
        return mesh, model, params, specs

    def test_attention_projections_shard(self):
        mesh, model, params, specs = self._setup()
        flat = jax.tree_util.tree_flatten_with_path(specs)[0]
        qkv = [s for p, s in flat if any(getattr(k, "key", "") == "qkv" for k in p)]
        proj = [s for p, s in flat if any(getattr(k, "key", "") == "proj_out" for k in p)]
        assert any("model" in str(s) for s in qkv), qkv
        assert any("model" in str(s) for s in proj), proj
        # everything non-attention stays replicated
        other = [s for p, s in flat
                 if not any(getattr(k, "key", "") in ("qkv", "proj_out") for k in p)]
        assert all("model" not in str(s) for s in other)

    def test_tp_forward_matches_replicated(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh, model, params, specs = self._setup()
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 3))
        t = jnp.zeros((4,), jnp.int32)
        ref = model.apply(params, x, t)

        shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                                 is_leaf=lambda s: isinstance(s, P))
        p_tp = jax.tree.map(jax.device_put, params, shardings)
        f = jax.jit(lambda p, x, t: model.apply(p, x, t),
                    in_shardings=(shardings, NamedSharding(mesh, P("data")), None))
        out = f(p_tp, jax.device_put(x, NamedSharding(mesh, P("data"))), t)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-5, rtol=1e-5)


class TestTPTrainer:
    """TrainerConfig.tp: Megatron TP through the real Trainer."""

    def _run(self, tp: bool, steps: int = 2):
        from eo_diffusion_tpu.models.unet import UNetConfig
        from eo_diffusion_tpu.parallel.mesh import make_mesh

        cfg = TrainerConfig(lr=1e-3, batch_size=8, epochs=1, timesteps=10,
                            model_ema_steps=1, warmup_epochs=1, seed=3, tp=tp)
        ucfg = UNetConfig(image_size=8, in_channels=3, model_channels=32,
                          out_channels=3, num_res_blocks=1,
                          attention_resolutions=(2,), channel_mult=(1, 2),
                          num_heads=4)
        model = UNet(ucfg)
        diffusion = GaussianDiffusion.create(timesteps=10, image_size=8, in_channels=3)
        mesh = make_mesh(model=4) if tp else None
        tr = Trainer(cfg, model, diffusion, steps_per_epoch=steps, mesh=mesh)
        rng = np.random.default_rng(7)
        batches = [{"image": rng.normal(size=(8, 8, 8, 3)).astype(np.float32) * 0.3}
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

    def test_tp_with_pallas_kernel_matches(self, monkeypatch):
        """With the kernel forced on (interpret mode), tp=True routes it
        through the head-sharded shard_map (ops.attention
        head_sharded_attention) and the loss still matches the replicated
        run -- the VERDICT r2 #4 / ADVICE r2 TP-under-Pallas path."""
        from eo_diffusion_tpu.models.unet import UNetConfig
        from eo_diffusion_tpu.ops import attention as A
        from eo_diffusion_tpu.parallel.mesh import make_mesh

        monkeypatch.setattr(A, "_INTERPRET", True)

        def run(tp):
            cfg = TrainerConfig(lr=1e-3, batch_size=8, epochs=1, timesteps=10,
                                model_ema_steps=1, warmup_epochs=1, seed=3, tp=tp)
            ucfg = UNetConfig(image_size=8, in_channels=3, model_channels=32,
                              out_channels=3, num_res_blocks=1,
                              attention_resolutions=(2,), channel_mult=(1, 2),
                              num_heads=4, attn_impl="pallas")
            model = UNet(ucfg)
            diffusion = GaussianDiffusion.create(timesteps=10, image_size=8,
                                                 in_channels=3)
            mesh = make_mesh(model=4) if tp else None
            tr = Trainer(cfg, model, diffusion, steps_per_epoch=1, mesh=mesh)
            rng = np.random.default_rng(7)
            batch = {"image": rng.normal(size=(8, 8, 8, 3)).astype(np.float32) * 0.3}
            state = tr.init(jax.random.PRNGKey(0), batch)
            _, m = tr.step(state, batch)
            return float(m["loss"])

        np.testing.assert_allclose(run(False), run(True), rtol=2e-4, atol=2e-5)

    def test_tp_covers_cross_attention(self):
        from eo_diffusion_tpu.parallel.mesh import make_mesh, tp_param_specs
        from eo_diffusion_tpu.models.unet import UNet, UNetConfig

        mesh = make_mesh(model=4)
        cfg = UNetConfig(image_size=8, in_channels=3, model_channels=32,
                         out_channels=3, num_res_blocks=1,
                         attention_resolutions=(2,), channel_mult=(1, 2),
                         num_heads=4, context_dim=8)
        model = UNet(cfg)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((2, 8, 8, 3)),
            jnp.zeros((2,), jnp.int32), context=jnp.zeros((2, 4, 8)))
        specs = tp_param_specs(params, mesh)
        flat = jax.tree_util.tree_flatten_with_path(specs)[0]
        xa = [s for p, s in flat
              if any(getattr(k, "key", "") in ("to_q", "to_kv") for k in p)]
        assert xa and any("model" in str(s) for s in xa), xa


class TestGradClip:
    def test_clip_bounds_update_and_trains(self):
        cfg = TrainerConfig(lr=2e-3, batch_size=8, epochs=1, timesteps=10,
                            model_ema_steps=1, warmup_epochs=1, grad_clip=0.5)
        model = UNet(TINY)
        diffusion = GaussianDiffusion.create(timesteps=10, image_size=8, in_channels=3)
        tr = Trainer(cfg, model, diffusion, steps_per_epoch=12)
        rng = np.random.default_rng(1)
        batch = {"image": (rng.normal(size=(8, 8, 8, 3)) * 0.3).astype(np.float32)}
        state = tr.init(jax.random.PRNGKey(0), batch)
        losses = []
        for _ in range(12):
            state, m = tr.step(state, batch)
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        # clipping must not stop learning on a fixed batch
        assert losses[-1] < losses[0] * 0.8, losses
