"""TrainerConfig.skip_nonfinite: non-finite updates are dropped on device.

The reference has no such guard — one NaN loss poisons the params and every
later checkpoint silently (train.py's loop never checks). Here the guard is
an outermost optax.apply_if_finite wrap: bad steps leave params/opt-state
untouched and surface a cumulative ``notfinite_count`` metric.
"""

import jax
import jax.numpy as jnp
import numpy as np

from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
from eo_diffusion_tpu.models.unet import UNet, UNetConfig
from eo_diffusion_tpu.train.trainer import Trainer, TrainerConfig

SIZE, BS = 8, 8


def _setup(skip):
    cfg = TrainerConfig(lr=1e-3, batch_size=BS, epochs=1, timesteps=50,
                        skip_nonfinite=skip, warmup_epochs=0)
    ucfg = UNetConfig(image_size=SIZE, in_channels=3, model_channels=16,
                      out_channels=3, num_res_blocks=1, channel_mult=(1, 2))
    diff = GaussianDiffusion.create(timesteps=50, image_size=SIZE,
                                    in_channels=3)
    tr = Trainer(cfg, UNet(ucfg), diff, steps_per_epoch=10)
    batch = {"image": np.full((BS, SIZE, SIZE, 3), 0.3, np.float32)}
    state = tr.init(jax.random.PRNGKey(0), batch)
    return tr, state, batch


def _leaf0(params):
    return np.asarray(jax.tree.leaves(params)[0])


class TestSkipNonfinite:
    def test_bad_step_leaves_params_untouched_then_recovers(self):
        tr, state, batch = _setup(skip=True)
        state, m = tr.step(state, batch)
        assert int(m["notfinite_count"]) == 0
        p_before = _leaf0(state.params)
        bad = {"image": np.full((BS, SIZE, SIZE, 3), np.nan, np.float32)}
        state, m = tr.step(state, bad)
        assert int(m["notfinite_count"]) == 1, m
        assert not np.isfinite(float(m["loss"]))  # reported honestly
        np.testing.assert_array_equal(_leaf0(state.params), p_before)
        assert bool(np.all(np.isfinite(_leaf0(state.params))))
        # a clean step afterwards applies normally and resets the streak
        state, m = tr.step(state, batch)
        assert int(m["notfinite_count"]) == 0  # consecutive counter reset
        assert np.any(_leaf0(state.params) != p_before)
        assert bool(np.all(np.isfinite(_leaf0(state.params))))

    def test_default_off_matches_reference_behavior(self):
        """Without the flag a NaN batch poisons the params — the documented
        reference behavior (and why the flag exists)."""
        tr, state, batch = _setup(skip=False)
        state, m = tr.step(state, batch)
        assert "notfinite_count" not in m
        bad = {"image": np.full((BS, SIZE, SIZE, 3), np.nan, np.float32)}
        state, _ = tr.step(state, bad)
        assert not bool(np.all(np.isfinite(_leaf0(state.params))))

    def test_checkpoint_roundtrip_with_guard_state(self, tmp_path):
        """The wrapped opt state (ApplyIfFiniteState) survives the Orbax
        save/restore used by --resume."""
        from eo_diffusion_tpu.train.checkpoint import (restore_checkpoint,
                                                       save_checkpoint)

        tr, state, batch = _setup(skip=True)
        state, _ = tr.step(state, batch)
        bad = {"image": np.full((BS, SIZE, SIZE, 3), np.nan, np.float32)}
        state, m = tr.step(state, bad)
        assert int(m["notfinite_count"]) == 1
        save_checkpoint(str(tmp_path), jax.device_get(state), name="s")
        tr2, template, _ = _setup(skip=True)
        restored = restore_checkpoint(str(tmp_path / "s"), template)
        np.testing.assert_array_equal(_leaf0(restored.params),
                                      _leaf0(state.params))
        state2, m2 = tr2.step(restored, batch)
        assert int(m2["notfinite_count"]) == 0
        assert np.any(_leaf0(state2.params) != _leaf0(state.params))
