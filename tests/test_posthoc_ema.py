"""Post-hoc EMA (train/posthoc_ema.py, arXiv:2312.02696).

Pins the closed-form profile math (sigma_rel <-> gamma, inner products),
the reconstruction property the whole scheme rests on (synthesis from two
power-EMA tracks' snapshots matches a directly-maintained EMA of the
target length), snapshot IO, and the train->synthesize->infer CLI loop.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eo_diffusion_tpu.train.posthoc_ema import (
    DEFAULT_GAMMAS, PowerEMA, gamma_to_sigma_rel, load_snapshots,
    sigma_rel_to_gamma, solve_weights, synthesize, synthesize_from_dir)


class TestProfileMath:
    def test_default_gammas_are_the_paper_pair(self):
        srs = sorted(gamma_to_sigma_rel(g) for g in DEFAULT_GAMMAS)
        np.testing.assert_allclose(srs, [0.05, 0.10], atol=2e-4)

    def test_gamma_sigma_roundtrip(self):
        for g in (1.0, 6.94, 16.97, 50.0):
            assert abs(sigma_rel_to_gamma(gamma_to_sigma_rel(g)) - g) < 1e-6

    def test_sigma_rel_bounds_guarded(self):
        with pytest.raises(AssertionError):
            sigma_rel_to_gamma(0.5)  # above the profile max (~0.2886)

    def test_self_reconstruction_weight_is_one(self):
        # one snapshot whose profile IS the target -> weight [1]
        w = solve_weights([(1000.0, 7.0)], 7.0, 1000.0)
        np.testing.assert_allclose(w, [1.0], atol=1e-6)

    def test_large_t_no_overflow(self):
        # the naive t^{ga+gb+1} form overflows f64 around t ~ 1e5, g ~ 17
        w = solve_weights([(1e6, 16.97), (1e6, 6.94)],
                          sigma_rel_to_gamma(0.07), 1e6)
        assert np.isfinite(w).all() and abs(w.sum() - 1.0) < 0.1


class TestReconstruction:
    def test_matches_direct_target_ema(self):
        """The load-bearing property: least-squares synthesis from the two
        tracked profiles' periodic snapshots reproduces a directly
        maintained power EMA of an *untracked* target length (measured
        rel-err ~1.5e-4 on this fixture; asserted at 1e-2)."""
        T = 2000
        rng = np.random.default_rng(0)
        theta = np.cumsum(rng.normal(size=T)).astype(np.float64)
        g_target = sigma_rel_to_gamma(0.07)

        direct = theta[0]
        tracks = [theta[0], theta[0]]
        snaps, meta = [], []
        for t in range(T):
            bt = (1 - 1 / (t + 1)) ** (g_target + 1)
            direct = bt * direct + (1 - bt) * theta[t]
            for i, g in enumerate(DEFAULT_GAMMAS):
                b = (1 - 1 / (t + 1)) ** (g + 1)
                tracks[i] = b * tracks[i] + (1 - b) * theta[t]
            if (t + 1) % 200 == 0:
                for i, g in enumerate(DEFAULT_GAMMAS):
                    snaps.append(tracks[i])
                    meta.append((float(t + 1), g))

        w = solve_weights(meta, g_target, float(T))
        rec = float(np.dot(w, snaps))
        assert abs(rec - direct) / abs(direct) < 1e-2
        assert abs(w.sum() - 1.0) < 1e-2  # affine reconstruction

    def test_update_matches_scalar_recurrence(self):
        pe = PowerEMA((7.0,))
        params = {"w": jnp.asarray([2.0])}
        tracks = pe.init(params)
        ref = 0.0  # will follow the same recurrence in numpy
        tr0 = float(tracks[0]["w"][0])
        ref = tr0
        for step in range(5):
            params = {"w": jnp.asarray([float(step)])}
            tracks = pe.update(tracks, params, jnp.asarray(step))
            b = (1 - 1 / (step + 1)) ** 8.0
            ref = b * ref + (1 - b) * float(step)
        np.testing.assert_allclose(float(tracks[0]["w"][0]), ref, rtol=1e-6)


class TestSnapshotIO:
    def test_roundtrip_and_restore_latest(self, tmp_path):
        pe = PowerEMA((7.0, 17.0))
        params = {"a": jnp.arange(6.0).reshape(2, 3),
                  "b": {"c": jnp.ones((4,))}}
        tracks = pe.init(params)
        tracks = pe.update(tracks, params, jnp.asarray(0))
        pe.save_snapshots(str(tmp_path), tracks, 0)
        t2 = pe.update(tracks, params, jnp.asarray(1))
        pe.save_snapshots(str(tmp_path), t2, 1)

        trees, meta = load_snapshots(str(tmp_path), params)
        assert len(trees) == 4 and sorted(set(g for _, g in meta)) == [7.0, 17.0]

        restored, step = pe.restore_latest(str(tmp_path), params)
        assert step == 1
        for r, t in zip(restored, t2):
            for lr, lt in zip(jax.tree.leaves(r), jax.tree.leaves(t)):
                np.testing.assert_allclose(np.asarray(lr), np.asarray(lt))

    def test_restore_without_snapshots_inits(self, tmp_path):
        pe = PowerEMA()
        params = {"w": jnp.ones((3,))}
        tracks, step = pe.restore_latest(str(tmp_path / "none"), params)
        assert step == -1 and len(tracks) == 2


class TestPosthocCLI:
    def test_train_snapshot_synthesize_infer(self, tmp_path):
        """cli.train --posthoc_ema writes phema snapshots; cli.inference
        --phema_sigma_rel synthesizes and samples from them."""
        from eo_diffusion_tpu.cli import inference as infer_cli
        from eo_diffusion_tpu.cli import train as train_cli

        samples = str(tmp_path / "results")
        cwd = os.getcwd()
        os.chdir(str(tmp_path))
        try:
            train_cli.main(train_cli.parse_args([
                "--preset", "tiny", "--epochs", "1", "--steps_per_epoch", "4",
                "--batch_size", "8", "--lr", "2e-3", "--dir", samples,
                "--sample_every", "0", "--save_every", "4", "--log_freq", "1",
                "--n_samples", "4", "--posthoc_ema",
            ]))
        finally:
            os.chdir(cwd)
        ckpt_root = os.path.join(str(tmp_path), "logs",
                                 os.path.basename(samples))
        snaps = os.listdir(os.path.join(ckpt_root, "phema"))
        assert len([s for s in snaps if s.endswith(".npz")]) >= 2

        step_dirs = sorted(d for d in os.listdir(ckpt_root)
                           if d.startswith("steps_"))
        outdir = str(tmp_path / "infer")
        infer_cli.main(infer_cli.parse_args([
            "--preset", "tiny", "--ckpt", os.path.join(ckpt_root, step_dirs[-1]),
            "--sampler", "ddim", "--sampler_steps", "4", "--samples_fid",
            "--n_iter", "0", "--batch_size", "4", "--outdir", outdir,
            "--phema_sigma_rel", "0.08",
        ]))
        assert os.listdir(os.path.join(outdir, "samples_fid"))
