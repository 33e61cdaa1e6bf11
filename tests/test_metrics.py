"""Metric tests: SSIM/PSNR properties, FID machinery, image grid utils."""

import numpy as np
import pytest

from eo_diffusion_tpu.utils import metrics as M
from eo_diffusion_tpu.utils.images import make_grid, rescale_to_unit, save_image_grid


class TestSSIM:
    def test_identity_is_one(self):
        x = np.random.default_rng(0).uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
        assert float(M.ssim(x, x)) == pytest.approx(1.0, abs=1e-4)

    def test_noise_lowers_ssim(self):
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
        y = np.clip(x + rng.normal(0, 0.2, x.shape).astype(np.float32), 0, 1)
        s = float(M.ssim(x, y))
        assert 0.0 < s < 0.95

    def test_monotone_in_noise(self):
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 1, (1, 32, 32, 1)).astype(np.float32)
        vals = []
        for sd in (0.05, 0.1, 0.3):
            y = np.clip(x + rng.normal(0, sd, x.shape).astype(np.float32), 0, 1)
            vals.append(float(M.ssim(x, y)))
        assert vals[0] > vals[1] > vals[2]

    def test_small_images_finite(self):
        x = np.random.default_rng(0).uniform(0, 1, (1, 8, 8, 3)).astype(np.float32)
        assert np.isfinite(float(M.ssim(x, x * 0.9)))


class TestPSNR:
    def test_formula(self):
        x = np.zeros((1, 8, 8, 1), np.float32)
        y = np.full_like(x, 0.1)
        # mse = 0.01 -> psnr = -10*log10(0.01) = 20
        assert float(M.psnr(x, y)) == pytest.approx(20.0, abs=1e-3)

    def test_identical_large(self):
        x = np.random.default_rng(0).uniform(size=(1, 8, 8, 1)).astype(np.float32)
        assert float(M.psnr(x, x)) > 100


class TestFID:
    def test_zero_for_same_distribution(self):
        rng = np.random.default_rng(0)
        fd = M.FrechetDistance()
        imgs = rng.uniform(0, 1, (64, 32, 32, 3)).astype(np.float32)
        fd.update_real(imgs[:32])
        fd.update_fake(imgs[:32])
        assert fd.compute() == pytest.approx(0.0, abs=1e-3)

    def test_larger_for_shifted_distribution(self):
        rng = np.random.default_rng(0)
        fd_same, fd_diff = M.FrechetDistance(), M.FrechetDistance()
        a = rng.uniform(0, 1, (64, 32, 32, 3)).astype(np.float32)
        b = rng.uniform(0, 1, (64, 32, 32, 3)).astype(np.float32)
        shifted = np.clip(b * 0.3 + 0.7, 0, 1)
        fd_same.update_real(a)
        fd_same.update_fake(b)
        fd_diff.update_real(a)
        fd_diff.update_fake(shifted)
        assert fd_diff.compute() > fd_same.compute()

    def test_inception_score(self):
        # peaked per-sample distributions + uniform marginal -> high IS
        probs = np.eye(10, dtype=np.float64)[np.arange(100) % 10] * 0.99 + 0.001
        probs /= probs.sum(1, keepdims=True)
        mean, std = M.inception_score(probs, splits=5)
        assert mean > 5.0
        # uniform per-sample -> IS == 1
        uni = np.full((100, 10), 0.1)
        mean_u, _ = M.inception_score(uni, splits=5)
        assert mean_u == pytest.approx(1.0, abs=1e-6)


class TestImages:
    def test_grid_layout(self):
        imgs = np.stack([np.full((4, 4, 3), v, np.float32) for v in (0.1, 0.5, 0.9, 1.0)])
        grid = make_grid(imgs, nrow=2, pad=0)
        assert grid.shape == (8, 8, 3)
        np.testing.assert_allclose(grid[0, 0], 0.1)
        np.testing.assert_allclose(grid[7, 7], 1.0)

    def test_rescale_ranges(self):
        x = np.array([-1.0, 0.0, 1.0], np.float32).reshape(1, 1, 3)
        np.testing.assert_allclose(rescale_to_unit(x, (-1, 1)).ravel(), [0, 0.5, 1])
        y = np.array([0.0, 0.5, 1.5], np.float32).reshape(1, 1, 3)
        np.testing.assert_allclose(rescale_to_unit(y, (0, 1)).ravel(), [0, 0.5, 1])

    def test_save_roundtrip(self, tmp_path):
        from PIL import Image

        imgs = np.random.default_rng(0).uniform(0, 1, (4, 8, 8, 3)).astype(np.float32)
        path = str(tmp_path / "grid.png")
        save_image_grid(imgs, path, nrow=2)
        with Image.open(path) as im:
            assert im.size[0] > 16


class TestKID:
    def test_zero_for_identical(self):
        rng = np.random.default_rng(0)
        f = rng.normal(size=(200, 32))
        mean, std = M.kid(f, f, subset_size=50, num_subsets=5)
        # same-set subsets still differ slightly; near zero
        assert abs(mean) < 0.5

    def test_separates_distributions(self):
        rng = np.random.default_rng(0)
        a = rng.normal(0, 1, (200, 32))
        b = rng.normal(0, 1, (200, 32))
        c = rng.normal(2, 1, (200, 32))
        near, _ = M.kid(a, b, subset_size=50)
        far, _ = M.kid(a, c, subset_size=50)
        assert far > near
        assert far > 1.0


class TestDensityCoverage:
    """Naeem et al. 2020 density/coverage (beyond-reference metric)."""

    def test_matched_distributions_near_one(self):
        import numpy as np

        from eo_diffusion_tpu.utils.metrics import density_coverage

        rng = np.random.default_rng(0)
        a = rng.normal(size=(256, 16))
        b = rng.normal(size=(256, 16))
        d, c = density_coverage(a, b)
        assert 0.7 < d < 1.3 and c > 0.85, (d, c)

    def test_mode_collapse_reads_low_coverage(self):
        import numpy as np

        from eo_diffusion_tpu.utils.metrics import density_coverage

        rng = np.random.default_rng(0)
        a = rng.normal(size=(256, 16))
        collapsed = np.tile(a[:1], (256, 1)) + 0.01 * rng.normal(size=(256, 16))
        d, c = density_coverage(a, collapsed)
        assert c < 0.1, c  # diversity axis catches it
        far = rng.normal(size=(256, 16)) + 100.0
        d2, c2 = density_coverage(a, far)
        assert d2 == 0.0 and c2 == 0.0


class TestPrecisionRecall:
    """Kynkaanniemi et al. 2019 improved precision/recall — completes the
    PRDC quartet next to density/coverage (beyond-reference metric)."""

    def test_matched_distributions_near_one(self):
        import numpy as np

        from eo_diffusion_tpu.utils.metrics import precision_recall

        rng = np.random.default_rng(0)
        a = rng.normal(size=(256, 16))
        b = rng.normal(size=(256, 16))
        p, r = precision_recall(a, b)
        # k=3 kNN-manifold estimates bias low in 16-dim at N=256; matched
        # distributions still sit far above the collapse/offset regimes
        assert p > 0.7 and r > 0.7, (p, r)

    def test_mode_collapse_reads_high_precision_low_recall(self):
        import numpy as np

        from eo_diffusion_tpu.utils.metrics import precision_recall

        rng = np.random.default_rng(0)
        a = rng.normal(size=(256, 16))
        collapsed = a[:1] + 0.01 * rng.normal(size=(256, 16))
        p, r = precision_recall(a, collapsed)
        assert p > 0.9 and r < 0.1, (p, r)  # faithful but not diverse
        far = rng.normal(size=(256, 16)) + 100.0
        p2, r2 = precision_recall(a, far)
        assert p2 == 0.0 and r2 == 0.0

    def test_precomputed_distances_match_direct_path(self):
        """compute_metrics shares one d_rr/d_fr pair across the PRDC
        quartet (the [N,N]/[M,N] float64 matrices are its dominant cost);
        the precomputed path must be bit-identical to the direct one, and
        blocked pairwise_l2 must match the one-shot broadcast."""
        import numpy as np

        from eo_diffusion_tpu.utils.metrics import (density_coverage,
                                                    pairwise_l2,
                                                    precision_recall)

        rng = np.random.default_rng(3)
        a = rng.normal(size=(100, 16))
        b = rng.normal(size=(130, 16))
        np.testing.assert_allclose(
            pairwise_l2(a, b, block=32),
            np.linalg.norm(a[:, None] - b[None], axis=-1), rtol=1e-12)
        d_rr, d_fr = pairwise_l2(a, a), pairwise_l2(b, a)
        assert precision_recall(a, b, d_rr=d_rr, d_fr=d_fr) == \
            precision_recall(a, b)
        assert density_coverage(a, b, d_rr=d_rr, d_fr=d_fr) == \
            density_coverage(a, b)

    def test_evaluate_cli_reports_prdc(self, tmp_path):
        import numpy as np

        from eo_diffusion_tpu.cli.evaluate import compute_metrics
        from eo_diffusion_tpu.utils.metrics import tiny_feature_extractor

        rng = np.random.default_rng(3)
        real = rng.uniform(size=(24, 16, 16, 3)).astype(np.float32)
        fake = rng.uniform(size=(24, 16, 16, 3)).astype(np.float32)
        out = compute_metrics(real, fake, tiny_feature_extractor())
        for key in ("precision", "recall", "density", "coverage"):
            assert 0.0 <= out[key], (key, out[key])
        assert out["precision"] <= 1.0 and out["recall"] <= 1.0


class TestPixelSpaceGuards:
    """gradient_energy / spectral_distance: the pixel-space statistics that
    catch what the tiny-extractor KID is blind to (iid noise — measured on
    the cm64 capstone: noise samples at KID 0.008)."""

    def _smooth(self, n=16, size=16, seed=0):
        rng = np.random.default_rng(seed)
        coarse = rng.normal(size=(n, 4, 4, 3))
        blocks = np.repeat(np.repeat(coarse, size // 4, 1), size // 4, 2)
        # 3x3 box blur so the fixture is actually smooth (repeat alone
        # leaves hard block edges whose gradient energy rivals noise)
        pad = np.pad(blocks, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        return sum(pad[:, i:i + size, j:j + size] for i in range(3)
                   for j in range(3)) / 9.0

    def test_gradient_energy_orders_noise_over_smooth(self):
        from eo_diffusion_tpu.utils.metrics import gradient_energy

        smooth = self._smooth()
        noise = np.random.default_rng(1).normal(size=smooth.shape)
        assert gradient_energy(noise) > 10 * gradient_energy(smooth)

    def test_spectral_distance_zero_for_identical(self):
        from eo_diffusion_tpu.utils.metrics import spectral_distance

        x = self._smooth(seed=2)
        assert spectral_distance(x, x) == 0.0

    def test_spectral_distance_flags_noise_contamination(self):
        from eo_diffusion_tpu.utils.metrics import spectral_distance

        real = self._smooth(seed=3)
        same_dist = self._smooth(seed=4)
        noisy = real + 0.5 * np.random.default_rng(5).normal(size=real.shape)
        d_same = spectral_distance(real, same_dist)
        d_noise = spectral_distance(real, noisy)
        assert d_noise > 3 * d_same, (d_noise, d_same)

    def test_radial_profile_shape_and_monotone_tail(self):
        from eo_diffusion_tpu.utils.metrics import radial_power_profile

        prof = radial_power_profile(self._smooth(), n_bins=16)
        assert prof.shape == (16,)
        # smooth images: low-frequency bins carry far more power
        assert prof[1] > prof[-1] + 1.0

    def test_evaluate_cli_reports_guards(self, tmp_path):
        from eo_diffusion_tpu.cli.evaluate import compute_metrics
        from eo_diffusion_tpu.utils.metrics import tiny_feature_extractor

        real = self._smooth(seed=6).astype(np.float32)
        fake = self._smooth(seed=7).astype(np.float32)
        out = compute_metrics(real, fake, tiny_feature_extractor())
        assert "spectral_distance" in out and "grad_energy_fake" in out
        assert np.isfinite(out["spectral_distance"])
