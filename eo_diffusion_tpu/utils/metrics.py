"""Evaluation metrics: SSIM, PSNR, FID machinery (jit-compiled jnp).

Replaces the reference's torchmetrics SSIM/PSNR calls (inference.py:7-8,
136-138) and the torch-fidelity FID/IS harness
(``script_utils/evaluate_metrics.py:3-17``):

* :func:`ssim` -- standard Wang et al. SSIM with an 11x11 Gaussian window
  (sigma 1.5), matching torchmetrics defaults, NHWC, batched and jittable.
* :func:`psnr` -- peak signal-to-noise ratio over the full batch.
* :class:`FrechetDistance` -- feature-statistics accumulator + the exact
  Frechet distance between Gaussians. The Inception-v3 feature extractor is
  pluggable (no pretrained weights are bundled in this environment); any
  callable batch[N,H,W,C] -> features[N,D] works, and
  :func:`tiny_feature_extractor` provides a deterministic random-projection
  fallback so the full FID pipeline is exercisable offline.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["ssim", "psnr", "FrechetDistance", "tiny_feature_extractor",
           "inception_score", "kid", "density_coverage", "precision_recall",
           "gradient_energy", "radial_power_profile", "spectral_distance"]


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x**2) / (2 * sigma**2))
    g = g / g.sum()
    return jnp.outer(g, g)


def _filter2d(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 'valid' convolution of NHWC with a 2D kernel."""
    k = kernel[:, :, None, None]  # HWIO with I=1, O=1
    c = img.shape[-1]
    k = jnp.tile(k, (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        img, k,
        window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
) -> jnp.ndarray:
    """Mean SSIM over a batch (NHWC), torchmetrics-compatible defaults."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    # clamp the window to the image (keeps tiny smoke-test images finite)
    kernel_size = min(kernel_size, pred.shape[1], pred.shape[2])
    if kernel_size % 2 == 0:
        kernel_size -= 1
    kern = _gaussian_kernel(kernel_size, sigma)

    mu_x = _filter2d(pred, kern)
    mu_y = _filter2d(target, kern)
    mu_xx, mu_yy, mu_xy = mu_x * mu_x, mu_y * mu_y, mu_x * mu_y
    sigma_x = _filter2d(pred * pred, kern) - mu_xx
    sigma_y = _filter2d(target * target, kern) - mu_yy
    sigma_xy = _filter2d(pred * target, kern) - mu_xy

    num = (2 * mu_xy + c1) * (2 * sigma_xy + c2)
    den = (mu_xx + mu_yy + c1) * (sigma_x + sigma_y + c2)
    return jnp.mean(num / den)


def psnr(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio over the whole batch (torchmetrics default
    reduction: one MSE over all elements)."""
    mse = jnp.mean((pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2)
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def tiny_feature_extractor(dim: int = 192, seed: int = 0) -> Callable:
    """Deterministic random-projection features (offline FID fallback).

    Projects 16x16-downsampled images through a fixed random matrix + ReLU.
    NOT comparable to Inception-FID numbers, but monotone in distribution
    mismatch and fully offline; swap in a real Inception extractor for
    published-comparable scores.
    """
    rng = np.random.default_rng(seed)
    w = None

    def extract(batch: jnp.ndarray) -> jnp.ndarray:
        nonlocal w
        x = jax.image.resize(batch, (batch.shape[0], 16, 16, batch.shape[-1]), "bilinear")
        flat = x.reshape(x.shape[0], -1)
        if w is None or w.shape[0] != flat.shape[1]:
            w = jnp.asarray(rng.normal(0, 1 / np.sqrt(flat.shape[1]), (flat.shape[1], dim)),
                            jnp.float32)
        return jax.nn.relu(flat @ w)

    return extract


class FrechetDistance:
    """Streaming Frechet distance between two feature distributions.

    Usage::

        fd = FrechetDistance(extractor)
        for batch in real_loader:   fd.update_real(batch["image"])
        for batch in samples:       fd.update_fake(batch)
        score = fd.compute()
    """

    def __init__(self, extractor: Optional[Callable] = None):
        self.extractor = extractor or tiny_feature_extractor()
        self._real: list = []
        self._fake: list = []

    def update_real(self, images):
        self._real.append(np.asarray(self.extractor(jnp.asarray(images))))

    def update_fake(self, images):
        self._fake.append(np.asarray(self.extractor(jnp.asarray(images))))

    # pre-extracted features (e.g. when one Inception pass yields both
    # pool3 feats for FID and logits for IS)
    def add_real_feats(self, feats):
        self._real.append(np.asarray(feats))

    def add_fake_feats(self, feats):
        self._fake.append(np.asarray(feats))

    @staticmethod
    def _stats(feats: np.ndarray):
        mu = feats.mean(0)
        cov = np.cov(feats, rowvar=False)
        return mu, np.atleast_2d(cov)

    @staticmethod
    def frechet(mu1, cov1, mu2, cov2) -> float:
        """d^2 = |mu1-mu2|^2 + Tr(C1 + C2 - 2 sqrt(C1 C2))."""
        import scipy.linalg

        diff = mu1 - mu2
        covmean, _ = scipy.linalg.sqrtm(cov1 @ cov2, disp=False)
        if np.iscomplexobj(covmean):
            covmean = covmean.real
        return float(diff @ diff + np.trace(cov1) + np.trace(cov2) - 2 * np.trace(covmean))

    def compute(self) -> float:
        real = np.concatenate(self._real)
        fake = np.concatenate(self._fake)
        return self.frechet(*self._stats(real), *self._stats(fake))


def kid(real_feats: np.ndarray, fake_feats: np.ndarray, subset_size: int = 100,
        num_subsets: int = 20, seed: int = 0) -> tuple:
    """Kernel Inception Distance (Binkowski et al. 2018): unbiased MMD^2 with
    the polynomial kernel k(x,y) = (x.y/d + 1)^3 over feature subsets.

    Unlike FID, KID is unbiased at small sample counts and meaningful under
    any feature extractor -- the recommended metric with this framework's
    offline extractor fallback. Returns (mean, std) over subsets.
    """
    rng = np.random.default_rng(seed)
    d = real_feats.shape[1]
    n = min(subset_size, len(real_feats), len(fake_feats))
    scores = []
    for _ in range(num_subsets):
        x = real_feats[rng.choice(len(real_feats), n, replace=False)].astype(np.float64)
        y = fake_feats[rng.choice(len(fake_feats), n, replace=False)].astype(np.float64)
        kxx = (x @ x.T / d + 1.0) ** 3
        kyy = (y @ y.T / d + 1.0) ** 3
        kxy = (x @ y.T / d + 1.0) ** 3
        np.fill_diagonal(kxx, 0.0)
        np.fill_diagonal(kyy, 0.0)
        mmd = kxx.sum() / (n * (n - 1)) + kyy.sum() / (n * (n - 1)) - 2.0 * kxy.mean()
        scores.append(mmd)
    return float(np.mean(scores)), float(np.std(scores))


def inception_score(probs: np.ndarray, splits: int = 10) -> tuple:
    """IS = exp(E_x KL(p(y|x) || p(y))) over class-probability rows.

    The classifier is pluggable like the FID extractor (reference uses
    torch-fidelity's InceptionV3, evaluate_metrics.py:7-15).
    """
    scores = []
    n = len(probs)
    for k in range(splits):
        part = probs[k * n // splits : (k + 1) * n // splits]
        if len(part) == 0:
            continue
        py = part.mean(0, keepdims=True)
        kl = (part * (np.log(part + 1e-12) - np.log(py + 1e-12))).sum(1)
        scores.append(np.exp(kl.mean()))
    return float(np.mean(scores)), float(np.std(scores))


def pairwise_l2(a: np.ndarray, b: np.ndarray,
                block: int = 512) -> np.ndarray:
    """[len(a), len(b)] float64 L2 distances, computed in row blocks so the
    peak temporary is [block, len(b), D] instead of the full broadcast
    (the PRDC metrics share one d_rr/d_fr pair through this — see
    cli/evaluate.compute_metrics — rather than each rebuilding the
    O(N*M*D) subtraction)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    assert a.ndim == b.ndim == 2 and a.shape[1] == b.shape[1], (a.shape, b.shape)
    out = np.empty((len(a), len(b)), np.float64)
    for i in range(0, len(a), block):
        out[i:i + block] = np.linalg.norm(
            a[i:i + block, None] - b[None], axis=-1)
    return out


def density_coverage(real_feats: np.ndarray, fake_feats: np.ndarray,
                     k: int = 5, d_rr: Optional[np.ndarray] = None,
                     d_fr: Optional[np.ndarray] = None) -> tuple:
    """Density & coverage (Naeem et al. 2020, arXiv:2002.09797;
    beyond-reference — the reference evaluates FID/IS only).

    FID/KID conflate fidelity and diversity into one number; density
    (how many real-manifold kNN balls each fake sample falls inside,
    fidelity-like, can exceed 1) and coverage (the fraction of real
    samples whose kNN ball contains at least one fake, diversity-like,
    in [0, 1]) separate them — a mode-collapsed generator reads high
    density / low coverage. O(N*M) pairwise distances in numpy: feature
    sets here are hundreds of rows, not worth a device program.
    """
    real = np.asarray(real_feats, np.float64)
    fake = np.asarray(fake_feats, np.float64)
    assert real.ndim == fake.ndim == 2 and real.shape[1] == fake.shape[1]
    assert 1 <= k < len(real), (k, len(real))
    if d_rr is None:
        d_rr = pairwise_l2(real, real)  # [N, N]
    if d_fr is None:
        d_fr = pairwise_l2(fake, real)  # [M, N]
    # k-th NN radius per real point (excluding self: column 0 is 0)
    radii = np.sort(d_rr, axis=1)[:, k]
    inside = d_fr <= radii[None]  # fake j inside real i's ball
    density = float(inside.sum() / (k * len(fake)))
    coverage = float(inside.any(axis=0).mean())
    return density, coverage


def precision_recall(real_feats: np.ndarray, fake_feats: np.ndarray,
                     k: int = 3, d_rr: Optional[np.ndarray] = None,
                     d_fr: Optional[np.ndarray] = None) -> tuple:
    """Improved precision & recall (Kynkäänniemi et al. 2019,
    arXiv:1904.06991; beyond-reference) — the binary-membership
    counterparts of :func:`density_coverage`, completing the PRDC
    quartet.

    The real manifold is approximated as the union of each real point's
    k-NN ball; precision is the fraction of fake samples inside it
    (fidelity, in [0, 1]). Recall swaps the roles: the fraction of real
    samples inside the fake manifold (diversity). Unlike density,
    precision saturates at 1 — use density when "how deep inside" matters;
    unlike coverage, recall uses the *fake* k-NN radii, so it stays
    meaningful when the fake set is much larger than the real set.
    """
    real = np.asarray(real_feats, np.float64)
    fake = np.asarray(fake_feats, np.float64)
    assert real.ndim == fake.ndim == 2 and real.shape[1] == fake.shape[1]
    assert 1 <= k < min(len(real), len(fake)), (k, len(real), len(fake))
    if d_rr is None:
        d_rr = pairwise_l2(real, real)
    if d_fr is None:
        d_fr = pairwise_l2(fake, real)  # [M, N]
    d_ff = pairwise_l2(fake, fake)
    radii_r = np.sort(d_rr, axis=1)[:, k]  # self-distance occupies col 0
    radii_f = np.sort(d_ff, axis=1)[:, k]
    precision = float((d_fr <= radii_r[None]).any(axis=1).mean())
    recall = float((d_fr.T <= radii_f[None]).any(axis=1).mean())
    return precision, recall


def gradient_energy(images: np.ndarray) -> float:
    """Mean squared finite-difference gradient magnitude per pixel.

    A cheap noise/sharpness statistic the feature-based metrics miss: the
    tiny random-conv extractor's KID is measurably BLIND to iid pixel
    noise (the cm64 capstone's 1-step teacher samples are pure noise at
    KID 0.008 — gallery/cm64_metrics.json), while gradient energy reads
    ~30x the data statistic there. Report it next to KID/FID whenever a
    sampler can fail toward noise (few-step regimes).
    """
    x = np.asarray(images, np.float64)
    assert x.ndim == 4, x.shape  # [N, H, W, C]
    gx = np.diff(x, axis=2)
    gy = np.diff(x, axis=1)
    return float((gx ** 2).mean() + (gy ** 2).mean())


def radial_power_profile(images: np.ndarray, n_bins: int = 32) -> np.ndarray:
    """Radially-averaged log power spectrum, [n_bins] (beyond-reference).

    The 2D FFT power of each image is binned by spatial-frequency radius
    and averaged over images/channels; profiles are log10 of the mean
    power per bin. EO sensor artifacts and sampler failure modes
    (residual iid noise -> flat high-frequency tail; over-smoothing ->
    collapsed tail) separate cleanly here even when feature metrics are
    insensitive.
    """
    x = np.asarray(images, np.float64)
    assert x.ndim == 4, x.shape
    n, h, w, c = x.shape
    spec = np.abs(np.fft.fft2(x, axes=(1, 2))) ** 2  # [N, H, W, C]
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.fftfreq(w)[None, :]
    r = np.sqrt(fy ** 2 + fx ** 2)  # [H, W] in cycles/pixel, max ~0.707
    bins = np.minimum((r / (0.5 * np.sqrt(2.0)) * n_bins).astype(int),
                      n_bins - 1)
    prof = np.zeros(n_bins)
    counts = np.zeros(n_bins)
    np.add.at(prof, bins.reshape(-1), spec.mean(axis=(0, 3)).reshape(-1))
    np.add.at(counts, bins.reshape(-1), 1.0)
    return np.log10(prof / np.maximum(counts, 1.0) + 1e-12)


def spectral_distance(real: np.ndarray, fake: np.ndarray,
                      n_bins: int = 32) -> float:
    """RMSE between the radially-averaged log power spectra of two image
    stacks — 0 for matched frequency content; iid-noise contamination
    shows up as a large high-frequency gap regardless of feature KID."""
    pr = radial_power_profile(real, n_bins)
    pf = radial_power_profile(fake, n_bins)
    return float(np.sqrt(np.mean((pr - pf) ** 2)))
