"""Discriminative feature extractor for offline KID/FID (VERDICT r4 item 1).

The round-3 offline metric fallback (``utils.metrics.tiny_feature_extractor``)
projects 16x16-downsampled pixels through a fixed random matrix: it is
monotone in low-frequency distribution mismatch but provably blind to
high-frequency noise — visually-garbage DDIM-1 teacher output scored KID
0.008 *better* than a clean student's 0.18 (PERF.md cm64 entry). That
blindness voided a whole class of guidance/EMA capstone measurements.

This module replaces it with a small *trained* convnet: supervised class
prediction on the (hard) synthetic fixture at full resolution, penultimate
global-average-pool features for KID/FID. The first conv runs at native
resolution, so noise/blur/checkerboard artifacts move the features; training
on the fixture's class structure makes the features semantically
discriminative rather than random. Degradation-monotonicity is validated
both in the unit tests (tests/test_feature_cnn.py) and by the training tool
(tools/train_eval_extractor.py) before any capstone uses the weights.

The reference's metric surface is torch-fidelity's InceptionV3
(script_utils/evaluate_metrics.py:3-17) — mirrored by models/inception.py
when real weights are mounted; this extractor is the *offline* stand-in for
machines (like this one) where they are not.

TPU notes: plain Flax conv stack, NHWC, bf16-safe; both the train step and
the feature pass are single jits. At 64px the whole model is ~320k params —
training to convergence on the synthetic fixture takes seconds per thousand
steps on one chip and low minutes on the host CPU.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["FeatureCNN", "FeatureCNNConfig", "train_feature_extractor",
           "save_params", "load_params", "make_extractor"]


@dataclasses.dataclass(frozen=True)
class FeatureCNNConfig:
    in_channels: int = 3
    widths: Tuple[int, ...] = (32, 64, 128, 192)
    num_classes: int = 5
    feature_dim: int = 192  # penultimate width == widths[-1] after pool
    norm_groups: int = 8


class FeatureCNN(nn.Module):
    """4-stage convnet: [conv3x3, GN, SiLU, stride-2 conv] per stage,
    global-average-pool penultimate features, linear class head."""

    cfg: FeatureCNNConfig

    @nn.compact
    def __call__(self, x, *, features_only: bool = False):
        c = self.cfg
        h = x
        for i, w in enumerate(c.widths):
            h = nn.Conv(w, (3, 3), padding="SAME", name=f"conv{i}a")(h)
            h = nn.GroupNorm(num_groups=min(c.norm_groups, w),
                             name=f"gn{i}")(h)
            h = nn.silu(h)
            h = nn.Conv(w, (3, 3), strides=(2, 2), padding="SAME",
                        name=f"conv{i}b")(h)
            h = nn.silu(h)
        feats = jnp.mean(h, axis=(1, 2))  # [N, widths[-1]]
        if features_only:
            # unit-RMS per sample: KID's cubic kernel (x.y/d + 1)^3 needs
            # dot products O(d); raw GN+SiLU pooled activations have
            # arbitrary scale and send the unbiased MMD estimator into
            # large negative territory. Direction carries the
            # discriminative signal (the class head is linear on feats).
            rms = jnp.sqrt(jnp.mean(feats ** 2, axis=-1, keepdims=True))
            return feats / jnp.maximum(rms, 1e-8)
        logits = nn.Dense(c.num_classes, name="head")(feats)
        return logits, feats


def train_feature_extractor(
    images: np.ndarray,
    labels: np.ndarray,
    cfg: Optional[FeatureCNNConfig] = None,
    steps: int = 2000,
    batch_size: int = 64,
    lr: float = 2e-3,
    seed: int = 0,
    log_every: int = 0,
):
    """Train the extractor with cross-entropy + flip augmentation.

    ``images``: [N, H, W, C] float32 in any fixed range; ``labels``: [N]
    int. Returns ``(params, final_accuracy)`` where accuracy is measured on
    a held-out 10% split.
    """
    import optax

    cfg = cfg or FeatureCNNConfig(in_channels=images.shape[-1],
                                  num_classes=int(labels.max()) + 1)
    model = FeatureCNN(cfg)
    n = len(images)
    n_val = max(n // 10, 1)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    val_idx, train_idx = perm[:n_val], perm[n_val:]

    tx = optax.adamw(optax.cosine_decay_schedule(lr, max(steps, 1)))
    params = jax.jit(model.init)(jax.random.PRNGKey(seed),
                                 jnp.zeros((1,) + images.shape[1:]))
    opt_state = jax.jit(tx.init)(params)
    # device-resident data with index-only feeds: per-step host-array feeds
    # leak host RSS through the axon tunnel (CLAUDE.md); the whole fixture
    # is a few hundred MB at most, so it lives in HBM and rides the jit as
    # explicit arguments (closed-over trees hit the remote-compile payload
    # limit — HTTP-413 failure mode)
    imgs_d = jnp.asarray(images)
    labels_d = jnp.asarray(labels)

    @jax.jit
    def step(params, opt_state, data, labels_all, idx, key):
        x, y = data[idx], labels_all[idx]
        # random horizontal/vertical flips (EO imagery has no canonical
        # orientation; reference augs data_utils/data.py:31-43)
        kh, kv = jax.random.split(key)
        x = jnp.where(jax.random.bernoulli(kh), x[:, :, ::-1], x)
        x = jnp.where(jax.random.bernoulli(kv), x[:, ::-1], x)

        def loss_fn(p):
            logits, _ = model.apply(p, x)
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = jnp.mean(jnp.argmax(logits, -1) == y)
        return params, opt_state, loss, acc

    @jax.jit
    def eval_acc(params, data, labels_all, idx):
        logits, _ = model.apply(params, data[idx])
        return jnp.mean(jnp.argmax(logits, -1) == labels_all[idx])

    key = jax.random.PRNGKey(seed + 1)
    for i in range(steps):
        idx = jnp.asarray(rng.choice(train_idx, batch_size))
        key, skey = jax.random.split(key)
        params, opt_state, loss, acc = step(
            params, opt_state, imgs_d, labels_d, idx, skey)
        if log_every and i % log_every == 0:
            print(f"extractor step {i}/{steps} loss={float(loss):.4f} "
                  f"acc={float(acc):.3f}", flush=True)
    val_acc = float(eval_acc(params, imgs_d, labels_d, jnp.asarray(val_idx)))
    return params, val_acc


def _flatten(params, prefix=""):
    out = {}
    for k, v in params.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def save_params(params, path: str, meta: Optional[dict] = None) -> str:
    """Persist extractor params as a flat .npz (jax+numpy-only reload)."""
    flat = _flatten(jax.tree.map(np.asarray, params))
    if meta:
        for k, v in meta.items():
            flat[f"__meta__/{k}"] = np.asarray(v)
    np.savez(path, **flat)
    return path


def load_params(path: str):
    """Inverse of save_params. Returns (params, meta)."""
    flat = np.load(path)
    params, meta = {}, {}
    for key in flat.files:
        if key.startswith("__meta__/"):
            meta[key.split("/", 1)[1]] = flat[key]
            continue
        node = params
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(flat[key])
    return params, meta


def make_extractor(params, cfg: Optional[FeatureCNNConfig] = None,
                   batch: int = 256) -> Callable:
    """Wrap trained params as a feature callable for FrechetDistance/kid.

    The returned fn takes an [N, H, W, C] array (any N) and returns
    [N, feature_dim] penultimate features, running in jitted ``batch``-sized
    chunks (the last chunk is padded to keep one compiled shape).
    """
    if cfg is None:
        head = params["params"]["head"]["kernel"]
        # reconstruct widths from the conv stack actually present
        widths = []
        i = 0
        while f"conv{i}a" in params["params"]:
            widths.append(params["params"][f"conv{i}a"]["kernel"].shape[-1])
            i += 1
        cfg = FeatureCNNConfig(
            in_channels=params["params"]["conv0a"]["kernel"].shape[-2],
            widths=tuple(widths), num_classes=head.shape[-1],
            feature_dim=widths[-1])
    model = FeatureCNN(cfg)
    fwd = jax.jit(lambda p, x: model.apply(p, x, features_only=True))

    def extract(x):
        x = jnp.asarray(x, jnp.float32)
        n = x.shape[0]
        outs = []
        for s in range(0, n, batch):
            chunk = x[s:s + batch]
            pad = batch - chunk.shape[0]
            if pad and n > batch:  # keep one compiled shape across chunks
                chunk = jnp.concatenate(
                    [chunk, jnp.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
                outs.append(np.asarray(fwd(params, chunk))[:batch - pad])
            else:
                outs.append(np.asarray(fwd(params, chunk)))
        return np.concatenate(outs, 0)

    return extract


def make_two_stream_extractor(tile_params, tile_cfg: FeatureCNNConfig,
                              tile: int, global_params,
                              global_cfg: FeatureCNNConfig, down: int,
                              batch: int = 256) -> Callable:
    """Texture + composition features for high-resolution KID (VERDICT r4
    weak #4: tile-averaged 64px features are blind to any global-
    composition failure larger than a tile — tile-shuffled images score
    like the originals).

    Stream A (texture): the tile extractor evaluated on the non-overlapping
    ``tile``-sized grid, mean-pooled over tiles — per-tile blur/noise
    sensitivity, same as the r4 harness. Stream B (composition): a second
    FeatureCNN trained on ``down``x average-pool-downsampled full images —
    it sees the whole layout at once, so scrambling tiles moves it. Each
    stream is L2-normalized per sample before concatenation so neither
    scale dominates the KID kernel; validation (tools/capstone_evalharden.py)
    requires the combined ladder to rank plain best against blur/noise AND
    tile-shuffle/tile-swap degradations before any capstone uses it.
    """
    tile_extract = make_extractor(tile_params, tile_cfg, batch=batch)
    global_extract = make_extractor(global_params, global_cfg, batch=batch)

    def _l2(f):
        return f / np.maximum(np.linalg.norm(f, axis=-1, keepdims=True),
                              1e-8)

    def extract(x):
        x = np.asarray(x, np.float32)
        n, h, w, c = x.shape
        gh, gw = h // tile, w // tile
        tiles = (x.reshape(n, gh, tile, gw, tile, c)
                 .transpose(0, 1, 3, 2, 4, 5)
                 .reshape(n * gh * gw, tile, tile, c))
        tex = tile_extract(tiles).reshape(n, gh * gw, -1).mean(axis=1)
        xd = x.reshape(n, h // down, down, w // down, down, c).mean((2, 4))
        comp = global_extract(xd)
        return np.concatenate([_l2(tex), _l2(comp)], axis=-1)

    return extract
