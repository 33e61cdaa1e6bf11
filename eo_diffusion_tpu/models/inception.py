"""InceptionV3 feature extractor for standard (published-comparable) FID/IS.

The reference computes FID/IS through torch-fidelity's InceptionV3
(``script_utils/evaluate_metrics.py:3-17``). This is a Flax re-implementation
of the torchvision ``inception_v3`` architecture (the standard FID backbone)
producing the 2048-d pool3 features plus the 1000-way logits, with a loader
for torchvision ``inception_v3_google-*.pth`` state dicts (no weights are
bundled in this environment -- mount them and pass ``--inception_weights`` /
set ``EO_INCEPTION_WEIGHTS``).

Layout notes:
* NHWC activations; conv kernels HWIO (the loader transposes torch OIHW).
* Module names mirror the torch state-dict keys (``Mixed_5b.branch1x1.conv``)
  so conversion is mechanical and auditable.
* BatchNorm is inference-only and stored as four plain params per conv
  (scale/bias/mean/var, eps=1e-3 like torchvision's BasicConv2d).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "InceptionV3",
    "load_torch_inception",
    "preprocess",
    "inception_feature_extractor",
    "IMAGENET_MEAN",
    "IMAGENET_STD",
]

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
_BN_EPS = 1e-3


def _pad(p) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    if isinstance(p, int):
        return ((p, p), (p, p))
    return ((p[0], p[0]), (p[1], p[1]))


class BasicConv2d(nn.Module):
    """Conv (no bias) + inference BatchNorm(eps=1e-3) + ReLU."""

    out_ch: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = 0

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(self.out_ch, self.kernel, strides=self.strides,
                    padding=_pad(self.padding), use_bias=False, name="conv")(x)
        scale = self.param("bn_scale", nn.initializers.ones, (self.out_ch,))
        bias = self.param("bn_bias", nn.initializers.zeros, (self.out_ch,))
        mean = self.param("bn_mean", nn.initializers.zeros, (self.out_ch,))
        var = self.param("bn_var", nn.initializers.ones, (self.out_ch,))
        x = (x - mean) * jax.lax.rsqrt(var + _BN_EPS) * scale + bias
        return nn.relu(x)


def _avg_pool_3x3(x: jax.Array) -> jax.Array:
    # stride-1 3x3 average with zero padding, dividing by 9 everywhere --
    # torch F.avg_pool2d's count_include_pad=True default
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))


def _max_pool_3x3_s2(x: jax.Array) -> jax.Array:
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(_avg_pool_3x3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _max_pool_3x3_s2(x)], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=(0, 3), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=(3, 0), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avg_pool_3x3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=(0, 3), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=(3, 0), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _max_pool_3x3_s2(x)], axis=-1)


class InceptionE(nn.Module):
    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=(0, 1), name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=(1, 0), name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avg_pool_3x3(x))
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Torchvision-layout InceptionV3 (aux head omitted -- inference only).

    ``__call__(x)`` with x: [N, H, W, 3] preprocessed (see :func:`preprocess`),
    H = W = 299 canonically (any size >= 75 works; the head pools globally).
    Returns ``{"pool3": [N, 2048], "logits": [N, 1000]}``.
    """

    num_classes: int = 1000

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = _max_pool_3x3_s2(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool_3x3_s2(x)
        x = InceptionA(pool_features=32, name="Mixed_5b")(x)
        x = InceptionA(pool_features=64, name="Mixed_5c")(x)
        x = InceptionA(pool_features=64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(channels_7x7=128, name="Mixed_6b")(x)
        x = InceptionC(channels_7x7=160, name="Mixed_6c")(x)
        x = InceptionC(channels_7x7=160, name="Mixed_6d")(x)
        x = InceptionC(channels_7x7=192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(name="Mixed_7c")(x)
        pool3 = jnp.mean(x, axis=(1, 2))  # adaptive avg pool to 1x1
        logits = nn.Dense(self.num_classes, name="fc")(pool3)
        return {"pool3": pool3, "logits": logits}


def preprocess(images01: jax.Array, size: int = 299) -> jax.Array:
    """[0,1] NHWC RGB -> 299x299, scaled exactly as torchvision's
    inception_v3 pipeline sees it.

    torchvision forces ``transform_input=True`` for the inception_v3_google
    weights: the model internally undoes the ImageNet mean/std
    normalization into ``(x - 0.5) / 0.5`` per channel
    (x_ch = x_norm * (std_c / 0.5) + (mean_c - 0.5) / 0.5, which
    algebraically reduces to (x - 0.5) / 0.5). Applying the net transform
    here keeps the Flax model free of the quirk while matching
    torch-fidelity's feature pipeline bit-for-bit in spirit -- an
    ImageNet-normalize-only preprocess would scale channel activations by
    std_c/0.5 relative to the reference and break published-FID parity.
    """
    x = jnp.asarray(images01, jnp.float32)
    if x.shape[-1] == 1:
        x = jnp.repeat(x, 3, axis=-1)
    if x.shape[1] != size or x.shape[2] != size:
        x = jax.image.resize(x, (x.shape[0], size, size, x.shape[-1]), "bilinear")
    return (x - 0.5) / 0.5


# ---------------------------------------------------------------------------
# torchvision state-dict conversion
# ---------------------------------------------------------------------------

_BN_MAP = {
    "weight": "bn_scale",
    "bias": "bn_bias",
    "running_mean": "bn_mean",
    "running_var": "bn_var",
}


def convert_torch_state_dict(sd: Dict[str, "np.ndarray"]) -> Dict[str, Any]:
    """torchvision inception_v3 state dict -> Flax param tree.

    Accepts numpy-valued dicts (torch tensors are converted). AuxLogits and
    bookkeeping buffers are skipped.
    """
    params: Dict[str, Any] = {}

    def put(path: Sequence[str], value):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(value)

    for key, val in sd.items():
        if key.startswith("AuxLogits") or key.endswith("num_batches_tracked"):
            continue
        v = np.asarray(val.detach().cpu().numpy() if hasattr(val, "detach") else val)
        parts = key.split(".")
        if parts[0] == "fc":
            if parts[1] == "weight":
                put(("fc", "kernel"), v.T)  # [1000,2048] -> [2048,1000]
            else:
                put(("fc", "bias"), v)
            continue
        *scope, layer, name = parts
        if layer == "conv" and name == "weight":
            put((*scope, "conv", "kernel"), v.transpose(2, 3, 1, 0))  # OIHW->HWIO
        elif layer == "bn" and name in _BN_MAP:
            put((*scope, _BN_MAP[name]), v)
        else:
            raise ValueError(f"unrecognized torchvision inception key: {key}")
    return {"params": params}


def load_torch_inception(path: str) -> Dict[str, Any]:
    """Load a torchvision ``inception_v3_google-*.pth`` into Flax params."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return convert_torch_state_dict(sd)


def inception_feature_extractor(params, batch_size: int = 64, with_logits: bool = False):
    """Build an extractor ``f(images01) -> pool3 feats`` (or (feats, probs))
    compatible with ``utils.metrics.FrechetDistance``."""
    model = InceptionV3()
    apply = jax.jit(lambda x: model.apply(params, preprocess(x)))

    def extract(images01):
        out = apply(jnp.asarray(images01, jnp.float32))
        if with_logits:
            return np.asarray(out["pool3"]), np.asarray(jax.nn.softmax(out["logits"], -1))
        return np.asarray(out["pool3"])

    return extract
