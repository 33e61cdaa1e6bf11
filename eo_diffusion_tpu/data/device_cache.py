"""Device-resident dataset cache: batches gathered on-chip, zero host I/O.

For patch datasets that fit HBM (a few GB -- most EO patch sets after
windowing), the fastest input pipeline is no pipeline: upload the tensors
once, then every training step gathers a random batch with a jitted
``jnp.take`` driven by the step's PRNGKey. Measured on the axon tunnel the
per-step host->device batch transfer dominates 256px training (768 vs
247 ms/step at batch 8); device-resident data removes it entirely.

No reference counterpart (the reference feeds a torch DataLoader every
step); this is the TPU-era equivalent of its eager ``make_patches`` RAM
cache (data_load.py:159-207) -- same idea, but in HBM with on-device
augmentation.

Usage (thread the tensors through jit as ARGUMENTS -- closing over them
bakes the whole dataset into the compile payload)::

    cache = DeviceDataCache({"image": imgs, "cond": conds})  # numpy in

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step_with_data(state, tensors, rng):
        d_rng, s_rng = jax.random.split(rng)
        batch = gather_batch(tensors, d_rng, BATCH)
        return step_fn(state, batch, s_rng)

    state, metrics = train_step_with_data(state, cache.tensors, rng)
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["DeviceDataCache", "gather_batch"]


def gather_batch(
    tensors: Dict[str, jax.Array],
    rng: jax.Array,
    batch_size: int,
    compute_dtype=jnp.float32,
    augment_flips: bool = True,
) -> Dict[str, jax.Array]:
    """Pure on-device batch gather: random indices + cast + joint h/v flips.

    Flips are drawn PER SAMPLE (like the loader's per-item torchvision-style
    augmentation, data.py) but shared across tensors, so paired tensors
    (image, cond view, mask) stay aligned while the batch isn't locked to
    one global orientation.
    """
    n = len(next(iter(tensors.values())))
    idx_rng, fh, fv = jax.random.split(rng, 3)
    idx = jax.random.randint(idx_rng, (batch_size,), 0, n)
    do_h = jax.random.bernoulli(fh, shape=(batch_size,))
    do_v = jax.random.bernoulli(fv, shape=(batch_size,))
    out = {}
    for k, v in tensors.items():
        b = jnp.take(v, idx, axis=0)
        if jnp.issubdtype(b.dtype, jnp.floating):
            b = b.astype(compute_dtype)
        if augment_flips and b.ndim >= 3:  # [B, H, W] or [B, H, W, ...]
            # ndim==3 covers channel-less per-pixel pairs (mask/segmentation
            # stored [N,H,W]) -- keying on >=4 would silently leave them
            # unflipped while the image flips, misaligning the pair
            sel_h = do_h.reshape((batch_size,) + (1,) * (b.ndim - 1))
            sel_v = do_v.reshape((batch_size,) + (1,) * (b.ndim - 1))
            b = jnp.where(sel_h, jnp.flip(b, axis=2), b)
            b = jnp.where(sel_v, jnp.flip(b, axis=1), b)
        out[k] = b
    return out


class DeviceDataCache:
    """Hold a dict of [N, ...] arrays in device memory.

    :param tensors: dict of numpy arrays sharing the leading dim.
    :param store_dtype: dtype for float arrays in HBM. Default float32 --
        training numerics match the host loader exactly. Pass
        ``store_dtype=jnp.bfloat16`` to halve the footprint when the set
        would not otherwise fit; that quantizes the stored images (and hence
        the q_sample targets) to bf16, an explicit opt-in (advisor r2).
        Int/bool arrays keep their dtype either way.
    """

    def __init__(self, tensors: Dict[str, np.ndarray], store_dtype=jnp.float32):
        ns = {k: len(v) for k, v in tensors.items()}
        assert len(set(ns.values())) == 1, f"mismatched leading dims: {ns}"
        self.n = next(iter(ns.values()))
        self.tensors = {}
        for k, v in tensors.items():
            v = np.asarray(v)
            dt = store_dtype if np.issubdtype(v.dtype, np.floating) else v.dtype
            self.tensors[k] = jnp.asarray(v, dt)

    def nbytes(self) -> int:
        return sum(int(v.size * v.dtype.itemsize) for v in self.tensors.values())

    def sample_batch(self, rng: jax.Array, batch_size: int,
                     compute_dtype=jnp.float32, augment_flips: bool = True):
        """Eager/outside-jit convenience wrapper over :func:`gather_batch`."""
        return gather_batch(self.tensors, rng, batch_size, compute_dtype,
                            augment_flips)
