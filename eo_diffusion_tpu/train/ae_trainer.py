"""First-stage autoencoder training for latent diffusion.

The reference's first stage arrives pre-trained from CompVis
(``diffusion/ddpm.py:628-645`` instantiates a frozen VAE/VQ model from a
config); this environment has no pretrained VAE, so the framework trains its
own small first stage (``models/autoencoder.ConvAutoencoder``) on the target
dataset before latent-UNet training -- the path ``cli/train.py --preset
latent64`` drives.

Loss = MSE reconstruction + a small latent L2 penalty. The penalty is the
deterministic stand-in for the CompVis KL term (ddpm.py: the
``AutoencoderKL`` posterior regularizer): it keeps latent magnitudes bounded
so the diffusion's fixed-variance noise schedule stays calibrated, without
the variational machinery a from-scratch small AE doesn't need.

After training, ``scale_factor = 1 / std(z)`` over a probe batch -- exactly
the CompVis first-batch rescaling (ddpm.py:677-692 ``std rescaling`` of
``encode_first_stage`` output) -- so latents enter the diffusion with unit
variance.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from eo_diffusion_tpu.models.autoencoder import AutoencoderConfig, ConvAutoencoder

__all__ = ["train_autoencoder", "save_ae", "load_ae", "make_codec"]


def train_autoencoder(
    model: ConvAutoencoder,
    batches: Iterable[np.ndarray],
    rng: jax.Array,
    steps: int,
    lr: float = 2e-3,
    latent_reg: float = 1e-4,
    log_every: int = 0,
) -> Tuple[dict, float, list]:
    """Train the first stage; returns ``(params, scale_factor, losses)``.

    :param batches: iterable of [N,H,W,C] float arrays (cycled if shorter
        than ``steps``).
    :param latent_reg: weight of the mean(z^2) penalty (see module docs).
    """
    def _cycle(src, cap):
        """Yield from ``src`` repeatedly.

        Re-iterable sources (lists, loader views like cli.train's
        ``_ImageBatches``) are re-iterated each epoch — zero host-RAM
        cache, fresh per-epoch shuffles preserved (caching MB-scale image
        batches for thousands of steps is the exact host-RSS growth
        CLAUDE.md documents killing a capstone). Only a true one-shot
        generator (``iter(src) is src``, which restarts as the SAME
        exhausted iterator) falls back to a replay cache, capped at
        ``cap`` (the total draws needed)."""
        it0 = iter(src)
        if iter(src) is it0:  # one-shot generator: iter() returns itself
            seen = []
            for item in it0:
                if len(seen) < cap:
                    seen.append(item)
                yield item
            assert seen, "train_autoencoder got an empty batches iterable"
            while True:
                for item in seen:
                    yield item
        else:
            epochs = 0
            while True:
                got = False
                for item in it0 if epochs == 0 else iter(src):
                    got = True
                    yield item
                if not got:
                    raise RuntimeError(
                        "train_autoencoder: batches source yielded nothing"
                        + (" on re-iteration (a re-iterable wrapper over a "
                           "spent iterator?)" if epochs else ""))
                epochs += 1

    it = _cycle(batches, steps)
    first = jnp.asarray(next(it))
    params = jax.jit(model.init)(rng, first[:1])
    tx = optax.adam(lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, x):
        def loss_fn(p):
            z = model.apply(p, x, method="encode")
            rec = model.apply(p, z, method="decode")
            rec_l = jnp.mean((rec - x) ** 2)
            reg_l = jnp.mean(z.astype(jnp.float32) ** 2)
            return rec_l + latent_reg * reg_l, rec_l

        (l, rec_l), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, rec_l

    losses, x = [], first
    for i in range(steps):
        params, opt, l = step(params, opt, jnp.asarray(x))
        if log_every and i % log_every == 0:
            losses.append(float(l))
            print(f"ae step {i}/{steps} recon_mse {losses[-1]:.5f}", flush=True)
        x = next(it)

    z = model.apply(params, first, method="encode")
    scale = 1.0 / max(float(jnp.std(z.astype(jnp.float32))), 1e-6)
    return params, scale, losses


def make_codec(model: ConvAutoencoder, params) -> Tuple:
    """(encode_fn, decode_fn) closures for :class:`LatentDiffusion`."""
    encode = lambda x: model.apply(params, x, method="encode")
    decode = lambda z: model.apply(params, z, method="decode")
    return encode, decode


# -- persistence -------------------------------------------------------------
#
# Orbax for the param tree; a JSON sidecar for scale_factor + the
# AutoencoderConfig (so inference can rebuild the module without the
# training-side preset).

_META = "ae_meta.json"


def save_ae(ae_dir: str, config: AutoencoderConfig, params, scale_factor: float) -> str:
    from eo_diffusion_tpu.train.checkpoint import save_checkpoint

    os.makedirs(ae_dir, exist_ok=True)
    save_checkpoint(ae_dir, jax.device_get(params), name="params")
    meta = {k: v for k, v in dataclasses.asdict(config).items() if k != "dtype"}
    meta["scale_factor"] = float(scale_factor)
    with open(os.path.join(ae_dir, _META), "w") as f:
        json.dump(meta, f, indent=2)
    return ae_dir


def load_ae(ae_dir: str) -> Tuple[ConvAutoencoder, dict, float]:
    """Rebuild (model, params, scale_factor) from :func:`save_ae` output."""
    import orbax.checkpoint as ocp

    with open(os.path.join(ae_dir, _META)) as f:
        meta = json.load(f)
    scale = meta.pop("scale_factor")
    config = AutoencoderConfig(**meta)
    params = ocp.StandardCheckpointer().restore(
        os.path.abspath(os.path.join(ae_dir, "params"))
    )
    return ConvAutoencoder(config), params, scale


def ae_exists(ae_dir: Optional[str]) -> bool:
    return bool(ae_dir) and os.path.isfile(os.path.join(ae_dir, _META))
