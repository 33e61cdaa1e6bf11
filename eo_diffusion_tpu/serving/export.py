"""AOT sampler export: a self-contained deployment artifact via jax.export.

The serving engine already compiles ONE fixed-shape full-trajectory
sampler (``serving/engine.py``). This module serializes that exact
program — the whole ``lax.scan`` trajectory, guidance, int8 dequant and
all — as a **versioned StableHLO artifact** (``jax.export``), bundled
with the weights. A deployment host then needs nothing but ``jax`` and
``numpy`` to serve the model: no framework model code, no Flax, no
preset registry, no retracing. The reference has no deployment story at
all (its ``inference.py`` is an offline eval script — SURVEY.md §2 #5);
this is the TPU-native production packaging for it.

Artifact layout (``out_dir/``)::

    sampler.stablehlo   jax.export bytes (shape-checked calling convention)
    params.npz          flat param leaves, key ``p{i:05d}`` in treedef order
    manifest.json       shapes / sampler config / provenance

Design notes:

* The exported function takes the params as a **flat tuple of leaves**
  (unflattened inside the traced body), so the loader never needs the
  pytree structure — ``params.npz`` keys sort back into call order.
* ``rng`` rides as a raw ``uint32[2]`` key so the loader can build it
  with ``numpy`` alone.
* Conditioning follows the engine's convention: ``y``/``cond`` are
  arrays when the engine is class-/concat-conditional and ``None``
  otherwise — ``None`` is part of jax.export's serialized calling
  convention, so the loader passes exactly what the manifest says.
* This module deliberately imports only jax/numpy/stdlib: the loader
  half (:func:`load_model`) must stay runnable on a host that has no
  model code installed (contract pinned by the subprocess test in
  ``tests/test_export.py``).
"""

from __future__ import annotations

import json
import os
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["export_engine", "load_model", "MANIFEST_NAME"]

MANIFEST_NAME = "manifest.json"
_HLO_NAME = "sampler.stablehlo"
_PARAMS_NAME = "params.npz"


def _leaf_key(i: int) -> str:
    return f"p{i:05d}"


def export_engine(engine, out_dir: str, extra_meta: Optional[dict] = None,
                  platforms: Optional[Sequence[str]] = None) -> dict:
    """Serialize a :class:`~eo_diffusion_tpu.serving.engine.SamplerEngine`'s
    compiled sampler + weights into ``out_dir``; returns the manifest.

    ``platforms`` defaults to the current backend (e.g. ``('tpu',)`` when
    exporting on-chip); pass several (``('tpu', 'cpu')``) for a
    cross-platform artifact — jax.export lowers once per platform.
    """
    cfg = engine.cfg
    assert engine.mesh is None, (
        "export a single-device engine: dp serving pins shardings to a "
        "live mesh the artifact can't carry (shard at load time instead)")
    leaves, treedef = jax.tree.flatten(engine.params)
    B, H = cfg.batch_size, engine.image_size

    # the traced body inlines the engine's one jitted program; leaves ride
    # as a flat tuple so the artifact's calling convention needs no treedef
    def run_flat(flat, rng, y, cond):
        params = jax.tree.unflatten(treedef, list(flat))
        return engine._jitted(params, rng, y, cond)

    y0 = engine._blank_y()
    c0 = engine._blank_cond()
    args = (tuple(leaves), jax.random.PRNGKey(0),
            None if y0 is None else jnp.asarray(y0),
            None if c0 is None else jnp.asarray(c0))
    specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), args)
    kw = {}
    if platforms is not None:
        kw["platforms"] = tuple(platforms)
    exported = jax.export.export(jax.jit(run_flat), **kw)(*specs)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, _HLO_NAME), "wb") as f:
        f.write(exported.serialize())
    np.savez(os.path.join(out_dir, _PARAMS_NAME),
             **{_leaf_key(i): np.asarray(l) for i, l in enumerate(leaves)})

    manifest = {
        "format": "eo_diffusion_tpu.export/1",
        "jax_version": jax.__version__,
        "platforms": list(exported.platforms),
        "n_leaves": len(leaves),
        "param_bytes": int(sum(np.asarray(l).nbytes for l in leaves)),
        "batch_size": B,
        "image_size": H,
        "channels": engine.channels,
        "num_classes": cfg.num_classes,
        "cond_channels": cfg.cond_channels,
        "sampler": cfg.sampler,
        "steps": cfg.steps,
        "eta": cfg.eta,
        "ddim_spacing": cfg.ddim_spacing,
        "guidance_scale": cfg.guidance_scale,
        "pag_scale": cfg.pag_scale,
        "int8": cfg.int8,
        "int8_compute": cfg.int8_compute,
        "bf16": cfg.bf16,
    }
    if extra_meta:
        manifest.update(extra_meta)
    with open(os.path.join(out_dir, MANIFEST_NAME), "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def load_model(out_dir: str) -> tuple:
    """Load an exported artifact; returns ``(generate, manifest)``.

    ``generate(seed_or_key, y=None, cond=None) -> np.ndarray[B, H, W, C]``
    runs one fixed device batch through the deserialized program.
    ``seed_or_key`` is an int seed or a ``uint32[2]`` key. ``y`` is
    ``[B]`` int labels (class-conditional artifacts only); ``cond`` is
    ``[B, H, W, Cc]`` (concat-conditional only) — omitted slots fall back
    to the engine's blank values, matching live-serving semantics.

    Needs only jax + numpy: nothing from the framework's model stack is
    imported on this path.
    """
    with open(os.path.join(out_dir, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    with open(os.path.join(out_dir, _HLO_NAME), "rb") as f:
        exported = jax.export.deserialize(bytearray(f.read()))
    z = np.load(os.path.join(out_dir, _PARAMS_NAME))
    leaves = tuple(z[_leaf_key(i)] for i in range(manifest["n_leaves"]))

    B = manifest["batch_size"]
    H = manifest["image_size"]
    nc, cc = manifest["num_classes"], manifest["cond_channels"]

    def generate(seed_or_key, y=None, cond=None) -> np.ndarray:
        key = (jax.random.PRNGKey(seed_or_key)
               if np.ndim(seed_or_key) == 0 else jnp.asarray(seed_or_key))
        if nc:
            y = (np.zeros((B,), np.int32) if y is None
                 else np.asarray(y, np.int32))
            assert y.shape == (B,) and 0 <= int(y.min()) \
                and int(y.max()) < nc, (
                f"y must be [{B}] labels in [0, {nc}), got shape "
                f"{y.shape}")
            y = jnp.asarray(y)
        else:
            assert y is None, "artifact is not class-conditional"
        if cc:
            cond = (np.zeros((B, H, H, cc), np.float32) if cond is None
                    else np.asarray(cond, np.float32))
            assert cond.shape == (B, H, H, cc), (cond.shape, (B, H, H, cc))
            cond = jnp.asarray(cond)
        else:
            assert cond is None, "artifact is not concat-conditional"
        return np.asarray(exported.call(leaves, key, y, cond))

    return generate, manifest
