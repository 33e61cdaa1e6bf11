"""Tiled (fold/unfold) diffusion for EO scenes larger than the train patch.

Re-design of the CompVis LatentDiffusion sliding-window ``apply_model``
(reference ``diffusion/ddpm.py:727-777, 1020-1121``): the denoiser trained on
``tile`` x ``tile`` patches is applied over an overlapping tile grid of an
arbitrarily large scene; per-tile eps predictions are stitched with smooth
border-distance weights before each reverse-process update, so the full-scene
trajectory stays coherent across seams.

TPU shape: the unfold/fold are static gathers / scatter-adds inside the
jitted scan (no dynamic shapes); tiles are processed as one big batch or in
``lax.map`` chunks (``tile_batch``) to bound memory. The whole S-step
reverse loop compiles to a single program like the non-tiled samplers.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from eo_diffusion_tpu.core.schedules import make_ddim_schedule
from eo_diffusion_tpu.diffusion.gaussian import DiffusionOutput, GaussianDiffusion

__all__ = ["TileGrid", "make_tile_grid", "unfold", "fold", "tiled_ddim_sample"]


@dataclasses.dataclass(frozen=True)
class TileGrid:
    """Static tiling plan for an (H, W) scene."""

    height: int
    width: int
    tile: int
    offsets_i: Tuple[int, ...]
    offsets_j: Tuple[int, ...]

    @property
    def num_tiles(self) -> int:
        return len(self.offsets_i) * len(self.offsets_j)


def make_tile_grid(height: int, width: int, tile: int, overlap: float = 0.5) -> TileGrid:
    """Tile offsets at stride (1-overlap)*tile, with the last tile clamped to
    the scene edge (full coverage regardless of divisibility)."""
    assert tile <= height and tile <= width, (tile, height, width)
    stride = max(int(tile * (1.0 - overlap)), 1)

    def offsets(extent):
        offs = list(range(0, extent - tile + 1, stride))
        if offs[-1] != extent - tile:
            offs.append(extent - tile)
        return tuple(offs)

    return TileGrid(height, width, tile, offsets(height), offsets(width))


def _border_weight(tile: int) -> np.ndarray:
    """Smooth per-pixel weight, peaked at the tile centre (the CompVis
    border-distance weighting, ddpm.py:1031-1113, in cosine form)."""
    ramp = 0.5 - 0.5 * np.cos(2.0 * np.pi * (np.arange(tile) + 0.5) / tile)
    w = np.outer(ramp, ramp) + 1e-4
    return w.astype(np.float32)


def unfold(x: jax.Array, grid: TileGrid) -> jax.Array:
    """[N, H, W, C] -> [N, nT, tile, tile, C] by static gathers."""
    t = grid.tile
    rows = jnp.asarray(
        [np.arange(o, o + t) for o in grid.offsets_i], jnp.int32
    )  # [nI, t]
    cols = jnp.asarray(
        [np.arange(o, o + t) for o in grid.offsets_j], jnp.int32
    )  # [nJ, t]
    g = x[:, rows]  # [N, nI, t, W, C]
    g = g[:, :, :, cols]  # [N, nI, t, nJ, t, C]
    g = g.transpose(0, 1, 3, 2, 4, 5)  # [N, nI, nJ, t, t, C]
    n = x.shape[0]
    return g.reshape(n, grid.num_tiles, t, t, x.shape[-1])


def fold(tiles: jax.Array, grid: TileGrid) -> jax.Array:
    """[N, nT, tile, tile, C] -> [N, H, W, C] with normalized smooth blending."""
    n, nt, t, _, c = tiles.shape
    w = jnp.asarray(_border_weight(t))[None, :, :, None]  # [1, t, t, 1]
    out = jnp.zeros((n, grid.height, grid.width, c), jnp.float32)
    norm = jnp.zeros((grid.height, grid.width, 1), jnp.float32)
    tiles = tiles.astype(jnp.float32) * w
    idx = 0
    for oi in grid.offsets_i:
        for oj in grid.offsets_j:
            out = out.at[:, oi : oi + t, oj : oj + t].add(tiles[:, idx])
            norm = norm.at[oi : oi + t, oj : oj + t].add(w[0])
            idx += 1
    return out / norm[None]


def tiled_ddim_sample(
    diffusion: GaussianDiffusion,
    model_fn: Callable,
    rng: jax.Array,
    n_samples: int,
    height: int,
    width: int,
    num_steps: int = 50,
    eta: float = 0.0,
    overlap: float = 0.5,
    tile_batch: Optional[int] = None,
    cond: Optional[jax.Array] = None,
    y: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    x0: Optional[jax.Array] = None,
    dtype=jnp.float32,
) -> DiffusionOutput:
    """DDIM sampling of an (height, width) scene with a tile-trained denoiser.

    ``cond``/``mask``/``x0`` are full-scene arrays; cond is unfolded alongside
    x so channel-concat conditioning works per tile. RePaint-style masking
    composites on the full scene before each step (like ddim.py:145-148).

    Limitation: self-conditioned diffusions (``self_condition=True``) are not
    supported here -- the per-tile x0-estimate carry is not threaded through
    the tile stitching.
    """
    assert not diffusion.self_condition, "tiled sampling does not support self_condition"
    tile = diffusion.image_size
    grid = make_tile_grid(height, width, tile, overlap)
    dd = make_ddim_schedule(diffusion.schedule, num_steps, eta)

    shape = (n_samples, height, width, diffusion.in_channels)
    init_rng, scan_rng = jax.random.split(rng)
    # f32 carry like the non-tiled samplers (per-step bf16 quantization of x
    # accumulates across the chain); ``dtype`` is the model-facing cast
    img = jax.random.normal(init_rng, shape, jnp.float32)

    steps = jnp.asarray(dd.timesteps)
    alphas = jnp.asarray(dd.alphas)
    alphas_prev = jnp.asarray(dd.alphas_prev)
    sigmas = jnp.asarray(dd.sigmas)

    cond_tiles = unfold(cond, grid) if cond is not None else None

    def denoise_tiles(x_tiles, t_scalar, key):
        """Run the denoiser over [N, nT, t, t, C] tiles (optionally chunked)."""
        n, nt = x_tiles.shape[:2]
        flat = x_tiles.reshape(n * nt, tile, tile, x_tiles.shape[-1])
        c_flat = (
            cond_tiles.reshape(n * nt, tile, tile, cond_tiles.shape[-1])
            if cond_tiles is not None
            else None
        )
        y_flat = jnp.repeat(y, nt, axis=0) if y is not None else None
        ts = jnp.full((flat.shape[0],), t_scalar, jnp.int32)
        if tile_batch is None or tile_batch >= n * nt:
            out = model_fn(flat, ts, c_flat, y_flat)
        else:
            nb = -(-n * nt // tile_batch)
            pad = nb * tile_batch - n * nt
            flat_p = jnp.pad(flat, ((0, pad), (0, 0), (0, 0), (0, 0)))
            c_p = (
                jnp.pad(c_flat, ((0, pad), (0, 0), (0, 0), (0, 0)))
                if c_flat is not None
                else None
            )
            y_p = jnp.pad(y_flat, ((0, pad),)) if y_flat is not None else None
            ts_p = jnp.pad(ts, ((0, pad),))

            def chunk(i):
                sl = lambda a: jax.lax.dynamic_slice_in_dim(a, i * tile_batch, tile_batch)
                return model_fn(
                    sl(flat_p), sl(ts_p),
                    None if c_p is None else sl(c_p),
                    None if y_p is None else sl(y_p),
                )

            out = jax.lax.map(chunk, jnp.arange(nb)).reshape(
                nb * tile_batch, tile, tile, -1
            )[: n * nt]
        return out.reshape(n, nt, tile, tile, -1)

    def step(carry, idx):
        x, key = carry
        key, nk, mk = jax.random.split(key, 3)
        t_scalar = steps[idx]

        if mask is not None:
            assert x0 is not None
            t_full = jnp.full((n_samples,), t_scalar, jnp.int32)
            noise_m = jax.random.normal(mk, shape, jnp.float32)
            x = diffusion.q_sample(x0, t_full, noise_m) * mask + (1.0 - mask) * x

        x_tiles = unfold(x.astype(dtype), grid)
        raw_tiles = denoise_tiles(x_tiles, t_scalar, key)
        raw = fold(raw_tiles, grid)  # stitched model output (eps/x0/v)

        t_full = jnp.full((n_samples,), t_scalar, jnp.int32)
        e_t, pred_x0 = diffusion._to_eps_x0(raw, x.astype(jnp.float32), t_full)

        a_prev = alphas_prev[idx]
        sigma_t = sigmas[idx]
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma_t**2, 0.0)) * e_t
        noise = sigma_t * jax.random.normal(nk, shape, jnp.float32)
        x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt + noise
        return (x_prev, key), None

    idxs = jnp.arange(dd.num_steps - 1, -1, -1)
    (x, _), _ = jax.lax.scan(step, (img, scan_rng), idxs)
    return DiffusionOutput(x=x)
