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
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from eo_diffusion_tpu.core.schedules import make_ddim_schedule
from eo_diffusion_tpu.diffusion.gaussian import (
    DiffusionOutput,
    GaussianDiffusion,
    cfg_combine,
    cfg_double_inputs,
)

__all__ = ["TileGrid", "make_tile_grid", "unfold", "fold",
           "make_tiled_denoiser", "tiled_ddim_sample", "tiled_flow_sample",
           "tiled_bridge_sample"]


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


def make_tiled_denoiser(
    model_fn: Callable,
    grid: TileGrid,
    tile: int,
    n_samples: int,
    cond: Optional[jax.Array] = None,
    y: Optional[jax.Array] = None,
    guidance_scale: float = 1.0,
    guidance_rescale: float = 0.0,
    uncond: Optional[jax.Array] = None,
    y_uncond: Optional[jax.Array] = None,
    tile_batch: Optional[int] = None,
    model_state: Any = None,
    t_dtype=jnp.int32,
):
    """Build the per-step tile denoiser shared by the tiled samplers.

    Returns ``(denoise_tiles, state0)`` where
    ``denoise_tiles(x_tiles [N,nT,t,t,C], t_scalar, m_state, i) ->
    (raw_tiles, m_state)`` runs the model over the flat tile batch
    (optionally in ``tile_batch`` chunks inside a scan) with the shared CFG
    batch-doubled combine (gaussian.cfg_double_inputs); full-scene
    ``cond``/``uncond`` are unfolded once here. ``t_dtype`` is int32 for
    the DDPM-chain samplers and float32 for the flow ODE (t arrives
    pre-scaled).
    """
    stateful = model_state is not None
    use_cfg = uncond is not None and guidance_scale != 1.0
    use_label_cfg = y_uncond is not None and guidance_scale != 1.0
    cond_tiles = unfold(cond, grid) if cond is not None else None
    uncond_tiles = unfold(uncond, grid) if use_cfg else None

    n_flat = n_samples * grid.num_tiles
    chunked = tile_batch is not None and tile_batch < n_flat
    nb = -(-n_flat // tile_batch) if chunked else 1
    if chunked and stateful:
        # one state copy per chunk, carried across steps (each chunk is a
        # stable tile subset, so its cached deep features stay coherent)
        model_state = jax.tree.map(lambda s: jnp.stack([s] * nb), model_state)

    def call_model(xx, tt, cc, yy, st, i):
        if stateful:
            return model_fn(xx, tt, cc, yy, st, i)
        return model_fn(xx, tt, cc, yy), st

    def run_denoiser(xx, tt, cc, uu, yy, yu, st, i):
        x2, t2, c2, y2, doubled = cfg_double_inputs(
            xx, tt, cc, yy, uu, yu, guidance_scale)
        out, st = call_model(x2, t2, c2, y2, st, i)
        return (cfg_combine(out, guidance_scale, guidance_rescale)
                if doubled else out), st

    def denoise_tiles(x_tiles, t_scalar, m_state, i):
        """Run the denoiser over [N, nT, t, t, C] tiles (optionally chunked)."""
        n, nt = x_tiles.shape[:2]
        flat = x_tiles.reshape(n * nt, tile, tile, x_tiles.shape[-1])
        reshape_flat = lambda a: a.reshape(n * nt, tile, tile, a.shape[-1])
        c_flat = reshape_flat(cond_tiles) if cond_tiles is not None else None
        u_flat = reshape_flat(uncond_tiles) if uncond_tiles is not None else None
        y_flat = jnp.repeat(y, nt, axis=0) if y is not None else None
        yu_flat = jnp.repeat(y_uncond, nt, axis=0) if use_label_cfg else None
        ts = jnp.full((flat.shape[0],), t_scalar, t_dtype)
        if not chunked:
            out, m_state = run_denoiser(
                flat, ts, c_flat, u_flat, y_flat, yu_flat, m_state, i
            )
        else:
            pad = nb * tile_batch - n * nt
            pad4 = lambda a: jnp.pad(a, ((0, pad), (0, 0), (0, 0), (0, 0)))
            flat_p = pad4(flat)
            c_p = pad4(c_flat) if c_flat is not None else None
            u_p = pad4(u_flat) if u_flat is not None else None
            y_p = jnp.pad(y_flat, ((0, pad),)) if y_flat is not None else None
            yu_p = jnp.pad(yu_flat, ((0, pad),)) if yu_flat is not None else None
            ts_p = jnp.pad(ts, ((0, pad),))

            def chunk(st_stack, ci):
                sl = lambda a: jax.lax.dynamic_slice_in_dim(a, ci * tile_batch, tile_batch)
                opt = lambda a: None if a is None else sl(a)
                # without a stateful model the carry is a scalar placeholder
                st_c = st_stack if not stateful else jax.tree.map(
                    lambda s: jax.lax.dynamic_index_in_dim(s, ci, 0, keepdims=False),
                    st_stack,
                )
                o, st_c = run_denoiser(
                    sl(flat_p), sl(ts_p), opt(c_p), opt(u_p), opt(y_p), opt(yu_p),
                    st_c, i,
                )
                if stateful:
                    st_stack = jax.tree.map(
                        lambda s, sc: jax.lax.dynamic_update_index_in_dim(s, sc, ci, 0),
                        st_stack, st_c,
                    )
                return st_stack, o

            m_state, outs = jax.lax.scan(chunk, m_state, jnp.arange(nb))
            out = outs.reshape(nb * tile_batch, tile, tile, -1)[: n * nt]
        return out.reshape(n, nt, tile, tile, -1), m_state

    state0 = model_state if stateful else jnp.zeros((), jnp.float32)
    return denoise_tiles, state0


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
    model_state: Any = None,
    guidance_scale: float = 1.0,
    guidance_rescale: float = 0.0,
    uncond: Optional[jax.Array] = None,
    y_uncond: Optional[jax.Array] = None,
) -> DiffusionOutput:
    """DDIM sampling of an (height, width) scene with a tile-trained denoiser.

    ``cond``/``mask``/``x0`` are full-scene arrays; cond is unfolded alongside
    x so channel-concat conditioning works per tile. RePaint-style masking
    composites on the full scene before each step (like ddim.py:145-148).

    ``guidance_scale``/``uncond``/``y_uncond``: classifier-free guidance with
    the same batch-doubled combine as the non-tiled samplers
    (gaussian.py:505-522); ``uncond`` is a full-scene array unfolded alongside
    ``cond``, ``y_uncond`` the per-sample null-class labels.

    ``model_state``: stateful denoiser support (DeepCache,
    ``deepcache_model_fn``) -- ``model_fn(x, t, cond, y, state, i) ->
    (out, state)``. Build the state with ``example_x`` matching the PER-CALL
    flat tile batch: ``[n*num_tiles, tile, tile, C]`` when ``tile_batch`` is
    None, else ``[tile_batch, ...]`` (doubled under CFG). With ``tile_batch``
    chunking each chunk carries its own state copy across steps, so the two
    flagship accelerations (DeepCache x tiled scenes) compose.

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

    denoise_tiles, state0 = make_tiled_denoiser(
        model_fn, grid, tile, n_samples, cond=cond, y=y,
        guidance_scale=guidance_scale, guidance_rescale=guidance_rescale,
        uncond=uncond, y_uncond=y_uncond,
        tile_batch=tile_batch, model_state=model_state,
    )

    def step(carry, xs):
        idx, i = xs
        x, key, m_state = carry
        key, nk, mk = jax.random.split(key, 3)
        t_scalar = steps[idx]

        if mask is not None:
            assert x0 is not None
            t_full = jnp.full((n_samples,), t_scalar, jnp.int32)
            noise_m = jax.random.normal(mk, shape, jnp.float32)
            x = diffusion.q_sample(x0, t_full, noise_m) * mask + (1.0 - mask) * x

        x_tiles = unfold(x.astype(dtype), grid)
        raw_tiles, m_state = denoise_tiles(x_tiles, t_scalar, m_state, i)
        raw = fold(raw_tiles, grid)  # stitched model output (eps/x0/v)

        t_full = jnp.full((n_samples,), t_scalar, jnp.int32)
        e_t, pred_x0 = diffusion._to_eps_x0(raw, x.astype(jnp.float32), t_full)

        a_prev = alphas_prev[idx]
        sigma_t = sigmas[idx]
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - a_prev - sigma_t**2, 0.0)) * e_t
        x_prev = jnp.sqrt(a_prev) * pred_x0 + dir_xt
        if eta != 0.0:  # static: the ODE path skips the full-SCENE threefry
            x_prev = x_prev + sigma_t * jax.random.normal(nk, shape,
                                                          jnp.float32)
        return (x_prev, key, m_state), None

    idxs = jnp.arange(dd.num_steps - 1, -1, -1)
    (x, _, _), _ = jax.lax.scan(
        step, (img, scan_rng, state0), (idxs, jnp.arange(dd.num_steps))
    )
    return DiffusionOutput(x=x)


def tiled_flow_sample(
    flow,
    model_fn: Callable,
    rng: jax.Array,
    n_samples: int,
    height: int,
    width: int,
    num_steps: int = 16,
    method: str = "heun",
    overlap: float = 0.5,
    tile_batch: Optional[int] = None,
    cond: Optional[jax.Array] = None,
    y: Optional[jax.Array] = None,
    mask: Optional[jax.Array] = None,
    x0: Optional[jax.Array] = None,
    guidance_scale: float = 1.0,
    guidance_rescale: float = 0.0,
    uncond: Optional[jax.Array] = None,
    y_uncond: Optional[jax.Array] = None,
    dtype=jnp.float32,
    model_state: Any = None,
) -> DiffusionOutput:
    """Tiled large-scene sampling on the flow ODE (diffusion/flow.py).

    Same fold/unfold + smooth-weight stitching as :func:`tiled_ddim_sample`
    (shared :func:`make_tiled_denoiser`), but the stitched model output is a
    VELOCITY field integrated with Euler/Heun steps — at Heun-8 a scene
    costs ~15 stitched evaluations instead of DDIM-50's 50, which is where
    the large-scene speedup comes from. ``mask``/``x0``: RePaint-style
    full-scene inpainting via straight-line re-placement (flow.sample
    semantics). The velocity stitching is exact in the overlap limit:
    velocities are linear objects, so the weighted average of per-tile
    velocities is itself the stitched field's velocity.
    """
    assert method in ("euler", "heun"), method
    if mask is not None:
        assert x0 is not None, "flow inpainting requires x0 (known image)"
    tile = flow.image_size
    grid = make_tile_grid(height, width, tile, overlap)
    shape = (n_samples, height, width, flow.in_channels)
    init_rng, mask_rng = jax.random.split(jax.random.fold_in(rng, 3))
    x = jax.random.normal(init_rng, shape, jnp.float32)

    denoise_tiles, state0 = make_tiled_denoiser(
        model_fn, grid, tile, n_samples, cond=cond, y=y,
        guidance_scale=guidance_scale, guidance_rescale=guidance_rescale,
        uncond=uncond, y_uncond=y_uncond,
        tile_batch=tile_batch, model_state=model_state, t_dtype=jnp.float32,
    )

    ts = jnp.linspace(1.0, 0.0, num_steps + 1)

    def velocity(x, t_scalar, m_state, i):
        x_tiles = unfold(x.astype(dtype), grid)
        v_tiles, m_state = denoise_tiles(
            x_tiles, t_scalar * flow.time_scale, m_state, i)
        return fold(v_tiles, grid), m_state  # stitched full-scene velocity

    def step(carry, i):
        x, st = carry
        t_i, t_next = ts[i], ts[i + 1]
        dt = t_next - t_i
        if mask is not None:
            eps = jax.random.normal(jax.random.fold_in(mask_rng, i),
                                    shape, jnp.float32)
            known = (1.0 - t_i) * x0.astype(jnp.float32) + t_i * eps
            x = mask * known + (1.0 - mask) * x
        v1, st = velocity(x, t_i, st, i)
        if method == "heun":
            def _heun(st):
                v2, st = velocity(x + dt * v1, t_next, st, i)
                return 0.5 * (v1 + v2), st

            v, st = jax.lax.cond(jnp.equal(i, num_steps - 1),
                                 lambda st: (v1, st), _heun, st)
        else:
            v = v1
        return (x + dt * v, st), None

    (x, _), _ = jax.lax.scan(step, (x, state0), jnp.arange(num_steps))
    if mask is not None:
        x = mask * x0.astype(jnp.float32) + (1.0 - mask) * x
    return DiffusionOutput(x=x)


def tiled_bridge_sample(
    bridge,
    model_fn: Callable,
    rng: jax.Array,
    n_samples: int,
    height: int,
    width: int,
    num_steps: int = 25,
    overlap: float = 0.5,
    tile_batch: Optional[int] = None,
    cond: Optional[jax.Array] = None,
    y: Optional[jax.Array] = None,
    eta: float = 0.0,
    clip: bool = True,
    dtype=jnp.float32,
    model_state: Any = None,
) -> DiffusionOutput:
    """Tiled large-scene paired translation on the Brownian bridge
    (diffusion/bridge.py): whole-scene cloud removal in one compiled pass.

    ``cond`` is the REQUIRED full-scene source image (e.g. the cloudy
    scene); x starts AT it (no noise init), tiles are denoised with the
    tile-trained bridge model (the source rides per tile through the shared
    :func:`make_tiled_denoiser` concat path), and the stitched RESIDUAL
    prediction drives the full-scene bridge posterior. Like the velocity in
    :func:`tiled_flow_sample`, the residual is a linear object, so the
    weighted average of per-tile residuals is the stitched field's residual
    — the posterior algebra then runs once on the full scene, keeping the
    trajectory coherent across seams.
    """
    assert cond is not None, "bridge sampling requires the source scene (cond)"
    tile = bridge.image_size
    grid = make_tile_grid(height, width, tile, overlap)
    shape = (n_samples, height, width, bridge.in_channels)
    # grid + posterior algebra come from BrownianBridge itself (single
    # source of truth — see bridge.strided_grid / posterior_step)
    num_steps, t_seq, m_seq, d_seq = bridge.strided_grid(num_steps)

    yf = jnp.broadcast_to(cond.astype(jnp.float32), shape)
    denoise_tiles, state0 = make_tiled_denoiser(
        model_fn, grid, tile, n_samples,
        cond=cond if bridge.cond_type == "concat" else None, y=y,
        tile_batch=tile_batch, model_state=model_state,
    )

    def step(carry, xs):
        i, key = xs
        x, st = carry
        x_tiles = unfold(x.astype(dtype), grid)
        raw_tiles, st = denoise_tiles(x_tiles, t_seq[i], st, i)
        pred = fold(raw_tiles, grid)  # stitched residual prediction
        x0_hat = x - pred
        if clip:
            x0_hat = jnp.clip(x0_hat, -1.0, 1.0)

        mean, var = bridge.posterior_step(x, x0_hat, yf,
                                          m_seq[i], m_seq[i + 1],
                                          d_seq[i], d_seq[i + 1])
        if eta != 0.0:  # static: deterministic path skips full-scene threefry
            mean = mean + eta * jnp.sqrt(var) * jax.random.normal(
                key, shape, jnp.float32)
        return (mean, st), None

    keys = jax.random.split(rng, num_steps)
    (x, _), _ = jax.lax.scan(step, (yf, state0),
                             (jnp.arange(num_steps), keys))
    return DiffusionOutput(x=x)
