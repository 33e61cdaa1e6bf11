"""Token merging (ToMe) for diffusion transformers — training-free
sampling acceleration (Bolya & Hoffman, "Token Merging for Fast Stable
Diffusion", arXiv:2303.17604; original ToMe arXiv:2210.09461).

Beyond-reference capability: the reference has no transformer backbone at
all (its backbones are the UNets, SURVEY.md §2 #3/#16-18); this composes
with the framework's DiT family (models/dit.py) as the transformer analog
of DeepCache — both are *training-free* inference accelerators, and they
compose (DeepCache skips depth, ToMe shrinks width/tokens).

TPU-first design: everything here is static-shape. The merge count ``r``
is a Python int fixed at trace time, so the merged token count
``Tm = T - r`` is a static dimension that XLA tiles onto the MXU like any
other — there is no dynamic gather/compaction anywhere (contrast the GPU
implementation's boolean-mask ``gather_nd``). Token selection happens with
one argsort + fixed-size ``take_along_axis`` gathers; merging is a
fixed-fanout ``.at[].add`` scatter.

Bipartite soft matching (per sample):

* Partition the token grid into **dst** (one per ``sx x sy`` cell, fixed
  top-left offset — deterministic, unlike the GPU impl's random offset)
  and **src** (the rest).
* Cosine similarity of every src token to every dst token on a metric
  (here: the block's attention input); each src keeps its best dst.
* The ``r`` highest-scoring src tokens are merged (mean) into their best
  dst; the rest pass through. ``unmerge`` scatters dst outputs back to
  every constituent's original position, so downstream residual adds stay
  full-length.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["tome_partition", "aligned_merge_count", "build_merge"]


@functools.lru_cache(maxsize=None)
def tome_partition(grid_h: int, grid_w: int, sx: int = 2, sy: int = 2
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Static dst/src index split of a row-major ``grid_h x grid_w`` token
    grid: dst = the top-left token of every ``sy x sx`` cell."""
    ys, xs = np.meshgrid(np.arange(grid_h), np.arange(grid_w), indexing="ij")
    is_dst = ((ys % sy == 0) & (xs % sx == 0)).reshape(-1)
    idx = np.arange(grid_h * grid_w)
    return idx[is_dst], idx[~is_dst]


def aligned_merge_count(tokens: int, n_src: int, ratio: float) -> int:
    """Merge count ``r`` for a target ratio of *total* tokens removed,
    rounded so the merged count satisfies the zero-copy attention kernel's
    dispatch rule (ops/attention.py:770): any multiple of 8 engages the
    whole-T q-block at T <= 1024; beyond that the auto q-block is 512, so
    the merged count snaps to a 512 multiple. Never exceeds the
    src-partition size."""
    r = int(round(tokens * ratio))
    tm = tokens - r
    align = 512 if tm > 1024 else 8
    tm = max(align, int(round(tm / align)) * align)
    r = tokens - min(tm, tokens)
    return max(0, min(r, n_src))


def build_merge(metric: jax.Array, grid: Tuple[int, int], r: int,
                sx: int = 2, sy: int = 2
                ) -> Tuple[Callable[[jax.Array], jax.Array],
                           Callable[[jax.Array], jax.Array]]:
    """Build ``(merge, unmerge)`` closures from a similarity metric.

    ``metric``: [B, T, D] (any float dtype; similarity math runs f32).
    ``merge(x)``: [B, T, C] -> [B, T - r, C], layout
    ``[unmerged_src (Ns-r) | dst (Nd)]``; merged dst entries are the plain
    mean of the dst token and its merged sources (arXiv:2210.09461 §3:
    constant size weighting is within noise of the tracked-size variant
    for r applied once per block, and keeps the op scatter-add-only).
    ``unmerge(a)``: [B, T - r, C] -> [B, T, C], every merged src receiving
    its dst's row. Both closures are vmapped over the batch and reuse the
    same per-sample assignment, so pairs of calls inside one block are
    consistent. ``r == 0`` degrades to an exact permutation round-trip.
    """
    dst_np, src_np = tome_partition(grid[0], grid[1], sx, sy)
    n_dst, n_src = len(dst_np), len(src_np)
    assert 0 <= r <= n_src, (r, n_src)
    tokens = n_dst + n_src
    dst_idx = jnp.asarray(dst_np)
    src_idx = jnp.asarray(src_np)

    m = metric.astype(jnp.float32)
    m = m / jnp.maximum(jnp.linalg.norm(m, axis=-1, keepdims=True), 1e-6)
    m_src = jnp.take(m, src_idx, axis=1)              # [B, Ns, D]
    m_dst = jnp.take(m, dst_idx, axis=1)              # [B, Nd, D]
    sim = jnp.einsum("bsd,btd->bst", m_src, m_dst)    # [B, Ns, Nd]
    best_dst = jnp.argmax(sim, axis=-1)               # [B, Ns]
    best_score = jnp.max(sim, axis=-1)                # [B, Ns]
    # descending score; ties broken by token order (stable argsort of -score)
    order = jnp.argsort(-best_score, axis=-1)         # [B, Ns]
    merged_pos = order[:, :r]                          # [B, r]    (into src list)
    kept_pos = order[:, r:]                            # [B, Ns-r]
    merged_dst = jnp.take_along_axis(best_dst, merged_pos, axis=1)  # [B, r]

    def _merge_one(x, kept_p, merged_p, mdst):
        x_src = x[src_idx]                             # [Ns, C]
        x_dst = x[dst_idx]                             # [Nd, C]
        kept = x_src[kept_p]                           # [Ns-r, C]
        if r:
            contrib = x_src[merged_p].astype(jnp.float32)   # [r, C]
            sums = jnp.zeros((n_dst, x.shape[-1]), jnp.float32
                             ).at[mdst].add(contrib)
            counts = jnp.zeros((n_dst,), jnp.float32).at[mdst].add(1.0)
            x_dst = ((x_dst.astype(jnp.float32) + sums)
                     / (1.0 + counts)[:, None]).astype(x.dtype)
        return jnp.concatenate([kept, x_dst], axis=0)  # [T - r, C]

    def _unmerge_one(a, kept_p, merged_p, mdst):
        a_kept, a_dst = a[: n_src - r], a[n_src - r:]
        out = jnp.zeros((tokens, a.shape[-1]), a.dtype)
        out = out.at[dst_idx].set(a_dst)
        out = out.at[src_idx[kept_p]].set(a_kept)
        if r:
            out = out.at[src_idx[merged_p]].set(a_dst[mdst])
        return out

    def merge(x: jax.Array) -> jax.Array:
        return jax.vmap(_merge_one)(x, kept_pos, merged_pos, merged_dst)

    def unmerge(a: jax.Array) -> jax.Array:
        return jax.vmap(_unmerge_one)(a, kept_pos, merged_pos, merged_dst)

    return merge, unmerge
