"""Pipeline parallelism (GPipe) over a 'stage' mesh axis.

The reference has no distributed path at all (SURVEY.md §2.3); rounds 1-2
documented PP as out-of-scope for the convolutional UNet (skip connections
tie the halves together and the model fits one chip). The DiT family
(models/dit.py) removes both objections: its torso is ``depth`` identical
blocks with identical [N, T, D] activations, which is exactly the shape
GPipe wants. This module implements it TPU-natively:

* block params for all depth blocks are **stacked on a leading axis** and
  sharded over the mesh's ``stage`` axis (each stage holds depth/S blocks
  resident — the PP memory win);
* the microbatch schedule runs inside ONE ``shard_map`` as a
  ``lax.scan`` of ``n_micro + S - 1`` ticks; at each tick every stage runs
  its local block stack and hands its activation to the next stage over ICI
  via ``lax.ppermute`` (the canonical neighbor-exchange collective);
* the whole thing is differentiable (scan + ppermute transpose cleanly), so
  the same code path serves training tests; the GPipe bubble
  (S-1)/(n_micro+S-1) is the usual cost and shrinks with more microbatches.

Scope note: at the reference model scale PP remains unnecessary (TP+FSDP
are the production path, parallel/mesh.py); this exists so the framework
scales past one chip's HBM on deep transformer denoisers, and it is
parity- and gradient-tested on the virtual CPU mesh
(tests/test_pipeline.py).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["stack_block_params", "gpipe_blocks", "pp_dit_apply"]


def stack_block_params(params: dict, depth: int, prefix: str = "block_"):
    """Stack the per-block param subtrees ``{prefix}{i}`` on a new leading
    axis (the stage-shardable layout). Works on the inner ``params["params"]``
    collection of a flax variables dict or on the collection itself."""
    inner = params["params"] if "params" in params else params
    blocks = [inner[f"{prefix}{i}"] for i in range(depth)]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def gpipe_blocks(
    block_fn: Callable,
    stacked_params,
    h: jax.Array,
    c: jax.Array,
    mesh: Mesh,
    axis: str = "stage",
    n_micro: int = 2,
    data_axis: Optional[str] = None,
) -> jax.Array:
    """Run a stack of identical blocks pipeline-parallel over ``axis``.

    :param block_fn: ``(block_params, h [mb, ...], c [mb, ...]) -> h`` —
        one block applied to one microbatch.
    :param stacked_params: tree with leading dim == depth (stack_block_params).
    :param h: activations [B, ...] (e.g. [B, T, D] tokens).
    :param c: per-sample conditioning [B, ...] (rides along with h's
        microbatching; pass a [B, 0] dummy if unused).
    :param n_micro: microbatch count M; B % M == 0. The bubble fraction is
        (S-1)/(M+S-1) — raise M to amortize.
    :param data_axis: optional mesh axis carrying data parallelism; h/c stay
        batch-sharded over it while the pipeline runs over ``axis``.
    """
    S = mesh.shape[axis]
    depth = jax.tree.leaves(stacked_params)[0].shape[0]
    assert depth % S == 0, f"depth {depth} not divisible by {S} stages"
    b = h.shape[0]
    assert b % n_micro == 0, (b, n_micro)
    mb = b // n_micro
    h_m = h.reshape(n_micro, mb, *h.shape[1:])
    c_m = c.reshape(n_micro, mb, *c.shape[1:])

    io_spec = P(None, data_axis) if data_axis else P()

    def stage(local_params, h_m, c_m):
        s = jax.lax.axis_index(axis)

        def run_local(h_in, c_in):
            def body(carry, bp):
                return block_fn(bp, carry, c_in), None
            out, _ = jax.lax.scan(body, h_in, local_params)
            return out

        def tick(carry, tstep):
            recv, out = carry
            m = tstep - s  # microbatch index this stage works on now
            m_c = jnp.clip(m, 0, n_micro - 1)
            # stage 0 feeds from the input queue; later stages consume the
            # activation handed over by the previous stage last tick
            x_in = jnp.where(s == 0, h_m[m_c], recv)
            y = run_local(x_in, c_m[m_c])
            valid = (m >= 0) & (m < n_micro)
            out = jnp.where(valid & (s == S - 1), out.at[m_c].set(y), out)
            recv = jax.lax.ppermute(
                y, axis, [(i, (i + 1) % S) for i in range(S)])
            return (recv, out), None

        carry0 = (jnp.zeros_like(h_m[0]), jnp.zeros_like(h_m))
        (_, out), _ = jax.lax.scan(tick, carry0, jnp.arange(n_micro + S - 1))
        # results live on the last stage; psum broadcasts them everywhere
        # (one [M, mb, ...] all-reduce at the end of the pipeline)
        return jax.lax.psum(
            jnp.where(s == S - 1, out, jnp.zeros_like(out)), axis)

    out = jax.shard_map(
        stage,
        mesh=mesh,
        in_specs=(P(axis), io_spec, io_spec),
        out_specs=io_spec,
        check_vma=False,
    )(stacked_params, h_m, c_m)
    return out.reshape(b, *h.shape[1:])


def pp_dit_apply(
    model,
    params,
    x: jax.Array,
    t: jax.Array,
    mesh: Mesh,
    cond: Optional[jax.Array] = None,
    y: Optional[jax.Array] = None,
    axis: str = "stage",
    n_micro: int = 2,
    data_axis: Optional[str] = None,
) -> jax.Array:
    """DiT forward with the block torso pipeline-parallel over ``axis``.

    Numerically identical to ``model.apply(params, x, t, ...)`` (same
    modules, same op order — only the schedule is distributed); embed /
    condition / final run replicated (they are <1% of the FLOPs)."""
    from eo_diffusion_tpu.models.dit import DiT, torso_block

    cfg = model.cfg
    assert cfg.context_dim == 0, (
        "pp_dit_apply does not thread cross-attention context through the "
        "pipeline riders yet; use the sequential forward for context models")
    h = model.apply(params, x, cond, method=DiT.embed)
    c = model.apply(params, t, y, method=DiT.condition)
    stacked = stack_block_params(params, cfg.depth)
    # torso_block reproduces setup()'s exact construction (incl. ToMe) so
    # "numerically identical to model.apply" holds for ToMe configs too
    block = torso_block(cfg)
    block_fn = lambda bp, hh, cc: block.apply({"params": bp}, hh, cc)
    h = gpipe_blocks(block_fn, stacked, h, c, mesh, axis=axis,
                     n_micro=n_micro, data_axis=data_axis)
    return model.apply(params, h, c, method=DiT.final)
