"""DeepCache accelerated sampling (Ma et al., arXiv 2312.00858).

No reference counterpart (beyond-reference capability): adjacent diffusion
steps produce nearly identical *deep* UNet features, so the downsampled
levels + middle block + all attention (the expensive part of the clouds
config) are recomputed only every ``refresh_every`` steps; in between, only
the full-resolution shallow blocks run, splicing in the cached up-sampled
deep feature (``models/unet.py`` ``deep_cache=``/``return_deep=``).

TPU-shaped: the refresh/reuse choice is a ``lax.cond`` inside the sampler's
``lax.scan`` carry -- one jitted program, static shapes, no host round-trips.

Usage::

    fn, state0 = deepcache_model_fn(model, params, x_spec, refresh_every=2)
    out = diffusion.ddim_sample(fn, rng, n, num_steps=50, model_state=state0)
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

__all__ = ["deepcache_model_fn"]


def deepcache_model_fn(
    model,
    params,
    example_x: jax.Array,
    example_y: Optional[jax.Array] = None,
    example_cond: Optional[jax.Array] = None,
    refresh_every: int = 2,
    cache_depth: Optional[int] = None,
):
    """Build a stateful denoiser for ``ddim_sample(..., model_state=)``.

    ``example_x`` (and ``example_y``/``example_cond`` if the model is
    conditioned) fix the traced shapes; the initial state is a zeros pytree
    of the deep-feature shape (step 0 always refreshes, so the zeros are
    never consumed).

    Returns ``(fn, state0)`` where ``fn(x, t, cond, y, state, i)`` ->
    ``(eps, state)``.
    """
    t_ex = jnp.zeros((example_x.shape[0],), jnp.int32)

    def _full(x, t, cond, y):
        return model.apply(
            params, x, t, cond=cond, y=y,
            return_deep=True, cache_depth=cache_depth,
        )

    out_spec = jax.eval_shape(
        _full, example_x, t_ex, example_cond, example_y
    )[1]
    state0 = jnp.zeros(out_spec.shape, out_spec.dtype)

    def fn(x, t, cond, y, state, i):
        def full(_):
            return _full(x, t, cond, y)

        def partial(st):
            out = model.apply(
                params, x, t, cond=cond, y=y,
                deep_cache=st, cache_depth=cache_depth,
            )
            return out, st

        return jax.lax.cond(i % refresh_every == 0, full, partial, state)

    return fn, state0
