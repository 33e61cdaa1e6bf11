"""Few-step distillation of rectified flows (ReFlow; beyond-reference).

The reference has no distillation of any kind (its fastest sampler is
DDIM-250, inference.py:27). ``diffusion/flow.py`` already buys 8-32-step
sampling; this module adds the next rung — Liu et al.'s **ReFlow**
(arXiv:2209.03003 §3.2), the procedure behind 1-4-step "InstaFlow"-style
samplers:

1. simulate the teacher ODE from fixed noise ``eps`` to get deterministic
   couplings ``(eps, x1)`` (:func:`generate_couplings`);
2. re-fit the same flow objective on those *paired* endpoints
   (``FlowMatching.train_loss(noise=eps)``) — the marginals are preserved
   but the paths straighten, so Euler with 1-4 steps lands where the
   teacher needed 16-32.

Everything is TPU-shaped: coupling generation is the existing jitted
``lax.scan`` sampler batched over chunks, the re-fit is the ordinary jitted
train step (the pair rides the batch dict as a "noise" entry through
``train.trainer.make_train_step``), and the two evaluation functionals are
single jitted programs.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from eo_diffusion_tpu.diffusion.flow import FlowMatching

__all__ = [
    "generate_couplings",
    "coupling_batches",
    "straightness",
    "endpoint_gap",
    "cfg_model_fn",
]


def cfg_model_fn(model_fn: Callable, scale: float, null_y: int,
                 guidance_rescale: float = 0.0) -> Callable:
    """Collapse classifier-free guidance into one ``model_fn``.

    Guidance distillation (Meng et al., arXiv:2210.03142) folds the
    CFG-combined teacher — two model calls per step via the samplers'
    batch-doubling (``cfg_double_inputs``) — into a single callable the
    distillation machinery can treat as an ordinary teacher: couplings
    simulated from THIS fn follow the guided probability-flow ODE, so the
    re-fit student reproduces guided quality with one unguided call.

    The two teacher evaluations live in one jaxpr (XLA schedules them
    back-to-back; cost equals the doubled batch, paid only at distillation
    time). ``null_y``: the learned null-class row (index ``num_classes``,
    mirroring the samplers' ``y_uncond``). ``guidance_rescale`` is the
    arXiv:2305.08891 std-rescue, matching ``cfg_combine``.
    """
    def fn(x, t, cond=None, y=None):
        assert y is not None, "guided teacher needs class labels"
        e_c = model_fn(x, t, cond, y).astype(jnp.float32)
        e_u = model_fn(x, t, cond, jnp.full_like(y, null_y)).astype(jnp.float32)
        guided = e_u + scale * (e_c - e_u)
        if guidance_rescale:
            axes = tuple(range(1, guided.ndim))
            std_c = jnp.std(e_c, axis=axes, keepdims=True)
            std_g = jnp.std(guided, axis=axes, keepdims=True)
            fixed = guided * (std_c / jnp.maximum(std_g, 1e-8))
            guided = (guidance_rescale * fixed
                      + (1.0 - guidance_rescale) * guided)
        return guided

    return fn


def _pad_to_batch(a, batch_size: int):
    """Tile ``a`` along axis 0 until it holds ``batch_size`` rows (no-op for
    None or already-full arrays)."""
    if a is None or a.shape[0] >= batch_size:
        return a
    reps = -(-batch_size // a.shape[0])
    return jnp.tile(a, (reps,) + (1,) * (a.ndim - 1))[:batch_size]


def generate_couplings(
    flow: FlowMatching,
    model_fn: Callable,
    rng: jax.Array,
    n: int,
    num_steps: int = 32,
    method: str = "heun",
    batch_size: int = 64,
    cond: Optional[np.ndarray] = None,
    y: Optional[np.ndarray] = None,
    dtype=jnp.float32,
    params=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Simulate the teacher ODE from fixed noise: ``(eps, x1)`` couplings.

    Runs ``ceil(n / batch_size)`` jitted teacher trajectories (one compile;
    chunks stream through the same executable) and returns host numpy
    arrays — the coupling set is a *dataset* for the re-fit stage, not a
    device-resident activation. ``cond``/``y`` are full-length [n, ...]
    arrays sliced per chunk (conditional teachers distill to conditional
    students on the same conditioning marginal).

    ``params``: when given, ``model_fn`` is ``(params, x, t, c, y)`` and
    the tree is THREADED as a jit argument — required through the axon
    remote-compile tunnel, where a closed-over tree becomes literal
    constants in the compile payload (HTTP-413 failure mode, CLAUDE.md).
    """
    shape = (batch_size, flow.image_size, flow.image_size, flow.in_channels)

    def chunk(p, params_free_rng, c, yy):
        fn = (model_fn if p is None
              else (lambda x, t, cc, yy2: model_fn(p, x, t, cc, yy2)))
        eps = jax.random.normal(params_free_rng, shape, jnp.float32)
        out = flow.sample(fn, params_free_rng, batch_size,
                          num_steps=num_steps, method=method, x_T=eps,
                          cond=c, y=yy, dtype=dtype)
        return eps, out.x

    jchunk = jax.jit(chunk)  # p=None is an empty pytree: same trace as before
    eps_all, x1_all = [], []
    n_chunks = -(-n // batch_size)
    for i in range(n_chunks):
        c = None if cond is None else jnp.asarray(
            cond[i * batch_size:(i + 1) * batch_size])
        yy = None if y is None else jnp.asarray(
            y[i * batch_size:(i + 1) * batch_size])
        # Ragged tail: tile up to a full batch (a single `c[:pad]` concat
        # underfills whenever the tail is smaller than half the batch —
        # the padded rows are discarded by the final `[:n]` slice anyway).
        c = _pad_to_batch(c, batch_size)
        yy = _pad_to_batch(yy, batch_size)
        eps, x1 = jchunk(params, jax.random.fold_in(rng, i), c, yy)
        eps_all.append(np.asarray(eps, np.float32))
        x1_all.append(np.asarray(x1, np.float32))
    eps_np = np.concatenate(eps_all)[:n]
    x1_np = np.concatenate(x1_all)[:n]
    return eps_np, x1_np


def coupling_batches(
    eps: np.ndarray,
    x1: np.ndarray,
    batch_size: int,
    seed: int = 0,
    cond: Optional[np.ndarray] = None,
    y: Optional[np.ndarray] = None,
) -> Iterator[dict]:
    """Infinite shuffled iterator of paired batches for the train step.

    Yields the batch-dict shape ``make_train_step`` consumes: the teacher
    endpoint as "image" (the data side of the flow) and the paired noise as
    "noise" (pins the eps inside ``FlowMatching.train_loss``)."""
    assert len(eps) == len(x1), (len(eps), len(x1))
    rng = np.random.default_rng(seed)
    while True:
        idx = rng.integers(0, len(eps), batch_size)
        batch = {"image": x1[idx], "noise": eps[idx]}
        if cond is not None:
            batch["cond"] = cond[idx]
        if y is not None:
            batch["label"] = y[idx]
        yield batch


def straightness(
    flow: FlowMatching,
    model_fn: Callable,
    eps: jax.Array,
    x1: jax.Array,
    num_probe: int = 8,
    cond: Optional[jax.Array] = None,
    y: Optional[jax.Array] = None,
    params=None,
) -> jax.Array:
    """Mean squared deviation of the field from the chord velocity.

    S = E_t ||v((1-t)·x1 + t·eps, t) − (eps − x1)||² over a uniform probe
    grid — exactly the quantity ReFlow minimizes (zero iff the flow moves
    every coupling along a straight line, i.e. 1-step Euler is exact).

    ``params``: as in :func:`generate_couplings` — thread the tree through
    jit instead of closing over it (remote-compile payload limit).
    """

    def run(p, eps, x1, cond, y):
        fn = (model_fn if p is None
              else (lambda x, t, c, yy: model_fn(p, x, t, c, yy)))
        epsf = eps.astype(jnp.float32)
        x1f = x1.astype(jnp.float32)
        chord = epsf - x1f
        ts = (jnp.arange(num_probe, dtype=jnp.float32) + 0.5) / num_probe

        def probe(carry, t):
            x_t = (1.0 - t) * x1f + t * epsf
            tt = jnp.full((x_t.shape[0],), t * flow.time_scale, jnp.float32)
            v = fn(x_t, tt, cond, y).astype(jnp.float32)
            return carry + jnp.mean((v - chord) ** 2), None

        total, _ = jax.lax.scan(probe, jnp.float32(0.0), ts)
        return total / num_probe

    if params is None:
        return run(None, eps, x1, cond, y)
    return jax.jit(run)(params, eps, x1, cond, y)


def endpoint_gap(
    flow: FlowMatching,
    model_fn: Callable,
    eps: jax.Array,
    few_steps: int = 1,
    ref_steps: int = 64,
    cond: Optional[jax.Array] = None,
    y: Optional[jax.Array] = None,
    dtype=jnp.float32,
    params=None,
) -> jax.Array:
    """RMS distance between the few-step Euler endpoint and the same
    model's high-resolution reference trajectory from identical noise —
    the few-step integration error the distillation is meant to remove.

    ``params``: as in :func:`generate_couplings` (threaded-tree jit)."""

    def run(p, eps, cond, y):
        fn = (model_fn if p is None
              else (lambda x, t, c, yy: model_fn(p, x, t, c, yy)))
        n = eps.shape[0]
        few = flow.sample(fn, jax.random.PRNGKey(0), n, num_steps=few_steps,
                          method="euler", x_T=eps, cond=cond, y=y,
                          dtype=dtype).x
        ref = flow.sample(fn, jax.random.PRNGKey(0), n, num_steps=ref_steps,
                          method="heun", x_T=eps, cond=cond, y=y,
                          dtype=dtype).x
        return jnp.sqrt(jnp.mean((few - ref) ** 2))

    if params is None:
        return run(None, eps, cond, y)
    return jax.jit(run)(params, eps, cond, y)
