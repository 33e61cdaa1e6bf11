"""Muon: momentum + Newton-Schulz orthogonalization for matrix params.

Jordan et al. 2024 ("Muon: An optimizer for the hidden layers of neural
networks") as scaled up in Liu et al., arXiv:2502.16982: SGD-momentum whose
2-D updates are replaced by their nearest (semi-)orthogonal matrix,
computed with a quintic Newton-Schulz iteration — five matmuls per matrix
per step, which on TPU rides the MXU at full tilt (this is the rare
optimizer whose bookkeeping is itself matmul-shaped). Orthogonalizing
equalizes the update's singular values, so rare-but-informative gradient
directions act with the same step size as dominant ones.

No reference counterpart (the reference trains AdamW only, train.py:75).
Integration here is an optax-native ``multi_transform``:

* matrix-shaped kernels (Dense [in,out]; conv HWIO reshaped to
  [h*w*in, out]) take the Muon branch;
* everything else — biases, norm scales, embedding TABLES (per the Muon
  authors: embeddings/heads want Adam), and scalars — takes AdamW.

The learning-rate schedule is shared; ``muon_lr_mult`` scales the Muon
branch relative to it (orthogonalized updates have RMS ~ 1/sqrt(fan),
a different natural scale than Adam's ~1).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

__all__ = ["newton_schulz5", "scale_by_muon", "muon_with_adamw",
           "muon_label_fn"]

# quintic iteration coefficients from the official Muon implementation
# (tuned to maximize convergence slope at zero; the iteration converges to
# singular values in ~[0.7, 1.2] rather than exactly 1 — by design, the
# slack buys per-step progress and "orthogonal-ish" is all the optimizer
# needs)
_NS_COEFFS = (3.4445, -4.7750, 2.0315)


def newton_schulz5(g: jax.Array, steps: int = 5,
                   eps: float = 1e-7) -> jax.Array:
    """Approximate semi-orthogonalization of a 2-D matrix: G -> UV^T.

    Five fixed-point iterations of X <- aX + (bA + cA^2)X with A = XX^T,
    after Frobenius normalization (brings the spectral norm under the
    iteration's convergence radius). Tall matrices are transposed so the
    Gram matrix is the small square one.
    """
    assert g.ndim == 2, g.shape
    a, b, c = _NS_COEFFS
    x = g / (jnp.linalg.norm(g) + eps)
    transpose = x.shape[0] > x.shape[1]
    if transpose:
        x = x.T

    def body(_, x):
        gram = x @ x.T
        return a * x + (b * gram + c * gram @ gram) @ x

    x = jax.lax.fori_loop(0, steps, body, x)
    return x.T if transpose else x


def _orthogonalized_update(g: jax.Array, ns_steps: int) -> jax.Array:
    """NS-orthogonalize one leaf, reshaping conv kernels to a matrix.

    HWIO conv kernels flatten to [h*w*in, out] (the matrix the conv
    actually multiplies by, im2col view). The official RMS-matching scale
    ``sqrt(max(1, rows/cols))`` keeps update magnitude consistent between
    wide and tall matrices.
    """
    shape = g.shape
    m = g.reshape(-1, shape[-1]) if g.ndim > 2 else g
    o = newton_schulz5(m.astype(jnp.float32), ns_steps)
    o = o * jnp.sqrt(jnp.maximum(1.0, m.shape[0] / m.shape[1]))
    return o.reshape(shape).astype(g.dtype)


class MuonState(NamedTuple):
    momentum: Any


def scale_by_muon(momentum: float = 0.95, nesterov: bool = True,
                  ns_steps: int = 5) -> optax.GradientTransformation:
    """The Muon core: momentum buffer -> NS orthogonalization per leaf."""

    def init(params):
        return MuonState(momentum=jax.tree.map(jnp.zeros_like, params))

    def update(updates, state, params=None):
        del params
        buf = jax.tree.map(lambda m, g: momentum * m + g,
                           state.momentum, updates)
        eff = (jax.tree.map(lambda m, g: g + momentum * m, buf, updates)
               if nesterov else buf)
        out = jax.tree.map(lambda g: _orthogonalized_update(g, ns_steps), eff)
        return out, MuonState(momentum=buf)

    return optax.GradientTransformation(init, update)


def muon_label_fn(params) -> Any:
    """Route leaves: matrix kernels -> "muon", the rest -> "adamw".

    Embedding tables are 2-D but want Adam (Muon authors' guidance —
    their rows update sparsely; orthogonalization couples them): any path
    containing an embedding-table segment routes to adamw. Norm
    scales/biases and time-MLP biases are sub-2-D and fall through
    naturally.
    """

    def label(path, leaf):
        p = jax.tree_util.keystr(path).lower()
        if "embedding" in p or "label_emb" in p:
            return "adamw"
        return "muon" if getattr(leaf, "ndim", 0) >= 2 else "adamw"

    return jax.tree_util.tree_map_with_path(label, params)


def muon_with_adamw(learning_rate, muon_lr_mult: float = 1.0,
                    momentum: float = 0.95, nesterov: bool = True,
                    ns_steps: int = 5, adam_b1: float = 0.9,
                    adam_b2: float = 0.999,
                    weight_decay: float = 1e-4) -> optax.GradientTransformation:
    """Muon on matrix kernels + AdamW on everything else (one schedule).

    ``learning_rate`` may be a float or an optax schedule; the Muon branch
    applies ``muon_lr_mult`` on top of it.
    """
    mlr = ((lambda step: learning_rate(step) * muon_lr_mult)
           if callable(learning_rate) else learning_rate * muon_lr_mult)
    muon_tx = optax.chain(
        scale_by_muon(momentum=momentum, nesterov=nesterov, ns_steps=ns_steps),
        optax.scale_by_learning_rate(mlr),
    )
    adam_tx = optax.adamw(learning_rate, b1=adam_b1, b2=adam_b2,
                          weight_decay=weight_decay)
    return optax.multi_transform(
        {"muon": muon_tx, "adamw": adam_tx}, muon_label_fn)
