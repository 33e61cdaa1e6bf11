"""Post-hoc EMA: power-function EMA tracks + after-the-fact synthesis of
any EMA length (Karras et al., "Analyzing and Improving the Training
Dynamics of Diffusion Models", arXiv:2312.02696 §3.3 + App. C).

Beyond-reference training utility. The reference (like the classic
recipes it vendors) bakes ONE EMA decay into the run
(``script_utils/utils.py:56-67``, train.py:70-73); if the choice turns out
wrong — and the paper shows sample quality is very sensitive to it — the
run must be repeated. Here the trainer maintains two *power-function* EMA
tracks

    beta(t) = (1 - 1/t) ** (gamma + 1)

whose averaging profile over history is ``p(tau) ∝ tau^gamma`` — a
self-similar profile whose snapshots at different times span, to high
accuracy, the space of ALL power-EMA profiles. Saving the two tracks at
every checkpoint lets a user *post-hoc* least-squares-synthesize the
parameters of any target EMA length (sigma_rel) from the stored
snapshots, after training, for the cost of a weighted sum.

All closed forms below are the paper's App. C ones, re-derived for the
normalized profile ``p_i(tau) = (g_i + 1) tau^{g_i} / t_i^{g_i + 1}`` on
``[0, t_i]``:

* ``<p_i, p_j> = (g_i+1)(g_j+1) min(t_i,t_j)^{g_i+g_j+1}
                 / ((g_i+g_j+1) t_i^{g_i+1} t_j^{g_j+1})``
* ``sigma_rel(gamma) = sqrt((gamma+1) / ((gamma+2)^2 (gamma+3)))``

TPU notes: the track update is a pure ``tree_map`` meant to be jitted and
chained after the train step (params stay in HBM; one extra f32 copy per
track). Snapshots are plain ``.npz`` files of the flattened tree — small,
portable, and independent of the Orbax TrainState layout, so synthesis
needs no optimizer-state template.
"""

from __future__ import annotations

import dataclasses
import os
import re
from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "PowerEMA", "sigma_rel_to_gamma", "gamma_to_sigma_rel",
    "solve_weights", "synthesize", "load_snapshots", "DEFAULT_GAMMAS",
]

# the paper's std pair: sigma_rel 0.05 and 0.10 (arXiv:2312.02696 App. C)
DEFAULT_GAMMAS = (16.970562, 6.944101)

_SNAP_RE = re.compile(r"phema_(\d{8})_g([0-9.]+)\.npz$")


def gamma_to_sigma_rel(gamma: float) -> float:
    g = float(gamma)
    return float(np.sqrt((g + 1.0) / ((g + 2.0) ** 2 * (g + 3.0))))


def sigma_rel_to_gamma(sigma_rel: float) -> float:
    """Invert sigma_rel(gamma): real root of the cubic
    ``g^3 + 7g^2 + (16 - 1/sr^2) g + (12 - 1/sr^2) = 0`` (> -1)."""
    sr = float(sigma_rel)
    assert 0.0 < sr <= 0.28, (
        f"sigma_rel {sr} outside the valid profile range (max ~0.2886)")
    c = sr ** -2
    roots = np.roots([1.0, 7.0, 16.0 - c, 12.0 - c])
    real = roots[np.abs(roots.imag) < 1e-8].real
    real = real[real > -1.0]
    assert len(real), (sigma_rel, roots)
    return float(real.max())


def _profile_dot(g_a: float, t_a: float, g_b: float, t_b: float) -> float:
    t_min = min(t_a, t_b)
    if t_min <= 0:
        return 0.0
    # ratios first: t_min^{ga+gb+1} / (t_a^{ga+1} t_b^{gb+1}) overflows f64
    # for t ~ 1e5 and gamma ~ 17 if formed literally
    log = ((g_a + g_b + 1.0) * np.log(t_min)
           - (g_a + 1.0) * np.log(t_a) - (g_b + 1.0) * np.log(t_b))
    return float((g_a + 1.0) * (g_b + 1.0) / (g_a + g_b + 1.0) * np.exp(log))


def solve_weights(snaps: Sequence[Tuple[float, float]], gamma_target: float,
                  t_target: float) -> np.ndarray:
    """Least-squares weights reconstructing the target profile
    ``(gamma_target, t_target)`` from snapshot profiles ``snaps`` =
    [(t_i, gamma_i), ...] (paper App. C: solve A w = b with the closed-form
    profile inner products)."""
    n = len(snaps)
    assert n, "no snapshots"
    a = np.empty((n, n))
    b = np.empty((n,))
    for i, (t_i, g_i) in enumerate(snaps):
        b[i] = _profile_dot(g_i, t_i, gamma_target, t_target)
        for j, (t_j, g_j) in enumerate(snaps):
            a[i, j] = _profile_dot(g_i, t_i, g_j, t_j)
    # tiny ridge: snapshots of one track at close times are near-collinear
    return np.linalg.solve(a + 1e-10 * np.eye(n), b)


def synthesize(trees: Sequence[Any], weights: np.ndarray) -> Any:
    """Weighted sum of parameter pytrees (f32 accumulation)."""
    assert len(trees) == len(weights) and len(trees)

    def comb(*leaves):
        acc = sum(float(w) * l.astype(jnp.float32)
                  for w, l in zip(weights, leaves))
        return acc.astype(leaves[0].dtype)

    return jax.tree.map(comb, *trees)


@dataclasses.dataclass(frozen=True)
class PowerEMA:
    """K power-function EMA tracks over a params pytree."""

    gammas: Tuple[float, ...] = DEFAULT_GAMMAS

    def init(self, params: Any) -> List[Any]:
        # jnp.array(copy=True), not astype: astype on an already-f32 leaf
        # is a no-copy alias, and the Trainer's donated train step would
        # delete the aliased buffers after the first step
        return [jax.tree.map(lambda p: jnp.array(p, jnp.float32, copy=True),
                             params)
                for _ in self.gammas]

    def update(self, tracks: List[Any], params: Any, step: jax.Array
               ) -> List[Any]:
        """One power-EMA step; ``step`` is 0-based (t = step + 1). Pure and
        jittable — chain it right after the train step so the tracks never
        leave the device."""
        t = jnp.maximum(jnp.asarray(step, jnp.float32) + 1.0, 1.0)
        out = []
        for g, tr in zip(self.gammas, tracks):
            beta = (1.0 - 1.0 / t) ** (g + 1.0)
            out.append(jax.tree.map(
                lambda e, p: beta * e + (1.0 - beta) * p.astype(jnp.float32),
                tr, params))
        return out

    # ---- snapshot IO (npz of the flattened tree) ----

    def save_snapshots(self, dirpath: str, tracks: List[Any], step: int
                       ) -> List[str]:
        os.makedirs(dirpath, exist_ok=True)
        paths = []
        for g, tr in zip(self.gammas, tracks):
            flat, _ = jax.tree_util.tree_flatten_with_path(tr)
            arrs = {jax.tree_util.keystr(k): np.asarray(v) for k, v in flat}
            p = os.path.join(dirpath, f"phema_{step:08d}_g{g:.6f}.npz")
            np.savez(p, **arrs)
            paths.append(p)
        return paths

    def restore_latest(self, dirpath: str, params_template: Any
                       ) -> Tuple[List[Any], int]:
        """Resume support: rebuild the tracks from the newest snapshot per
        gamma (falls back to ``init`` when none exist). Returns
        ``(tracks, latest_step)``."""
        found = {}
        for p, step, g in _list_snaps(dirpath):
            if g in [round(x, 6) for x in self.gammas]:
                if g not in found or step > found[g][1]:
                    found[g] = (p, step)
        if len(found) < len(self.gammas):
            return self.init(params_template), -1
        tracks = [_load_tree(found[round(g, 6)][0], params_template)
                  for g in self.gammas]
        return tracks, min(s for _, s in found.values())


def _list_snaps(dirpath: str):
    if not os.path.isdir(dirpath):
        return
    for f in sorted(os.listdir(dirpath)):
        m = _SNAP_RE.match(f)
        if m:
            yield (os.path.join(dirpath, f), int(m.group(1)),
                   round(float(m.group(2)), 6))


def _load_tree(path: str, template: Any) -> Any:
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for k, v in flat:
        key = jax.tree_util.keystr(k)
        assert key in data.files, f"snapshot {path} missing leaf {key}"
        arr = data[key]
        assert arr.shape == v.shape, (key, arr.shape, v.shape)
        leaves.append(jnp.asarray(arr))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_snapshots(dirpath: str, template: Any
                   ) -> Tuple[List[Any], List[Tuple[float, float]]]:
    """Load every snapshot in ``dirpath``: returns ``(trees, [(t, gamma)])``
    with t = step + 1 (profile end-time of the stored track)."""
    trees, meta = [], []
    for p, step, g in _list_snaps(dirpath):
        trees.append(_load_tree(p, template))
        meta.append((float(step + 1), g))
    assert trees, f"no phema_*.npz snapshots under {dirpath}"
    return trees, meta


def synthesize_from_dir(dirpath: str, template: Any, sigma_rel: float,
                        t_target: float = None) -> Any:
    """One-call post-hoc synthesis: load all snapshots under ``dirpath``
    and reconstruct the EMA profile of the requested ``sigma_rel`` at
    ``t_target`` (default: the newest snapshot time)."""
    trees, meta = load_snapshots(dirpath, template)
    tt = max(t for t, _ in meta) if t_target is None else float(t_target)
    w = solve_weights(meta, sigma_rel_to_gamma(sigma_rel), tt)
    return synthesize(trees, w)
