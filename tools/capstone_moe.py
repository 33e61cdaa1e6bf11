"""MoE capstone: measure the Mixture-of-Experts DiT or close it (VERDICT r4
next-round item 3 — "the one shipped subsystem with zero measured
evidence").

Protocol (PERF.md refutation discipline — a measured negative is an
acceptable outcome):

  * Dense DiT-S/4 at 64px (hidden 384, depth 12, 256 tokens) vs the SAME
    architecture with every 2nd block's FFN replaced by an 8-expert
    top-1 (Switch-style) MoE — top-1 keeps the ACTIVE per-token FLOPs
    matched to the dense MLP (mlp_hidden identical; only the f32 router
    matmul is extra), while total FFN capacity in MoE blocks is 8x.
  * Both train rectified flow, unconditional, on SyntheticEOHard-64 (the
    discriminative r4 eval regime) with the SAME wall-clock budget — the
    production question is "does sparse capacity buy quality per second",
    so the budget is time, not steps; achieved steps + ms/step are
    recorded. moe_aux_weight 0.01 (Switch eq. 4), aux trace logged.
  * Eval: KID under the trained offline extractor
    (gallery/eval_extractor64.npz, tools/capstone_evalregime.py) at
    heun-8 on 256 samples + sampling img/s.

Artifacts: gallery/moe64_metrics.json + sample grids. Expert parallelism
itself is validated by the MULTICHIP dryrun stage (EP specs shard the
leading E dim); this capstone supplies the missing quality/throughput
evidence on one chip.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python tools/capstone_moe.py \
           [--stage all|train|eval] [--smoke] [--force] [--budget_s N]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GALLERY = os.path.join(ROOT, "gallery")
CKPT = os.path.join(ROOT, "logs", "capstone_moe")
EXTRACTOR_NPZ = os.path.join(GALLERY, "eval_extractor64.npz")

STAGES = ("train", "eval")
VARIANTS = ("dense", "moe")


class Ctx:
    def __init__(self, smoke: bool, budget_s: float):
        self.smoke = smoke
        if smoke:
            self.size, self.n_data = 16, 64
            self.hidden, self.depth, self.heads, self.patch = 32, 2, 4, 4
            self.budget_s, self.batch = 5.0, 16
            self.n_eval, self.bs = 32, 16
        else:
            self.size, self.n_data = 64, 4096
            self.hidden, self.depth, self.heads, self.patch = 384, 12, 6, 4
            self.budget_s, self.batch = budget_s, 64
            self.n_eval, self.bs = 256, 64
        self._imgs = None
        self._ext = None

    @property
    def data(self):
        if self._imgs is None:
            from eo_diffusion_tpu.data.datasets import SyntheticEOHard

            ds = SyntheticEOHard(size=self.size, length=self.n_data,
                                 data_range=(-1.0, 1.0), seed=0)
            self._imgs = np.stack([ds[i]["image"]
                                   for i in range(self.n_data)])
        return self._imgs

    def model(self, variant: str):
        from eo_diffusion_tpu.models.dit import DiT, DiTConfig

        kw = {}
        if variant == "moe":
            kw = dict(num_experts=8, moe_top_k=1, moe_every=2)
        cfg = DiTConfig(image_size=self.size, in_channels=3, out_channels=3,
                        patch_size=self.patch, hidden_size=self.hidden,
                        depth=self.depth, num_heads=self.heads,
                        dtype=jnp.bfloat16, **kw)
        return DiT(cfg)

    def flow(self):
        from eo_diffusion_tpu.diffusion.flow import FlowMatching

        return FlowMatching.create(image_size=self.size, in_channels=3)

    def extractor_feats(self, x):
        if self._ext is None:
            from eo_diffusion_tpu.models.feature_cnn import (FeatureCNNConfig,
                                                             load_params,
                                                             make_extractor)

            params, meta = load_params(EXTRACTOR_NPZ)
            fcfg = FeatureCNNConfig(
                in_channels=3,
                widths=tuple(int(w) for w in meta["widths"]),
                num_classes=int(meta["num_classes"]))
            self._ext = make_extractor(params, fcfg)
        return np.asarray(self._ext(jnp.asarray(np.clip(x, -1.0, 1.0))))

    def kid_vs(self, x, real_feats):
        from eo_diffusion_tpu.utils import metrics as M

        k, ks = M.kid(real_feats, self.extractor_feats(x),
                      subset_size=min(100, len(real_feats)))
        return float(k), float(ks)


def _apply_fn(model):
    def apply_fn(params, x, t, cond=None, y=None, train=False,
                 dropout_rng=None, with_aux=False):
        if not with_aux:
            return model.apply(params, x, t, cond=cond, y=y)
        out, variables = model.apply(params, x, t, cond=cond, y=y,
                                     mutable=["intermediates"])
        leaves = [
            l for path, l in jax.tree_util.tree_leaves_with_path(
                variables.get("intermediates", {}))
            if any(getattr(k, "key", "") == "moe_aux" for k in path)
        ]
        aux = (sum(jnp.mean(l) for l in leaves) / len(leaves)
               if leaves else jnp.float32(0.0))
        return out, aux

    return apply_fn


def stage_train(ctx, results):
    import optax

    from eo_diffusion_tpu.train.checkpoint import save_checkpoint
    from eo_diffusion_tpu.train.trainer import TrainState, make_train_step

    imgs = jnp.asarray(ctx.data)
    flow = ctx.flow()
    out = results.setdefault("train", {})
    for variant in VARIANTS:
        if variant in out:
            print(f"train[{variant}]: already recorded, skipping")
            continue
        model = ctx.model(variant)
        params = jax.jit(model.init)(
            jax.random.PRNGKey(0),
            jnp.zeros((1, ctx.size, ctx.size, 3)),
            jnp.zeros((1,), jnp.int32))
        n_params = sum(p.size for p in jax.tree.leaves(params))
        # generous step ceiling; the wall-clock budget is the stop rule
        max_steps = 400 if ctx.smoke else 60000
        warmup = min(500, max_steps // 4)
        sched = optax.warmup_cosine_decay_schedule(0.0, 1e-3, warmup,
                                                   max_steps, 1e-5)
        tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(sched))
        state = TrainState.create(params, tx)
        step_fn = make_train_step(
            flow, _apply_fn(model), tx, ema_decay=0.999, ema_every=10,
            moe_aux_weight=0.01 if variant == "moe" else 0.0)

        @functools.partial(jax.jit, donate_argnums=(0,))
        def jstep(state, data, idx, rng, step_fn=step_fn):
            return step_fn(state, {"image": data[idx]}, rng)

        # the step metrics carry loss/grad_norm only; the load-balance aux
        # trace comes from a fixed probe batch at t=0.5 (routing balance is
        # a property of the router, not of the step)
        afn = _apply_fn(model)

        @jax.jit
        def aux_probe(p, x):
            t = jnp.full((x.shape[0],), 0.5 * flow.time_scale, jnp.float32)
            _, aux = afn(p, x, t, with_aux=True)
            return aux

        probe = imgs[:ctx.batch]

        rng = jax.random.PRNGKey(1)
        rnp = np.random.default_rng(2)
        # compile probe step (excluded from the budget)
        idx = jnp.asarray(rnp.integers(0, ctx.n_data, ctx.batch))
        rng, srng = jax.random.split(rng)
        state, m = jstep(state, imgs, idx, srng)
        _ = float(m["loss"])
        aux_trace, loss_trace = [], []
        t0, i = time.time(), 0
        while time.time() - t0 < ctx.budget_s and i < max_steps:
            rng, srng = jax.random.split(rng)
            idx = jnp.asarray(rnp.integers(0, ctx.n_data, ctx.batch))
            state, m = jstep(state, imgs, idx, srng)
            i += 1
            if i % 200 == 0 or (ctx.smoke and i % 20 == 0):
                loss_trace.append(float(m["loss"]))
                if variant == "moe":
                    aux_trace.append(float(aux_probe(state.params, probe)))
                print(f"[{variant}] step {i} loss={loss_trace[-1]:.4f}"
                      + (f" aux={aux_trace[-1]:.3f}" if aux_trace else ""),
                      flush=True)
        wall = time.time() - t0
        save_checkpoint(CKPT, jax.device_get(state), name=variant)
        out[variant] = {
            "params_m": n_params / 1e6, "steps": i, "wall_s": wall,
            "ms_per_step": wall / max(i, 1) * 1e3,
            "loss_trace": loss_trace, "aux_trace": aux_trace,
            "loss_final": float(m["loss"])}
        print(f"[{variant}] {n_params/1e6:.1f}M params, {i} steps in "
              f"{wall:.0f}s ({wall/max(i,1)*1e3:.1f} ms/step)", flush=True)
        yield_metrics(results)


def yield_metrics(results):
    os.makedirs(GALLERY, exist_ok=True)
    with open(METRICS, "w") as f:
        json.dump(results, f, indent=2)


def stage_eval(ctx, results):
    from eo_diffusion_tpu.train.checkpoint import restore_params
    from eo_diffusion_tpu.utils.images import save_image_grid

    imgs = ctx.data
    half = ctx.n_data // 2
    real = ctx.extractor_feats(imgs[:half])
    flow = ctx.flow()
    out = results.setdefault("eval", {})
    for variant in VARIANTS:
        if variant in out:
            continue
        model = ctx.model(variant)
        template = jax.jit(model.init)(
            jax.random.PRNGKey(0), jnp.zeros((1, ctx.size, ctx.size, 3)),
            jnp.zeros((1,), jnp.int32))
        _, ema = restore_params(os.path.join(CKPT, variant), template)
        ema = jax.tree.map(jnp.asarray, ema)

        def run(p, r):
            return flow.sample(
                lambda x, t, c, y: model.apply(p, x, t, cond=c, y=y), r,
                ctx.bs, num_steps=8, method="heun",
                dtype=jnp.bfloat16).x.astype(jnp.float32)

        j = jax.jit(run)
        xs, t_draw = [], 0.0
        for i in range(max(ctx.n_eval // ctx.bs, 1)):
            t1 = time.time()
            x = j(ema, jax.random.PRNGKey(500 + i))
            _ = float(jnp.sum(x))
            if i > 0:
                t_draw += time.time() - t1
            xs.append(np.asarray(x))
        x = np.concatenate(xs)
        k, ks = ctx.kid_vs(x, real)
        nb = max(ctx.n_eval // ctx.bs - 1, 1)
        out[variant] = {"kid": k, "kid_std": ks,
                        "img_s": nb * ctx.bs / t_draw if t_draw else None}
        print(f"eval [{variant}] kid={k:.4g} "
              f"{out[variant]['img_s'] or 0:.1f} img/s", flush=True)
        sfx = "_smoke" if ctx.smoke else ""
        save_image_grid(np.clip((x[:16] + 1) / 2, 0, 1),
                        os.path.join(GALLERY, f"moe64_{variant}{sfx}.png"),
                        nrow=4)


METRICS = os.path.join(GALLERY, "moe64_metrics.json")


def main():
    global METRICS, CKPT, EXTRACTOR_NPZ
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="all", choices=STAGES + ("all",))
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--budget_s", type=float, default=420.0,
                    help="per-variant training wall-clock budget (s)")
    args = ap.parse_args()

    if args.smoke:
        METRICS = METRICS.replace(".json", "_smoke.json")
        CKPT = CKPT + "_smoke"

    ctx = Ctx(args.smoke, args.budget_s)
    if args.smoke:
        # the 64px extractor doesn't apply at 16px; random-projection
        # features are fine for the smoke plumbing check
        from eo_diffusion_tpu.utils import metrics as M

        ext = M.tiny_feature_extractor()
        ctx.extractor_feats = lambda x: np.asarray(
            ext(jnp.asarray(np.clip(x, -1.0, 1.0))))

    results = {}
    if os.path.exists(METRICS):
        with open(METRICS) as f:
            results = json.load(f)
    if args.force:
        results = {}
    for s in (STAGES if args.stage == "all" else (args.stage,)):
        print(f"=== stage {s} ===", flush=True)
        if s == "train":
            stage_train(ctx, results)
        else:
            stage_eval(ctx, results)
        yield_metrics(results)
    print(f"wrote {METRICS}")


if __name__ == "__main__":
    main()
