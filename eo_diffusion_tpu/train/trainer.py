"""Training loop: jitted train step, EMA, checkpointing, periodic sampling.

Re-design of the reference's imperative trainer (``train.py:45-157``) as a
TPU-native SPMD program:

* one donated, jitted ``train_step`` containing loss, grad, AdamW update and
  the EMA tree-update (the reference's separate host-side EMA pass,
  train.py:122-123, folds into the same XLA program);
* batch sharded over the mesh 'data' axis; params/opt-state replicated (or
  FSDP-sharded via ``parallel.mesh.fsdp_param_specs``);
* Orbax checkpoints carry ``{params, ema_params, opt_state, step}`` -- a
  superset of the reference's ``{"model","model_ema"}`` (train.py:137-138),
  fixing its no-optimizer-resume gap (SURVEY.md §5);
* metrics stream through a small host callback-free path: loss/lr are
  fetched once per ``log_every`` steps only.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh

from jax.sharding import NamedSharding, PartitionSpec as P

from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
from eo_diffusion_tpu.parallel.mesh import (
    data_sharding,
    ep_param_specs,
    fsdp_param_specs,
    make_mesh,
    merge_specs,
    replicated,
    tp_param_specs,
)
from eo_diffusion_tpu.train.ema import adjusted_decay, ema_update_every, warmed_decay

__all__ = ["TrainState", "make_train_step", "Trainer", "TrainerConfig"]


class TrainState(struct.PyTreeNode):
    params: Any
    ema_params: Any
    opt_state: Any
    step: jax.Array

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation):
        return cls(
            params=params,
            # real copies, not aliases: the jitted step donates the state, and
            # XLA rejects the same buffer appearing twice in donated args
            ema_params=jax.tree.map(jnp.copy, params),
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )


def make_train_step(
    diffusion: GaussianDiffusion,
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    ema_decay: float,
    ema_every: int = 10,
    class_conditional: bool = False,
    use_cond: bool = False,
    class_dropout_prob: float = 0.0,
    num_classes: int = 0,
    ema_warmup: bool = True,
    moe_aux_weight: float = 0.0,
):
    """Build the pure train-step fn: (state, batch, rng) -> (state, metrics).

    ``batch`` is a dict with "image" [N,H,W,C] and optionally "cond" /
    "label" entries (mirrors the reference's dict batches, data.py docs).
    ``use_cond`` enables channel-concat conditioning during training (the
    reference's cond path, unet_openai.py:754-756). RePaint-"sum"
    conditioning is sampling-time only (model.py:52) and must NOT set this.
    """

    def loss_fn(params, batch, rng):
        cond = batch.get("cond") if use_cond else None
        y = batch.get("label") if class_conditional else None
        if y is not None and class_dropout_prob > 0.0:
            # CFG label dropout to the learned null class (index num_classes)
            rng, drop_rng = jax.random.split(rng)
            drop = jax.random.bernoulli(drop_rng, class_dropout_prob, y.shape)
            y = jnp.where(drop, num_classes, y)
        # per-step dropout key (a constant key here would freeze the dropout
        # mask for the whole run -- stochastic only in name)
        rng, dropout_rng = jax.random.split(rng)
        if moe_aux_weight > 0.0:
            # MoE load-balance loss: the model sows per-layer aux scalars
            # (models/moe.py); apply_fn(with_aux=True) returns their mean.
            # The list is local to this trace, so calls from inside
            # train_loss (incl. self-cond's double apply) all accumulate.
            auxes = []

            def model_fn(x, t, c, yy):
                out, aux = apply_fn(params, x, t, cond=c, y=yy, train=True,
                                    dropout_rng=dropout_rng, with_aux=True)
                auxes.append(aux)
                return out
        else:
            auxes = None
            model_fn = lambda x, t, c, yy: apply_fn(
                params, x, t, cond=c, y=yy, train=True,
                dropout_rng=dropout_rng
            )
        extra = {}
        if "noise" in batch:
            # paired-eps batch (ReFlow coupling distillation, diffusion/
            # distill.py): the endpoint noise rides the batch instead of
            # being drawn fresh inside the loss
            extra["noise"] = batch["noise"]
        loss = diffusion.train_loss(model_fn, rng, batch["image"], cond=cond,
                                    y=y, **extra)
        if auxes:
            loss = loss + moe_aux_weight * sum(auxes) / len(auxes)
        return loss

    def train_step(state: TrainState, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, rng)
        return apply_grads(state, loss, grads, tx, ema_decay, ema_every,
                           ema_warmup)

    return train_step


def apply_grads(state: TrainState, loss, grads,
                tx: optax.GradientTransformation, ema_decay: float,
                ema_every: int, ema_warmup: bool = True):
    """Optimizer + fused-EMA tail shared by the autodiff train step and the
    1F1B pipeline step (which produces its grads through
    parallel/pipeline_train.py instead of jax.value_and_grad)."""
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    # fused EMA update, gated on the step counter (no host round-trip);
    # decay warmup so early EMAs track instead of dragging init noise
    d = (warmed_decay(ema_decay, state.step // ema_every) if ema_warmup
         else jnp.float32(ema_decay))
    ema = ema_update_every(state.ema_params, params, d, state.step, ema_every)
    new_state = state.replace(
        params=params, ema_params=ema, opt_state=opt_state, step=state.step + 1
    )
    metrics = {"loss": loss, "grad_norm": optax.global_norm(grads)}
    if hasattr(opt_state, "notfinite_count"):
        # TrainerConfig.skip_nonfinite wrap: cumulative count of dropped
        # (non-finite) updates, surfaced for the training log
        metrics["notfinite_count"] = opt_state.notfinite_count
    return new_state, metrics


@dataclasses.dataclass
class TrainerConfig:
    """CLI-facing knobs; names mirror the reference flags (train.py:22-42)."""

    lr: float = 1e-3
    batch_size: int = 128
    epochs: int = 100
    timesteps: int = 1000
    model_ema_steps: int = 10
    model_ema_decay: float = 0.995
    log_freq: int = 10
    n_samples: int = 16
    no_clip: bool = False
    num_classes: int = 0
    cond_type: Optional[str] = None
    ckpt_dir: str = "logs/run"
    sample_dir: str = "results/run"
    sample_every: int = 1000
    warmup_epochs: int = 10
    seed: int = 0
    # micro-batch gradient accumulation (reference lucidrains trainer's
    # gradient_accumulate_every, denoising_diffusion_pytorch.py:757,795):
    # k micro-steps average into one optimizer update via optax.MultiSteps
    grad_accum: int = 1
    fsdp: bool = False
    # leaves smaller than this stay replicated under FSDP (sharding tiny
    # tensors costs more in collectives than it saves in HBM)
    fsdp_min_size: int = 2**16
    # Megatron-style tensor parallelism on the attention projections over
    # the mesh 'model' axis (parallel/mesh.tp_param_specs); composes with
    # fsdp (TP specs win where they apply, FSDP covers the rest)
    tp: bool = False
    # expert parallelism for MoE-DiT backbones (parallel/mesh.ep_param_specs):
    # shard every expert-batched FFN leaf over the mesh 'model' axis.
    # Composes with tp and fsdp (disjoint leaves; EP specs win where they
    # apply). No-op unless the model has MoE layers.
    ep: bool = False
    # sequence parallelism (ring attention, ops/attention.ring_attention):
    # route every self-attention through the ppermute ring over the mesh
    # 'model' axis at trace time — O(T/n) per-chip KV residency for token
    # counts past one chip's resident cap. Mutually exclusive with tp
    # (both own the 'model' axis for attention); attention whose T doesn't
    # divide the axis falls back to the regular dispatch per-layer.
    sp: bool = False
    # MoE load-balance aux-loss weight (Switch Transformer uses 0.01);
    # applied automatically when the model config has num_experts > 0
    moe_aux_weight: float = 0.01
    # optimizer family: "adamw" (reference parity, train.py:75) or "muon"
    # (train/muon.py — Newton-Schulz-orthogonalized momentum on matrix
    # kernels, AdamW on embeddings/biases/norms; the NS iteration is five
    # matmuls per kernel per step, i.e. MXU work, not bookkeeping).
    # muon_lr_mult scales the Muon branch relative to the shared schedule.
    optimizer: str = "adamw"
    muon_lr_mult: float = 1.0
    # skip-on-non-finite robustness (no reference counterpart; the
    # reference's NaN loss silently poisons the params and every later
    # checkpoint): when True, any update with a non-finite gradient leaf is
    # dropped ON DEVICE (params/opt-state untouched, optax.apply_if_finite)
    # and the step's metrics carry a cumulative ``notfinite_count``. After
    # 100 consecutive bad steps the optimizer stops masking and lets the
    # NaNs surface — a persistently diverged run should fail loudly.
    skip_nonfinite: bool = False
    # global-norm gradient clipping (0 = off, reference parity). Strongly
    # recommended for small micro-batches at high resolution: the 256px
    # concat capstone at micro-batch 8 collapsed (loss 0.016 -> 1.0) right
    # after lr warmup without it -- the gradient noise is 16x the reference
    # batch-128 regime.
    grad_clip: float = 0.0
    # periodic-preview sampler (Trainer.sample). The reference previews with
    # the full DDPM chain (train.py:148-149); at the 256px presets that is
    # ~7 min of chip time per preview -- "ddim"/"dpm" with ~50 steps gives
    # near-identical previews at 1/20th the cost.
    preview_sampler: str = "ddpm"  # "ddpm" | "ddim" | "dpm"
    preview_steps: int = 50  # used by ddim/dpm previews (ddpm runs full T)
    # 1F1B pipeline parallelism over the mesh 'model' axis (DiT backbones
    # only, parallel/pipeline_train.py): >0 runs the block torso's forward
    # AND backward under the one-forward-one-backward schedule with this
    # many microbatches. Composes with DP over 'data'; mutually exclusive
    # with tp/fsdp (nested shard_map / re-stacked gathered params are
    # unvalidated combinations).
    pp_micro: int = 0
    # interleaved virtual stages (Megatron-style): each device hosts this
    # many non-contiguous block chunks, paying pipeline fill/drain in chunk
    # units instead of whole device shares (pipeline_train.one_f_one_b).
    # 1 = classic 1F1B; >1 requires pp_micro % stages == 0.
    pp_virtual: int = 1


class Trainer:
    """End-to-end training orchestrator.

    Usage::

        trainer = Trainer(cfg, unet, diffusion, steps_per_epoch)
        state = trainer.init(rng)
        for batch in loader:
            state, metrics = trainer.step(state, batch)
    """

    def __init__(
        self,
        cfg: TrainerConfig,
        model,  # flax module with .apply / .init
        diffusion: GaussianDiffusion,
        steps_per_epoch: int,
        mesh: Optional[Mesh] = None,
    ):
        from eo_diffusion_tpu.train.lr_schedules import warmup_cos_exp

        self.cfg = cfg
        self.model = model
        self.diffusion = diffusion
        self.mesh = mesh if mesh is not None else make_mesh()

        self.grad_accum = max(cfg.grad_accum, 1)
        # the LR schedule advances once per *optimizer* step: with k-fold
        # accumulation the loader yields k micro-batches per update
        opt_steps_per_epoch = max(steps_per_epoch // self.grad_accum, 1)
        total_steps = max(opt_steps_per_epoch * cfg.epochs, 1)
        sched = warmup_cos_exp(
            cfg.lr, opt_steps_per_epoch, cfg.epochs,
            warmup_epochs=min(cfg.warmup_epochs, cfg.epochs),
        )
        self.lr_table = sched.table(total_steps)
        if cfg.optimizer == "muon":
            from eo_diffusion_tpu.train.muon import muon_with_adamw

            self.tx = muon_with_adamw(sched.as_optax(total_steps),
                                      muon_lr_mult=cfg.muon_lr_mult)
        else:
            assert cfg.optimizer == "adamw", cfg.optimizer
            self.tx = optax.adamw(sched.as_optax(total_steps))
        if cfg.grad_clip > 0.0:
            self.tx = optax.chain(
                optax.clip_by_global_norm(cfg.grad_clip), self.tx
            )
        if self.grad_accum > 1:
            self.tx = optax.MultiSteps(self.tx, every_k_schedule=self.grad_accum)
        if cfg.skip_nonfinite:
            # outermost wrap: the finiteness check sees the RAW incoming
            # grads, so a NaN micro-batch is rejected before clip/accum
            # state can absorb it
            self.tx = optax.apply_if_finite(self.tx,
                                            max_consecutive_errors=100)

        self.ema_decay = adjusted_decay(
            cfg.model_ema_decay, cfg.batch_size, cfg.model_ema_steps, cfg.epochs
        )

        def apply_fn(params, x, t, cond=None, y=None, train=False,
                     dropout_rng=None, with_aux=False):
            rngs = None if dropout_rng is None else {"dropout": dropout_rng}
            if not with_aux:
                return self.model.apply(params, x, t, cond=cond, y=y,
                                        train=train, rngs=rngs)
            # with_aux: collect the sown MoE load-balance scalars
            out, variables = self.model.apply(
                params, x, t, cond=cond, y=y, train=train, rngs=rngs,
                mutable=["intermediates"])
            leaves = [
                l for path, l in jax.tree_util.tree_leaves_with_path(
                    variables.get("intermediates", {}))
                if any(getattr(k, "key", "") == "moe_aux" for k in path)
            ]
            aux = (sum(jnp.mean(l) for l in leaves) / len(leaves)
                   if leaves else jnp.float32(0.0))
            return out, aux

        model_cfg = (getattr(model, "config", None)
                     or getattr(model, "cfg", None))
        num_experts = getattr(model_cfg, "num_experts", 0) or 0
        step_fn = make_train_step(
            diffusion,
            apply_fn,
            self.tx,
            ema_decay=self.ema_decay,
            # state.step counts micro-steps; keep the EMA cadence in
            # optimizer steps like the reference (train.py:122)
            ema_every=cfg.model_ema_steps * self.grad_accum,
            class_conditional=cfg.num_classes > 0,
            use_cond=cfg.cond_type == "concat",
            # the module config attribute is .config (UNet) or .cfg (DiT);
            # the train step is the single owner of CFG label dropout —
            # EXCEPT for CFG-integrated MeanFlow (cfg_omega != 1), whose
            # loss owns dropout internally (it must know which samples
            # dropped to switch their target to the plain identity)
            class_dropout_prob=(
                0.0 if getattr(self.diffusion, "cfg_omega", 1.0) != 1.0
                else getattr(model_cfg, "class_dropout_prob", 0.0)),
            num_classes=cfg.num_classes,
            moe_aux_weight=cfg.moe_aux_weight if num_experts else 0.0,
        )

        if cfg.pp_micro > 0:
            step_fn = self._make_pp_step()
        self._step_fn = step_fn
        # TP: route the Pallas attention kernel through a head-sharded
        # shard_map at trace time (ops/attention.head_sharded_attention) --
        # GSPMD cannot partition the Mosaic custom call and would otherwise
        # all-gather the full attention activation around it
        assert not (cfg.tp and cfg.sp), (
            "tp (head-sharded attention) and sp (ring attention) both "
            "partition attention over the 'model' axis; pick one")
        if cfg.tp:
            from eo_diffusion_tpu.ops.attention import head_sharded_attention

            self._attn_ctx = lambda: head_sharded_attention(self.mesh, "model")
        elif cfg.sp:
            from eo_diffusion_tpu.ops.attention import (
                sequence_sharded_attention,
            )

            assert ("model" in self.mesh.shape
                    and self.mesh.shape["model"] > 1), (
                "TrainerConfig.sp=True needs a mesh with a model axis > 1 "
                "to serve as the sequence ring (pass mesh=make_mesh(model=N))")
            self._attn_ctx = lambda: sequence_sharded_attention(
                self.mesh, "model")
        else:
            import contextlib

            self._attn_ctx = contextlib.nullcontext
        self._batch_sharding = data_sharding(self.mesh)
        # the jitted step is built once state shapes are known (shard_state):
        # FSDP PartitionSpecs depend on the actual parameter shapes
        self._train_step = None
        self._state_shardings = None
        self._rng = jax.random.PRNGKey(cfg.seed)
        self._samplers = {}

    def _make_pp_step(self):
        """Train step with the DiT torso's fwd+bwd under the 1F1B pipeline
        schedule (cfg.pp_micro microbatches over the mesh 'model' axis,
        parallel/pipeline_train.py) — same optimizer/EMA tail as the
        autodiff step. The loss decomposition rides
        ``diffusion.training_tuple`` + ``training_weight`` (any objective,
        p2/min-SNR/VLB reweighting included; only self-conditioning still
        asserts — its second model pass is structural)."""
        from eo_diffusion_tpu.models.dit import DiT
        from eo_diffusion_tpu.parallel.pipeline_train import pp_dit_grads

        cfg = self.cfg
        assert isinstance(self.model, DiT), (
            "pp_micro>0 pipelines the DiT block torso; the convolutional "
            "UNet has no homogeneous stage stack (see parallel/pipeline.py "
            "scope note)")
        assert "model" in self.mesh.shape and self.mesh.shape["model"] > 1, (
            "pp_micro>0 needs a mesh with a model axis > 1 to serve as the "
            "stage axis (pass mesh=make_mesh(model=S))")
        assert not (cfg.tp or cfg.fsdp or cfg.ep), (
            "pp_micro composes with DP only: tp nests shard_maps, fsdp "
            "re-stacks gathered block params inside the pipeline, and ep "
            "shards MoE experts the stage scan doesn't thread — all "
            "unvalidated; shard data over 'data' instead")
        assert not getattr(
            getattr(self.model, "cfg", None), "num_experts", 0), (
            "pp_micro with MoE blocks is not wired: the pipeline's stage "
            "scan does not thread the sown moe_aux intermediates")
        assert not hasattr(self.diffusion, "encode"), (
            "pp_micro with LatentDiffusion is not wired (training_tuple "
            "would need the first-stage encode); train the inner process")
        diffusion, model, mesh = self.diffusion, self.model, self.mesh
        class_conditional = cfg.num_classes > 0
        use_cond = cfg.cond_type == "concat"
        dropout_prob = getattr(
            getattr(model, "config", None) or getattr(model, "cfg", None),
            "class_dropout_prob", 0.0)
        tx, ema_decay = self.tx, self.ema_decay
        ema_every = cfg.model_ema_steps * self.grad_accum

        def pp_step(state: TrainState, batch, rng):
            cond = batch.get("cond") if use_cond else None
            y = batch.get("label") if class_conditional else None
            if y is not None and dropout_prob > 0.0:
                rng, drop_rng = jax.random.split(rng)
                drop = jax.random.bernoulli(drop_rng, dropout_prob, y.shape)
                y = jnp.where(drop, cfg.num_classes, y)
            rng, t_rng = jax.random.split(rng)
            x_t, t_model, target = diffusion.training_tuple(
                t_rng, batch["image"], batch.get("noise"))
            # p2/min-SNR/VLB ride as one per-sample weight (the flow
            # process has no reweighting and no training_weight attr)
            w_fn = getattr(diffusion, "training_weight", None)
            weight = w_fn(t_model) if w_fn is not None else None
            loss, grads = pp_dit_grads(
                model, state.params, x_t, t_model, target, mesh,
                y=y, cond=cond, axis="model", n_micro=cfg.pp_micro,
                data_axis="data", virtual_chunks=cfg.pp_virtual,
                weight=weight)
            return apply_grads(state, loss, grads, tx, ema_decay, ema_every)

        return pp_step

    # -- lifecycle -----------------------------------------------------------

    def init(self, rng: jax.Array, sample_batch: dict) -> TrainState:
        x = jnp.asarray(sample_batch["image"][:1])
        latent = hasattr(self.diffusion, "encode")  # LatentDiffusion duck-type
        if latent:
            # the UNet lives in latent space: init with encoded shapes
            x = self.diffusion.encode(x)
        from eo_diffusion_tpu.models import time_template

        t = time_template(self.model)  # [1] or [1,2] for dual-time backbones
        kwargs = {}
        if self.cfg.cond_type == "concat" and "cond" in sample_batch:
            c = jnp.asarray(sample_batch["cond"][:1])
            if latent and getattr(self.diffusion, "cond_via_encoder", False):
                c = self.diffusion.encode(c)
            kwargs["cond"] = c
        if self.cfg.num_classes > 0:
            kwargs["y"] = jnp.zeros((1,), jnp.int32)
        params = self.model.init(rng, x, t, **kwargs)
        state = TrainState.create(params, self.tx)
        return self.shard_state(state)

    def shard_state(self, state: TrainState) -> TrainState:
        """Lay the state out on the mesh and (first call) build the jitted step.

        With ``cfg.fsdp`` every large leaf (params, EMA, Adam moments) is
        sharded ZeRO-style along its largest divisible dim over the 'data'
        axis; XLA inserts the all-gathers at use and reduce-scatters the
        gradients. ``cfg.tp`` additionally (or alone) shards the attention
        projections Megatron-style over the 'model' axis -- TP specs win on
        the leaves they cover. Otherwise the state replicates (fastest at
        the reference model scale, <100M params).
        """
        specs = None
        if self.cfg.fsdp:
            specs = fsdp_param_specs(
                state, self.mesh, min_size=self.cfg.fsdp_min_size, axis="data"
            )
        if self.cfg.tp:
            # check axis presence first: a user mesh without a 'model' axis
            # would otherwise raise a bare KeyError before this message
            assert "model" in self.mesh.shape and self.mesh.shape["model"] > 1, (
                "TrainerConfig.tp=True needs a mesh with a model axis > 1 "
                "(pass mesh=make_mesh(model=N)); with model=1 TP would "
                "silently no-op"
            )
            tp_specs = tp_param_specs(state, self.mesh, axis="model")
            specs = tp_specs if specs is None else merge_specs(tp_specs, specs)
        if self.cfg.ep:
            assert "model" in self.mesh.shape and self.mesh.shape["model"] > 1, (
                "TrainerConfig.ep=True needs a mesh with a model axis > 1 "
                "(pass mesh=make_mesh(model=N)); with model=1 EP would "
                "silently no-op"
            )
            ep_specs = ep_param_specs(state, self.mesh, axis="model")
            assert any(s != P() for s in jax.tree.leaves(
                ep_specs, is_leaf=lambda s: isinstance(s, P))), (
                "ep=True but no expert-batched leaves found — the model has "
                "no MoE layers (set DiTConfig.num_experts > 0)")
            specs = ep_specs if specs is None else merge_specs(ep_specs, specs)
        if specs is not None:
            self._state_shardings = jax.tree.map(
                lambda s: NamedSharding(self.mesh, s), specs,
                is_leaf=lambda s: isinstance(s, P),
            )
        else:
            self._state_shardings = jax.tree.map(
                lambda _: replicated(self.mesh), state
            )
        self._train_step = jax.jit(
            self._step_fn,
            donate_argnums=(0,),
            in_shardings=(self._state_shardings, self._batch_sharding, None),
            out_shardings=(self._state_shardings, None),
        )
        return jax.tree.map(jax.device_put, state, self._state_shardings)

    def step(self, state: TrainState, batch: dict):
        if self._train_step is None:
            state = self.shard_state(state)
        self._rng, step_rng = jax.random.split(self._rng)
        batch = jax.tree.map(jnp.asarray, batch)
        with self._attn_ctx():  # effective at trace time only (first call)
            return self._train_step(state, batch, step_rng)

    def current_lr(self, step: int) -> float:
        """LR at a given *micro*-step (table is indexed by optimizer step)."""
        return float(self.lr_table[min(step // self.grad_accum, len(self.lr_table) - 1)])

    # -- sampling with EMA weights (reference train.py:148-149) --------------
    #
    # NOTE: EMA params average over an ~1/(1-decay)-step horizon; early in
    # training (step count < horizon) they still contain initialization
    # noise and will sample garbage while the raw params already produce
    # structure. Pass use_ema=False for early-training previews.

    def sample(self, state: TrainState, rng: jax.Array, n: Optional[int] = None,
               cond=None, y=None, use_ema: bool = True):
        n = n or self.cfg.n_samples
        sampler = self.cfg.preview_sampler
        assert sampler in ("ddpm", "ddim", "dpm", "flow"), sampler
        key = (n, cond is not None, y is not None, sampler)
        if key not in self._samplers:
            def _sample(params, rng, cond, y):
                model_fn = lambda x, t, c, yy: self.model.apply(params, x, t, cond=c, y=yy)
                kw = dict(cond=cond, y=y)
                if sampler != "ddpm" and cond is not None and \
                        self.diffusion.cond_type == "sum":
                    # ddpm_sample splits the (gt|mask) concat itself; the
                    # ddim/dpm RePaint path takes mask/x0 explicitly
                    ci = self.diffusion.in_channels
                    kw = dict(cond=None, y=y, x0=cond[..., :ci],
                              mask=cond[..., ci : ci + 1])
                if sampler == "flow":
                    # FlowMatching process (diffusion/flow.py): ODE
                    # integration; the "sum" rewrite above maps (gt|mask)
                    # cond onto the explicit mask/x0 inpainting path
                    return self.diffusion.sample(
                        model_fn, rng, n, num_steps=self.cfg.preview_steps,
                        **kw,
                    ).x
                if sampler == "ddim":
                    return self.diffusion.ddim_sample(
                        model_fn, rng, n, num_steps=self.cfg.preview_steps,
                        clip=not self.cfg.no_clip, **kw,
                    ).x
                if sampler == "dpm":
                    # method dispatch (not dpm_solver_sample directly) so
                    # LatentDiffusion wrappers route through their decode
                    return self.diffusion.dpm_sample(
                        model_fn, rng, n, num_steps=self.cfg.preview_steps,
                        clip=not self.cfg.no_clip, **kw,
                    ).x
                return self.diffusion.ddpm_sample(
                    model_fn, rng, n, cond=cond, y=y, clip=not self.cfg.no_clip
                ).x

            # cache the jitted sampler: re-tracing the T-step scan on every
            # periodic sampling call costs minutes on CPU hosts
            self._samplers[key] = jax.jit(_sample)
        cond_j = None if cond is None else jnp.asarray(cond)
        y_j = None if y is None else jnp.asarray(y)
        p = state.ema_params if use_ema else state.params
        with self._attn_ctx():  # effective at trace time only (first call)
            return self._samplers[key](p, rng, cond_j, y_j)
