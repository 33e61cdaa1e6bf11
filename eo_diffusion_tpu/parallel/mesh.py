"""Device mesh + sharding layout for SPMD training/sampling.

The reference has no active distributed path (SURVEY.md §2.3); this module is
the new, TPU-idiomatic design: a 1-D/2-D ``jax.sharding.Mesh`` with

* ``data`` axis -- batch (data-parallel); gradients are reduced by the XLA
  ``psum`` that jit inserts for sharded-batch reductions over ICI.
* ``model`` axis -- optional parameter/tensor sharding hook (FSDP-style
  sharding of params and Adam moments along their largest dimension).

Everything is expressed with ``NamedSharding`` + ``jax.jit`` in/out shardings;
no hand-written collectives are needed for the DP path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "data_sharding",
    "replicated",
    "fsdp_param_specs",
    "tp_param_specs",
    "ep_param_specs",
    "merge_specs",
    "shard_batch",
]


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: Optional[int] = None,
    model: int = 1,
) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices.

    With ``model=1`` (default) this is pure data-parallelism; the mesh shape
    is chosen so data*model covers all requested devices. ICI adjacency is
    preserved by keeping the device order XLA provides.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-leading sharding: dim 0 split over the 'data' axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def fsdp_param_specs(params, mesh: Mesh, min_size: int = 2**16, axis: str = "model"):
    """FSDP-style PartitionSpecs: shard each large param along its largest
    divisible dimension over ``axis``; small params stay replicated.

    Optional (off by default): at the reference model scale (<100M params)
    replication is faster; this hook exists for larger UNets / multi-host.
    """
    size = mesh.shape[axis]

    def spec_for(p):
        if size == 1 or p.size < min_size:
            return P()
        dims = list(p.shape)
        order = sorted(range(len(dims)), key=lambda i: -dims[i])
        for i in order:
            if dims[i] % size == 0:
                parts = [None] * len(dims)
                parts[i] = axis
                return P(*parts)
        return P()

    return jax.tree.map(spec_for, params)


def tp_param_specs(params, mesh: Mesh, axis: str = "model"):
    """Megatron-style tensor-parallel PartitionSpecs for the UNet's
    attention projections (SURVEY.md §2.3 TP row).

    Column-parallel on the input projections (``qkv``/``to_q``/``to_kv``
    Dense kernels shard their output dim + matching bias), row-parallel on
    the output projections (``proj_out`` kernels shard the input dim; the
    jit-partitioner inserts the psum). Everything else stays replicated --
    at this model scale convs don't need TP (SURVEY §2.3), and GSPMD is
    semantics-preserving either way: annotations never change results, only
    where collectives land.

    Efficiency note: the sharding propagates through the XLA attention path
    (einsums contract over unsharded dims). The Pallas kernel is a custom
    call GSPMD cannot partition -- but under TP the Trainer activates
    ``ops.attention.head_sharded_attention``, which shard_maps the kernel
    over the HEAD axis (zero collectives; heads are embarrassingly
    parallel). A virtual-mesh test asserts the compiled HLO contains no
    all-gather/all-reduce around the kernel (test_ops.TestHeadShardedTP).
    Head counts not divisible by the model axis fall back to the
    GSPMD-partitioned XLA dispatch.
    """
    size = mesh.shape[axis]
    # attention input-projection layer names across the model families:
    # unet.py (qkv/to_q/to_kv), encoder_unet.py AttentionPool (qkv_proj),
    # unet_convnext.py LinearAttention (to_qkv)
    in_names = ("qkv", "to_q", "to_kv", "qkv_proj", "to_qkv")

    def spec_for(path, p):
        names = [getattr(k, "key", str(k)) for k in path]
        in_proj = any(n in in_names for n in names)
        out_proj = any(n == "proj_out" for n in names)
        leaf = names[-1] if names else ""
        if size > 1 and in_proj:
            if leaf == "kernel" and p.ndim == 2 and p.shape[1] % size == 0:
                return P(None, axis)
            if leaf == "bias" and p.ndim == 1 and p.shape[0] % size == 0:
                return P(axis)
        if size > 1 and out_proj and leaf == "kernel" and p.ndim == 2 \
                and p.shape[0] % size == 0:
            return P(axis, None)  # row-parallel; bias stays replicated
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def ep_param_specs(params, mesh: Mesh, axis: str = "model"):
    """Expert-parallel PartitionSpecs (SURVEY.md §2.3 EP row — N/A in the
    reference, implemented here for the MoE-DiT family, models/moe.py).

    Every expert-batched leaf under a ``moe`` module (``w_in [E, d, h]``,
    ``b_in [E, h]``, ``w_out [E, h, d]``, ``b_out [E, d]``) shards its
    leading expert dim over ``axis``; the router and everything else stay
    replicated. The dispatch/combine einsums contract tokens against the
    expert shards, so GSPMD places the expert FFN matmuls entirely on the
    owning device and inserts the token exchange (the all-to-all
    equivalent) around them. Annotation-only: numerics are unchanged
    (tests/test_moe.py asserts EP loss == replicated loss).
    """
    size = mesh.shape[axis]
    expert_leaves = ("w_in", "b_in", "w_out", "b_out")

    def spec_for(path, p):
        names = [getattr(k, "key", str(k)) for k in path]
        if (size > 1 and "moe" in names and names[-1] in expert_leaves
                and p.ndim >= 1 and p.shape[0] % size == 0):
            return P(axis, *([None] * (p.ndim - 1)))
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def merge_specs(primary, fallback):
    """Combine two PartitionSpec trees: the primary spec wins on every leaf
    it actually shards; ``P()`` leaves fall through to the fallback (the
    TP-over-FSDP composition used by the Trainer and the multichip dryrun).
    """
    return jax.tree.map(
        lambda t, f: t if t != P() else f, primary, fallback,
        is_leaf=lambda s: isinstance(s, P),
    )


def shard_batch(batch, mesh: Mesh):
    """Place a host-side numpy batch onto the mesh, split along dim 0."""
    sh = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
