"""Fused flash-attention Pallas kernel for the UNet's spatial self-attention.

Replaces the reference's materialized-scores einsum attention
(``QKVAttention[Legacy]``, unet_openai.py:456-519) with an online-softmax
tiled kernel: the [T, T] scores matrix never leaves VMEM. At the flagship
256x256 sampling config the ds=4 attention level runs T=4096 tokens, where
the full scores tile (4096^2 f32 = 64 MB/head) would blow VMEM and waste HBM
bandwidth round-tripping through memory.

Numerics match the reference exactly: the double-sqrt scaling
``(q*s)@(k*s)`` with s = 1/sqrt(sqrt(D)) (unet_openai.py:475-478) and
float32 softmax statistics.

Layout: q, k, v are [B, T, H, D] (the UNet's head-split layout). Internally
heads fold into the grid's batch dimension; D pads to the 128-lane tile and
T to the block size (padded KV positions are masked with a large negative
bias, padded D columns contribute zeros).

The op is differentiable via ``jax.custom_vjp``: the backward pass
recomputes attention with plain XLA einsums (memory is ample at training
sizes, T <= 4096), so the kernel can run in both training and sampling.
``fused_attention`` falls back to the XLA path automatically for tiny
sequences (T <= 256) where kernel launch overhead outweighs the fusion win,
and on non-TPU backends.
"""

from __future__ import annotations

import contextlib
import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

__all__ = ["fused_attention", "flash_attention", "xla_attention",
           "attention_from_qkv", "head_sharded_attention", "ring_attention",
           "sequence_sharded_attention", "identity_attention"]

_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)

# test hook: run the kernel in the Pallas interpreter (CPU-correctness tests)
_INTERPRET = False

# trace-time tensor-parallel routing (set via head_sharded_attention): when
# a (mesh, axis) pair is active, attention_from_qkv wraps the fused-qkv
# Pallas kernel in jax.shard_map over the HEAD dim. GSPMD cannot partition a
# Mosaic custom call, so without this the jit partitioner must all-gather
# the full [B,3,H,T,D] activation around the kernel under TP
# (parallel/mesh.py tp_param_specs efficiency note); heads are
# embarrassingly parallel, so the shard_mapped kernel needs zero collectives.
_TP_MESH = None

# trace-time perturbed-attention routing (PAG, arXiv:2403.17377): inside the
# identity_attention() context every self-attention map is replaced by the
# identity -- each token attends only to itself, so attention_from_qkv
# returns V. The PAG guidance wrapper (diffusion/pag.py) traces the
# perturbed model call inside this context.
_IDENTITY = False
# trace-time counter: how many attention_from_qkv sites were actually
# perturbed inside an identity_attention() context. Lets the PAG wrapper
# detect (at trace time) a backbone with no routed self-attention site,
# where the perturbed branch would silently equal the plain branch.
_IDENTITY_HITS = 0


def identity_attention_hits() -> int:
    """Number of self-attention sites perturbed inside identity contexts."""
    return _IDENTITY_HITS


@contextlib.contextmanager
def identity_attention():
    """Replace self-attention with the identity map for calls traced inside.

    This is PAG's perturbation (arXiv:2403.17377 §3.1): softmax(QK^T) -> I,
    so the attention output is V exactly. Like head_sharded_attention, the
    routing is trace-time -- enter the context around the model call while
    jit traces it and the identity branch is baked into the jaxpr. Only
    self-attention (attention_from_qkv) is perturbed; cross-attention
    conditioning paths are untouched, per the paper.
    """
    global _IDENTITY
    prev, _IDENTITY = _IDENTITY, True
    try:
        yield
    finally:
        _IDENTITY = prev


# trace-time sequence-parallel routing (set via sequence_sharded_attention):
# when a (mesh, axis) pair is active, attention_from_qkv dispatches to
# ring_attention -- Q/K/V sequence-sharded, K/V rotating by ppermute -- so
# any backbone using the shared dispatch (UNet AttentionBlock, DiTBlock)
# runs context-parallel without model changes.
_SP_MESH = None


@contextlib.contextmanager
def sequence_sharded_attention(mesh, axis: str = "model"):
    """Route attention_from_qkv through :func:`ring_attention` over ``axis``
    for any attention traced inside the context (sequence parallelism).

    Same trace-time contract as :func:`head_sharded_attention`: enter around
    the FIRST call of a jitted function; the ring dispatch is baked into the
    jaxpr. Attention whose sequence length does not divide
    ``mesh.shape[axis]`` falls back to the regular dispatch.
    """
    global _SP_MESH
    prev, _SP_MESH = _SP_MESH, (mesh, axis)
    try:
        yield
    finally:
        _SP_MESH = prev


@contextlib.contextmanager
def head_sharded_attention(mesh, axis: str = "model"):
    """Route the Pallas attention kernel through ``jax.shard_map`` over the
    mesh ``axis`` (head-sharded) for any attention traced inside the context.

    Enter this around the FIRST call of a jitted function (tracing time);
    the routing is baked into the jaxpr, later calls need no context. The
    Trainer does this automatically when ``TrainerConfig.tp`` is set.
    Attention ops whose head count doesn't divide ``mesh.shape[axis]`` fall
    back to the regular dispatch (GSPMD-partitioned XLA path).
    """
    global _TP_MESH
    prev, _TP_MESH = _TP_MESH, (mesh, axis)
    try:
        yield
    finally:
        _TP_MESH = prev


def _scale(d: int) -> float:
    return 1.0 / math.sqrt(math.sqrt(d))


def xla_attention(q: jax.Array, k: jax.Array, v: jax.Array) -> jax.Array:
    """Reference-equivalent attention with XLA einsums. [B,T,H,D] -> [B,T,H,D]."""
    s = jnp.asarray(_scale(q.shape[-1]), q.dtype)
    w = jnp.einsum("bthc,bshc->bhts", q * s, k * s)
    w = jax.nn.softmax(w.astype(jnp.float32), axis=-1).astype(v.dtype)
    return jnp.einsum("bhts,bshc->bthc", w, v)


def ring_attention(q: jax.Array, k: jax.Array, v: jax.Array, mesh,
                   axis: str = "model") -> jax.Array:
    """Sequence-parallel (context-parallel) attention over a mesh axis.

    Ring attention (arXiv:2310.01889) in its TPU-idiomatic form: Q/K/V are
    sharded along the SEQUENCE dim over ``axis``; each device keeps its Q
    shard resident while the K/V shards rotate one ICI hop per step with
    ``lax.ppermute``, and the partial attention outputs merge with the same
    online-softmax (m, l, acc) algebra the flash kernels use. Peak
    activation memory per chip is O(T/n) instead of O(T), so sequences that
    exceed one chip's resident-KV capacity (``_MAX_RESIDENT_KV``) shard
    instead of spilling. The n-step rotation is unrolled (n is the static
    mesh-axis size), so XLA's latency-hiding scheduler overlaps each hop's
    collective-permute with the previous chunk's matmuls.

    Fully differentiable (the transpose of ``ppermute`` is the reverse
    ring), numerically matched to ``xla_attention`` (f32 statistics, the
    split ``1/sqrt(sqrt(d))`` scaling on both operands).

    The reference is single-GPU and has no analog (SURVEY.md §2.3); the
    per-device compute here is plain jnp einsums rather than the Pallas
    kernel so the partitioner sees pure XLA ops it can schedule around —
    at T/n ≤ 4096 the resident-KV Pallas path and XLA attention are within
    a few percent of each other (PERF.md), and the ring's win is memory
    capacity, not kernel time.

    Args:
      q, k, v: ``[B, T, H, D]`` with ``T % mesh.shape[axis] == 0``.
      mesh: the device mesh; ``axis`` is the ring (sequence) axis.

    Returns ``[B, T, H, D]`` in ``q.dtype``, sequence-sharded over ``axis``.
    """
    from jax.sharding import PartitionSpec as P

    n = int(mesh.shape[axis])
    b, t, h, d = q.shape
    assert t % n == 0, f"seq len {t} must divide over {axis}={n}"
    sc = _scale(d)
    fwd = [(i, (i + 1) % n) for i in range(n)]

    def local(ql, kl, vl):
        bl, tq = ql.shape[0], ql.shape[1]  # local shard shapes (batch may be
        m = jnp.full((bl, h, tq, 1), -jnp.inf, jnp.float32)  # data-sharded)
        l = jnp.zeros((bl, h, tq, 1), jnp.float32)
        acc = jnp.zeros((bl, tq, h, d), jnp.float32)
        kc, vc = kl, vl
        qs = ql * jnp.asarray(sc, ql.dtype)
        for i in range(n):
            s = jnp.einsum("bthc,bshc->bhts", qs, kc * jnp.asarray(sc, kc.dtype),
                           preferred_element_type=jnp.float32)
            m_c = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m_c)
            l_c = jnp.sum(p, axis=-1, keepdims=True)
            o_c = jnp.einsum("bhts,bshc->bthc", p.astype(vc.dtype), vc,
                             preferred_element_type=jnp.float32)
            m_new = jnp.maximum(m, m_c)
            alpha = jnp.exp(m - m_new)
            beta = jnp.exp(m_c - m_new)
            l = alpha * l + beta * l_c
            acc = (acc * jnp.swapaxes(alpha, 1, 2)
                   + o_c * jnp.swapaxes(beta, 1, 2))
            m = m_new
            if i + 1 < n:  # last chunk needs no hop: every shard visited
                kc = jax.lax.ppermute(kc, axis, fwd)
                vc = jax.lax.ppermute(vc, axis, fwd)
        return (acc / jnp.swapaxes(l, 1, 2)).astype(ql.dtype)

    # batch rides the 'data' axis when the mesh has one (and the batch
    # divides it) so DP and SP compose without replicating Q/K/V over data
    batch_axis = ("data" if "data" in mesh.shape and "data" != axis
                  and b % int(mesh.shape["data"]) == 0 else None)
    spec = P(batch_axis, axis, None, None)
    return jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec
    )(q, k, v)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *,
                  block_k: int, t_real: int, nk: int):
    """One (batch*head, q-tile, kv-tile) grid cell of online-softmax attention."""
    kv_idx = pl.program_id(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]  # [block_q, d]
    k = k_ref[0]  # [block_k, d]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [block_q, block_k]

    # mask padded KV rows (beyond the true sequence length)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_idx * block_k
    s = jnp.where(col < t_real, s, _MASK_VALUE)

    m_prev = m_ref[...]  # [block_q, 128] (replicated lanes)
    l_prev = l_ref[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)  # [block_q, 1]
    m_next = jnp.maximum(m_prev, m_curr)  # broadcast to [block_q, 128]
    alpha = jnp.exp(m_prev - m_next)
    p = jnp.exp(s - m_next[:, :1])
    l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
    m_ref[...] = m_next
    l_ref[...] = l_next

    v = v_ref[0]  # [block_k, d]
    acc_ref[...] = acc_ref[...] * alpha[:, :1] + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )

    @pl.when(kv_idx == nk - 1)
    def _store():
        l = l_ref[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_ref[...] * l_inv).astype(o_ref.dtype)


def _resident_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref=None, *,
                     t_real: int, block_k: int):
    """Whole-KV-resident attention with a statically unrolled inner KV loop.

    At the UNet's sequence lengths (<= 4096) K and V stay resident in VMEM;
    the f32 scores tile is chunked to [block_q, block_k] so block_q can grow
    to 1024 (bigger matmul M amortizes MXU weight-tile loads: measured
    4.39 -> 3.96 ms at T=4096/H8/D48/B8 on v5e vs the previous single-pass
    block_q=512 kernel). Normalization is deferred to one reciprocal multiply
    on the [block_q, d] accumulator instead of dividing the full scores tile.
    With a single chunk (t <= block_k) the online-softmax carry disappears
    entirely -- the j == 0 branch writes m/l/acc directly.
    """
    t_pad = k_ref.shape[1]
    q = q_ref[0]
    m = l = acc = None
    for j in range(t_pad // block_k):  # static unroll
        k = k_ref[0, j * block_k:(j + 1) * block_k]
        v = v_ref[0, j * block_k:(j + 1) * block_k]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        if (j + 1) * block_k > t_real:  # only the tail chunk needs masking
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
            s = jnp.where(col < t_real, s, _MASK_VALUE)
        m_c = jnp.max(s, axis=1, keepdims=True)
        if m is None:
            m_n = m_c
            p = jnp.exp(s - m_n)
            l = jnp.sum(p, axis=1, keepdims=True)
            acc = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        else:
            m_n = jnp.maximum(m, m_c)
            alpha = jnp.exp(m - m_n)
            p = jnp.exp(s - m_n)
            l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc = acc * alpha + jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )
        m = m_n
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    o_ref[0] = (acc * l_inv).astype(o_ref.dtype)
    if lse_ref is not None:
        # row logsumexp for the flash backward (lane-replicated layout);
        # fully-masked rows get a huge lse so recomputed p == 0, never NaN
        lse = jnp.where(l == 0.0, -_MASK_VALUE, m + jnp.log(jnp.maximum(l, 1e-37)))
        lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# KV sequences up to this length stay fully VMEM-resident per grid cell
_MAX_RESIDENT_KV = 4096


def _flash_fwd_impl(q, k, v, block_q: int, block_k: int, return_lse: bool = False):
    b, t, h, d = q.shape
    s = jnp.asarray(_scale(d), q.dtype)
    # fold heads into batch: [B*H, T, D]
    fold = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, t, d)
    qf, kf, vf = fold(q * s), fold(k * s), fold(v)

    d_pad = max(128, -(-d // 128) * 128)
    block_q = min(block_q, -(-t // 8) * 8)
    t_pad_q = -(-t // block_q) * block_q
    nq = t_pad_q // block_q
    qf = _pad_to(_pad_to(qf, d_pad, 2), t_pad_q, 1)

    if t <= _MAX_RESIDENT_KV:
        # whole KV resident; scores chunked to [block_q, block_k] in-kernel
        bk = min(block_k, -(-t // 8) * 8)
        t_pad_k = -(-t // bk) * bk
        kf = _pad_to(_pad_to(kf, d_pad, 2), t_pad_k, 1)
        vf = _pad_to(_pad_to(vf, d_pad, 2), t_pad_k, 1)
        out_shape = jax.ShapeDtypeStruct((b * h, t_pad_q, d_pad), q.dtype)
        out_spec = pl.BlockSpec((1, block_q, d_pad), lambda bi, iq: (bi, iq, 0))
        if return_lse:
            out_shape = [out_shape,
                         jax.ShapeDtypeStruct((b * h, t_pad_q, 128), jnp.float32)]
            out_spec = [out_spec,
                        pl.BlockSpec((1, block_q, 128), lambda bi, iq: (bi, iq, 0))]
        out = pl.pallas_call(
            functools.partial(_resident_kernel, t_real=t, block_k=bk),
            grid=(b * h, nq),
            in_specs=[
                pl.BlockSpec((1, block_q, d_pad), lambda bi, iq: (bi, iq, 0)),
                pl.BlockSpec((1, t_pad_k, d_pad), lambda bi, iq: (bi, 0, 0)),
                pl.BlockSpec((1, t_pad_k, d_pad), lambda bi, iq: (bi, 0, 0)),
            ],
            out_specs=out_spec,
            out_shape=out_shape,
            compiler_params=None if _INTERPRET else _compiler_params(two_d=True),
            interpret=_INTERPRET,
        )(qf, kf, vf)
        if return_lse:
            out, lse = out
            return out[:, :t, :d].reshape(b, h, t, d).transpose(0, 2, 1, 3), lse
        return out[:, :t, :d].reshape(b, h, t, d).transpose(0, 2, 1, 3)

    block_k = min(block_k, -(-t // 8) * 8)
    t_pad_k = -(-t // block_k) * block_k
    kf = _pad_to(_pad_to(kf, d_pad, 2), t_pad_k, 1)
    vf = _pad_to(_pad_to(vf, d_pad, 2), t_pad_k, 1)
    nk = t_pad_k // block_k

    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, t_real=t, nk=nk),
        grid=(b * h, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda bi, iq, ik: (bi, iq, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda bi, iq, ik: (bi, ik, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda bi, iq, ik: (bi, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda bi, iq, ik: (bi, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, t_pad_q, d_pad), q.dtype),
        scratch_shapes=[
            _vmem((block_q, 128), jnp.float32),  # running max m
            _vmem((block_q, 128), jnp.float32),  # running sum l
            _vmem((block_q, d_pad), jnp.float32),  # output accumulator
        ],
        compiler_params=None if _INTERPRET else _compiler_params(),
        interpret=_INTERPRET,
    )(qf, kf, vf)

    out = out[:, :t, :d].reshape(b, h, t, d).transpose(0, 2, 1, 3)
    return out


def _vmem(shape, dtype):
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.VMEM(shape, dtype)


def _compiler_params(two_d: bool = False):
    from jax.experimental.pallas import tpu as pltpu

    sem = ("parallel", "arbitrary") if two_d else ("parallel", "parallel", "arbitrary")
    return pltpu.CompilerParams(dimension_semantics=sem)


# ---------------------------------------------------------------------------
# flash backward (resident-KV regime)
# ---------------------------------------------------------------------------

# scores-chunk width for the backward kernel (own knob: the bwd holds two
# [block_q, block_k] f32 tiles live plus the dk/dv accumulators; 1024 lands
# the whole kernel 1.13MB over the 16MB scoped-VMEM limit at T=4096)
_BWD_BLOCK_K = 512


def _resident_bwd_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
                         dq_ref, dk_ref, dv_ref, *,
                         t_real: int, block_k: int, nq: int, scale: float):
    """Flash-attention backward, whole KV resident per (batch*head).

    Grid is (B*H, nq) with the q-tile axis sequential: dq writes per q-tile;
    dk/dv accumulate across q-tiles directly in their f32 output blocks
    (same block index every iteration, so they stay VMEM-resident and flush
    once -- saves 4MB of scratch vs separate accumulators, which is what
    keeps the kernel under the 16MB scoped-VMEM limit). Inputs q/k are
    pre-scaled by ``scale`` (the reference's double-sqrt scaling); the chain
    rule's d(q*s)/dq = s multiplies in on the last iteration.

    Standard flash backward math (Dao et al. 2205.14135, alg. 2), with the
    softmax row statistics read back as the forward's saved logsumexp:
      p    = exp(q k^T - lse)
      dv  += p^T do
      dp   = do v^T
      ds   = p * (dp - rowsum(do * o))
      dq  += ds k ;  dk += ds^T q
    Zero-padded do rows make padded-q contributions vanish; padded KV columns
    are masked to p == 0 exactly as in the forward.
    """
    iq = pl.program_id(1)

    @pl.when(iq == 0)
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    q = q_ref[0]            # [bq, d] (pre-scaled)
    do = do_ref[0]          # [bq, d]
    lse = lse_ref[0][:, :1]  # [bq, 1] f32
    delta = jnp.sum(
        do.astype(jnp.float32) * o_ref[0].astype(jnp.float32),
        axis=1, keepdims=True,
    )  # [bq, 1]

    t_pad = k_ref.shape[1]
    dq = jnp.zeros((q.shape[0], q.shape[1]), jnp.float32)
    for j in range(t_pad // block_k):  # static unroll
        k = k_ref[0, j * block_k:(j + 1) * block_k]  # [bk, d] (pre-scaled)
        v = v_ref[0, j * block_k:(j + 1) * block_k]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]
        if (j + 1) * block_k > t_real:  # mask padded KV columns (tail chunk)
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
            s = jnp.where(col < t_real, s, _MASK_VALUE)
        p = jnp.exp(s - lse)  # [bq, bk] f32
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]
        ds = p * (dp - delta)
        p_b = p.astype(v.dtype)
        ds_b = ds.astype(q.dtype)
        dq = dq + jax.lax.dot_general(
            ds_b, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dv_ref[0, j * block_k:(j + 1) * block_k] += jax.lax.dot_general(
            p_b, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bk, d]
        dk_ref[0, j * block_k:(j + 1) * block_k] += jax.lax.dot_general(
            ds_b, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bk, d]

    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)

    @pl.when(iq == nq - 1)
    def _scale_dk():
        dk_ref[...] = dk_ref[...] * scale


def _resident_bwd_kernel_tpv(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
                             dq_ref, dk_ref, dv_ref, *,
                             t_real: int, block_k: int, nq: int, scale: float):
    """Transposed-output variant of :func:`_resident_bwd_kernel` for D < 128.

    Three of the backward's five matmuls produce D-wide outputs (dq, dk, dv)
    and pad N=D to the 128-lane MXU tile -- 2.67x pass waste at D=48.
    Emitting them transposed ([D, bq] / [D, bk]) puts D on the sublane-
    granular row-stream dim instead (same trick as the forward's
    ``_qkv_layout_kernel_tpv``; measured matmul shapes in
    tools/probe_attn_matmuls.py). Inputs arrive UNPADDED (D lanes, handled
    natively by Mosaic); dk/dv accumulate in their transposed f32 output
    blocks across the sequential q axis exactly like the base kernel.
    """
    iq = pl.program_id(1)

    @pl.when(iq == 0)
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    q = q_ref[0]            # [bq, d] (pre-scaled)
    do = do_ref[0]          # [bq, d]
    lse = lse_ref[0][:, :1]  # [bq, 1] f32
    delta = jnp.sum(
        do.astype(jnp.float32) * o_ref[0].astype(jnp.float32),
        axis=1, keepdims=True,
    )  # [bq, 1]

    t_pad = k_ref.shape[1]
    dqT = jnp.zeros((q.shape[1], q.shape[0]), jnp.float32)  # [d, bq]
    for j in range(t_pad // block_k):  # static unroll
        k = k_ref[0, j * block_k:(j + 1) * block_k]  # [bk, d] (pre-scaled)
        v = v_ref[0, j * block_k:(j + 1) * block_k]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]
        if (j + 1) * block_k > t_real:  # mask padded KV columns (tail chunk)
            col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
            s = jnp.where(col < t_real, s, _MASK_VALUE)
        p = jnp.exp(s - lse)  # [bq, bk] f32
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]
        ds = p * (dp - delta)
        p_b = p.astype(v.dtype)
        ds_b = ds.astype(q.dtype)
        # dq^T = k^T ds^T : contract bk -> [d, bq]
        dqT = dqT + jax.lax.dot_general(
            k, ds_b, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        # dv^T = do^T p : contract bq -> [d, bk]
        dv_ref[0, :, j * block_k:(j + 1) * block_k] += jax.lax.dot_general(
            do, p_b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        # dk^T = q^T ds : contract bq -> [d, bk]
        dk_ref[0, :, j * block_k:(j + 1) * block_k] += jax.lax.dot_general(
            q, ds_b, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    dq_ref[0] = (dqT * scale).astype(dq_ref.dtype)

    @pl.when(iq == nq - 1)
    def _scale_dk():
        dk_ref[...] = dk_ref[...] * scale


def _flash_bwd_impl(q, k, v, o, lse, g, block_q: int, block_k: int = _BWD_BLOCK_K):
    """Pallas flash backward. q/k/v/o/g: [B,T,H,D]; lse: [B*H, T_pad_q, 128]
    (the forward's saved row statistics, padded with the SAME block_q).
    Returns (dq, dk, dv) in [B,T,H,D]."""
    b, t, h, d = q.shape
    sc = _scale(d)
    s = jnp.asarray(sc, q.dtype)
    fold = lambda x: x.transpose(0, 2, 1, 3).reshape(b * h, t, d)
    qf, kf, vf = fold(q * s), fold(k * s), fold(v)
    of, gf = fold(o), fold(g)

    # transposed-output grad kernel whenever D pads the 128-lane tile (see
    # _resident_bwd_kernel_tpv): inputs stay UNPADDED on the lane dim
    tpv = d < 128 and d % 16 == 0
    d_pad = d if tpv else max(128, -(-d // 128) * 128)
    bq = min(block_q, -(-t // 8) * 8)
    t_pad_q = -(-t // bq) * bq
    nq = t_pad_q // bq
    bk = min(block_k, -(-t // 8) * 8)
    t_pad_k = -(-t // bk) * bk

    qf = _pad_to(_pad_to(qf, d_pad, 2), t_pad_q, 1)
    of = _pad_to(_pad_to(of, d_pad, 2), t_pad_q, 1)
    gf = _pad_to(_pad_to(gf, d_pad, 2), t_pad_q, 1)
    kf = _pad_to(_pad_to(kf, d_pad, 2), t_pad_k, 1)
    vf = _pad_to(_pad_to(vf, d_pad, 2), t_pad_k, 1)

    q_spec = pl.BlockSpec((1, bq, d_pad), lambda bi, iq: (bi, iq, 0))
    kv_spec = pl.BlockSpec((1, t_pad_k, d_pad), lambda bi, iq: (bi, 0, 0))
    if tpv:
        dq_spec = pl.BlockSpec((1, d_pad, bq), lambda bi, iq: (bi, 0, iq))
        dkv_spec = pl.BlockSpec((1, d_pad, t_pad_k), lambda bi, iq: (bi, 0, 0))
        out_specs = [dq_spec, dkv_spec, dkv_spec]
        out_shape = [
            jax.ShapeDtypeStruct((b * h, d_pad, t_pad_q), q.dtype),
            jax.ShapeDtypeStruct((b * h, d_pad, t_pad_k), jnp.float32),
            jax.ShapeDtypeStruct((b * h, d_pad, t_pad_k), jnp.float32),
        ]
        kern = _resident_bwd_kernel_tpv
    else:
        out_specs = [q_spec, kv_spec, kv_spec]
        out_shape = [
            jax.ShapeDtypeStruct((b * h, t_pad_q, d_pad), q.dtype),
            # dk/dv double as the cross-q-tile accumulators: f32
            jax.ShapeDtypeStruct((b * h, t_pad_k, d_pad), jnp.float32),
            jax.ShapeDtypeStruct((b * h, t_pad_k, d_pad), jnp.float32),
        ]
        kern = _resident_bwd_kernel
    dq, dk, dv = pl.pallas_call(
        functools.partial(kern, t_real=t, block_k=bk, nq=nq, scale=sc),
        grid=(b * h, nq),
        in_specs=[
            q_spec,  # q
            kv_spec,  # k
            kv_spec,  # v
            q_spec,  # do
            q_spec,  # o
            pl.BlockSpec((1, bq, 128), lambda bi, iq: (bi, iq, 0)),  # lse
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=None if _INTERPRET else _compiler_params(two_d=True),
        interpret=_INTERPRET,
    )(qf, kf, vf, gf, of, lse)

    if tpv:
        # outputs arrive [B*H, D, T]; one permute back to [B, T, H, D]
        unfold = lambda x: x[:, :, :t].reshape(b, h, d, t).transpose(0, 3, 1, 2)
    else:
        unfold = lambda x: x[:, :t, :d].reshape(b, h, t, d).transpose(0, 2, 1, 3)
    return unfold(dq), unfold(dk).astype(k.dtype), unfold(dv).astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(q, k, v, block_q: int = 512, block_k: int = 2048):
    """Fused attention. [B,T,H,D] x3 -> [B,T,H,D].

    For T <= 4096 the whole key sequence is VMEM-resident per grid cell and
    ``block_k`` is the in-kernel scores chunk. 512x2048 is the fastest
    config that also fits scoped VMEM inside the full UNet program
    (1024x2048 is ~3% faster in isolation but lands 1MB over the 16MB limit
    when composed with the surrounding ops); longer sequences use the
    grid-tiled online-softmax kernel.

    Differentiable: in the resident regime the backward is the Pallas flash
    backward (``_resident_bwd_kernel``) driven by the forward's saved
    logsumexp -- the [T, T] probability matrix is never materialized in HBM,
    so training at T = 4096 (the 256px concat preset) fits. Longer sequences
    fall back to XLA recomputation.
    """
    return _flash_fwd_impl(q, k, v, block_q, block_k)


def _flash_fwd(q, k, v, block_q, block_k):
    if q.shape[1] <= _MAX_RESIDENT_KV:
        out, lse = _flash_fwd_impl(q, k, v, block_q, block_k, return_lse=True)
        return out, (q, k, v, out, lse)
    return _flash_fwd_impl(q, k, v, block_q, block_k), (q, k, v, None, None)


def _flash_bwd(block_q, block_k, res, g):
    q, k, v, o, lse = res
    if o is None:
        # grid-tiled regime (T > resident cap): recompute with XLA einsums
        _, vjp = jax.vjp(xla_attention, q, k, v)
        return vjp(g)
    return _flash_bwd_impl(q, k, v, o, lse, g, block_q)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


def fused_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    min_seq: int = 512) -> jax.Array:
    """Dispatch: Pallas flash kernel on TPU for long sequences, XLA einsum
    otherwise (tiny sequences / CPU tests)."""
    t = q.shape[1]
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if not on_tpu or t < min_seq:
        return xla_attention(q, k, v)
    return flash_attention(q, k, v)


# ---------------------------------------------------------------------------
# fused qkv entry: attention straight from the projection output
# ---------------------------------------------------------------------------


def _qkv_layout_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref=None, *,
                       block_k: int, scale: float):
    """Resident-KV attention reading [1,1,1,block,D] slices of the qkv tensor.

    Same online-softmax math as :func:`_resident_kernel`, but the BlockSpec
    index maps select q/k/v (and the head) directly out of the fused
    [B, 3, H, T, D] projection tensor -- no fold transposes, no lane-padding
    copies in HBM (the D<=128 lane dim is handled by Mosaic). Measured
    bit-exact vs the folded kernel and ~20% faster end-to-end at the ds=4
    clouds shape (3.91 vs 4.93 ms incl. the folded path's copies).
    """
    q = q_ref[0, 0, 0] * scale  # [block_q, D]
    t_pad = k_ref.shape[3]
    m = l = acc = None
    for j in range(t_pad // block_k):  # static unroll
        k = k_ref[0, 0, 0, j * block_k:(j + 1) * block_k] * scale
        v = v_ref[0, 0, 0, j * block_k:(j + 1) * block_k]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        m_c = jnp.max(s, axis=1, keepdims=True)
        if m is None:
            m_n = m_c
            p = jnp.exp(s - m_n)
            l = jnp.sum(p, axis=1, keepdims=True)
            acc = jax.lax.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        else:
            m_n = jnp.maximum(m, m_c)
            alpha = jnp.exp(m - m_n)
            p = jnp.exp(s - m_n)
            l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            acc = acc * alpha + jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32
            )
        m = m_n
    o_ref[0, 0] = (acc / l).astype(o_ref.dtype)
    if lse_ref is not None:
        lse = jnp.where(l == 0.0, -_MASK_VALUE, m + jnp.log(jnp.maximum(l, 1e-37)))
        lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _qkv_layout_kernel_tpv(q_ref, k_ref, v_ref, o_ref, lse_ref=None, *,
                           block_k: int, scale: float):
    """Transposed-PV variant of :func:`_qkv_layout_kernel` for D < 128.

    The PV matmul pads its N=D output lanes to the 128-lane MXU tile --
    2.67x pass waste at the clouds D=48 (measured: PV [512,2048]x[2048,48]
    costs exactly the same 2.50 ms as D=128, tools/probe_attn_matmuls.py).
    Computing it transposed, ``accT[D, bq] = v^T-contract-p``, puts D on the
    row-stream dim (sublane-granular, 48 streams, no padding): 1.52 ms
    isolated, core 3.92 -> 3.66 ms (tools/probe_softmax_orient.py). The
    softmax stays in the fast lane orientation; the output block is written
    [D, block_q] into a [B, H, D, T] tensor -- the caller's existing
    [.., T, D] -> [B, T, H, D] epilogue permute becomes a [.., D, T] permute
    of the same cost. Cross-head lane packing was measured OUT: a shared-p
    96-lane PV costs the same 2.49 ms as 48 (the padding quantum is the full
    128-lane tile), and p is head-specific so real packing is impossible.
    """
    q = q_ref[0, 0, 0] * scale  # [block_q, D]
    t_pad = k_ref.shape[3]
    m = l = accT = None
    for j in range(t_pad // block_k):  # static unroll
        k = k_ref[0, 0, 0, j * block_k:(j + 1) * block_k] * scale
        v = v_ref[0, 0, 0, j * block_k:(j + 1) * block_k]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # [bq, bk]
        m_c = jnp.max(s, axis=1, keepdims=True)
        if m is None:
            m_n = m_c
            p = jnp.exp(s - m_n)
            l = jnp.sum(p, axis=1, keepdims=True)
            accT = jax.lax.dot_general(
                v, p.astype(v.dtype).T, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [D, bq]
        else:
            m_n = jnp.maximum(m, m_c)
            alpha = jnp.exp(m - m_n)
            p = jnp.exp(s - m_n)
            l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
            accT = accT * alpha.T + jax.lax.dot_general(
                v, p.astype(v.dtype).T, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        m = m_n
    o_ref[0, 0] = (accT / l.T).astype(o_ref.dtype)  # [D, block_q]
    if lse_ref is not None:
        lse = jnp.where(l == 0.0, -_MASK_VALUE, m + jnp.log(jnp.maximum(l, 1e-37)))
        lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


def _qkv5_ref_attention(qkv5: jax.Array) -> jax.Array:
    """XLA reference for the fused-layout kernel: [B,3,H,T,D] -> [B,H,T,D]."""
    q = qkv5[:, 0].transpose(0, 2, 1, 3)
    k = qkv5[:, 1].transpose(0, 2, 1, 3)
    v = qkv5[:, 2].transpose(0, 2, 1, 3)
    return xla_attention(q, k, v).transpose(0, 2, 1, 3)


def _qkv5_fwd_impl(qkv5, block_q: int, block_k: int, return_lse: bool = False):
    b, three, h, t, d = qkv5.shape
    # the zero-copy kernel holds whole K/V planes (and the fwd's lse for the
    # flash bwd) VMEM-resident -- beyond the cap it would OOM scoped VMEM at
    # compile time. attention_from_qkv gates dispatch on the same cap; this
    # assert keeps direct callers honest (advisor r2: the former bwd-only
    # fallback was unreachable dead protection).
    assert t <= _MAX_RESIDENT_KV, (
        f"fused-qkv kernel requires T <= {_MAX_RESIDENT_KV}, got {t}; use "
        "attention_from_qkv (which falls back to the grid-tiled kernel)"
    )
    # transposed-PV variant whenever the head dim pads 128 output lanes and
    # satisfies the bf16 sublane tile (see _qkv_layout_kernel_tpv): +7% core
    tpv = d < 128 and d % 16 == 0
    if tpv:
        kern = _qkv_layout_kernel_tpv
        out_spec = pl.BlockSpec((1, 1, d, block_q), lambda bi, hi, iq: (bi, hi, 0, iq))
        out_shape = jax.ShapeDtypeStruct((b, h, d, t), qkv5.dtype)
    else:
        kern = _qkv_layout_kernel
        out_spec = pl.BlockSpec((1, 1, block_q, d), lambda bi, hi, iq: (bi, hi, iq, 0))
        out_shape = jax.ShapeDtypeStruct((b, h, t, d), qkv5.dtype)
    if return_lse:
        out_spec = [out_spec,
                    pl.BlockSpec((1, 1, block_q, 128),
                                 lambda bi, hi, iq: (bi, hi, iq, 0))]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((b, h, t, 128), jnp.float32)]
    out = pl.pallas_call(
        functools.partial(kern, block_k=block_k, scale=_scale(d)),
        grid=(b, h, t // block_q),
        in_specs=[
            pl.BlockSpec((1, 1, 1, block_q, d), lambda bi, hi, iq: (bi, 0, hi, iq, 0)),
            pl.BlockSpec((1, 1, 1, t, d), lambda bi, hi, iq: (bi, 1, hi, 0, 0)),
            pl.BlockSpec((1, 1, 1, t, d), lambda bi, hi, iq: (bi, 2, hi, 0, 0)),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=None if _INTERPRET else _compiler_params(),
        interpret=_INTERPRET,
    )(qkv5, qkv5, qkv5)
    if tpv:
        # restore the [B, H, T, D] contract; this permute fuses with the
        # caller's [B,H,T,D] -> [B,T,H,D] epilogue into one copy
        if return_lse:
            o, lse = out
            return o.transpose(0, 1, 3, 2), lse
        return out.transpose(0, 1, 3, 2)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _qkv5_flash(qkv5, block_q: int, block_k: int):
    return _qkv5_fwd_impl(qkv5, block_q, block_k)


def _qkv5_fwd(qkv5, block_q, block_k):
    out, lse = _qkv5_fwd_impl(qkv5, block_q, block_k, return_lse=True)
    return out, (qkv5, out, lse)


def _qkv5_bwd(block_q, block_k, res, g):
    """Pallas flash backward on the fused-layout path.

    The zero-copy forward reads q/k/v straight out of [B,3,H,T,D]; for the
    backward the planes are sliced apart (cheap transposes vs the [T,T]
    matmuls) and the shared resident backward kernel runs, then the three
    grads restack into the projection layout.
    """
    qkv5, o, lse = res
    b, three, h, t, d = qkv5.shape
    # t <= _MAX_RESIDENT_KV is guaranteed by the forward's cap assert
    to_bthd = lambda x: x.transpose(0, 2, 1, 3)  # [B,H,T,D] -> [B,T,H,D]
    q, k, v = (to_bthd(qkv5[:, i]) for i in range(3))
    dq, dk, dv = _flash_bwd_impl(
        q, k, v, to_bthd(o), lse.reshape(b * h, t, 128), to_bthd(g), block_q
    )
    back = lambda x: x.transpose(0, 2, 1, 3)  # [B,T,H,D] -> [B,H,T,D]
    return (jnp.stack([back(dq), back(dk), back(dv)], axis=1),)


_qkv5_flash.defvjp(_qkv5_fwd, _qkv5_bwd)


def attention_from_qkv(qkv: jax.Array, heads: int, new_order: bool = False,
                       impl: str = "auto", min_seq: int = 512,
                       block_q: Optional[int] = None,
                       block_k: int = 2048) -> jax.Array:
    """Self-attention straight from the fused projection: [B,T,3C] -> [B,T,C].

    ``new_order`` selects the reference's qkv channel layout
    (``QKVAttention`` (q|k|v)-major vs ``QKVAttentionLegacy`` head-major,
    unet_openai.py:456-519). On TPU with an aligned sequence the zero-copy
    fused-layout kernel runs; otherwise q/k/v are sliced and dispatched to
    :func:`fused_attention`.

    ``block_q=None`` auto-sizes: the whole T as one q block at T <= 1024
    (measured +9% core at the DiT T=1024/d=64 shape — fewer grid cells to
    amortize the per-cell softmax/pipeline prologue; same 4 MB VMEM scores
    footprint), 512 beyond. Row blocks are independent, so the choice does
    not change results.
    """
    b, t, c3 = qkv.shape
    c = c3 // 3
    d = c // heads
    if _IDENTITY:
        # PAG perturbed branch (identity_attention context): softmax map = I,
        # output is V in the block's channel layout -- no matmuls at all
        global _IDENTITY_HITS
        _IDENTITY_HITS += 1
        if new_order:
            v = qkv.reshape(b, t, 3, heads, d)[:, :, 2]
        else:
            v = qkv.reshape(b, t, heads, 3, d)[:, :, :, 2]
        return v.reshape(b, t, c)
    if _SP_MESH is not None:
        # sequence-parallel routing (sequence_sharded_attention context):
        # dispatch to the ppermute ring when the token count divides the axis
        sp_mesh, sp_axis = _SP_MESH
        sp_n = dict(sp_mesh.shape).get(sp_axis, 1)
        if sp_n > 1 and t % sp_n == 0:
            if new_order:
                r = qkv.reshape(b, t, 3, heads, d)
                q, k, v = r[:, :, 0], r[:, :, 1], r[:, :, 2]
            else:
                r = qkv.reshape(b, t, heads, 3, d)
                q, k, v = r[:, :, :, 0], r[:, :, :, 1], r[:, :, :, 2]
            return ring_attention(q, k, v, sp_mesh, axis=sp_axis
                                  ).reshape(b, t, c)
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if block_q is None:
        block_q = t if t <= 1024 else 512
    bq = min(block_q, t)
    bk = min(block_k, t)
    # the zero-copy kernel holds the whole K/V planes VMEM-resident per grid
    # cell -- beyond the resident cap (e.g. ds=4 attention at 512px ->
    # T=16384) dispatch to fused_attention's grid-tiled path instead
    aligned = (t % bq == 0 and t % bk == 0 and bq % 8 == 0 and d <= 128
               and t <= _MAX_RESIDENT_KV)
    use_kernel = (impl == "pallas") or (
        impl == "auto" and on_tpu and t >= min_seq and aligned
    )
    if use_kernel and aligned:
        if new_order:
            qkv5 = qkv.reshape(b, t, 3, heads, d).transpose(0, 2, 3, 1, 4)
        else:
            qkv5 = qkv.reshape(b, t, heads, 3, d).transpose(0, 3, 2, 1, 4)
        if _TP_MESH is not None:
            mesh, axis = _TP_MESH
            size = dict(mesh.shape).get(axis, 1)
            if size > 1 and heads % size == 0:
                from jax.sharding import PartitionSpec as P

                # heads are embarrassingly parallel: each shard runs the
                # kernel on its local H/size heads with zero collectives
                # (vs GSPMD all-gathering the whole [B,3,H,T,D] around the
                # un-partitionable Mosaic custom call)
                out = jax.shard_map(
                    lambda x: _qkv5_flash(x, bq, bk),
                    mesh=mesh,
                    in_specs=P(None, None, axis, None, None),
                    out_specs=P(None, axis, None, None),
                    # pallas_call outputs carry no varying-mesh-axes
                    # metadata; the specs above are the full contract
                    check_vma=False,
                )(qkv5)
                return out.transpose(0, 2, 1, 3).reshape(b, t, c)
        out = _qkv5_flash(qkv5, bq, bk)  # [B, H, T, D]
        return out.transpose(0, 2, 1, 3).reshape(b, t, c)
    if new_order:
        r = qkv.reshape(b, t, 3, heads, d)
        q, k, v = r[:, :, 0], r[:, :, 1], r[:, :, 2]
    else:
        r = qkv.reshape(b, t, heads, 3, d)
        q, k, v = r[:, :, :, 0], r[:, :, :, 1], r[:, :, :, 2]
    if impl == "xla":
        a = xla_attention(q, k, v)
    elif impl == "pallas":
        a = flash_attention(q, k, v)
    else:
        a = fused_attention(q, k, v, min_seq=min_seq)
    return a.reshape(b, t, c)
