"""1F1B pipeline-parallel TRAINING over a 'stage' mesh axis.

``parallel/pipeline.py`` gives the GPipe schedule: differentiate through
its forward scan and autodiff replays the ticks in reverse — correct, but
every tick's residuals (the internals of every block, for all ``n_micro``
microbatches) stay live between the forward and backward sweeps, so peak
activation memory grows linearly with the microbatch count that GPipe
needs to shrink its bubble. The classic fix is the **1F1B schedule**
(PipeDream-flush / Megatron-LM): start each microbatch's backward as soon
as its loss exists, so a stage never holds more than O(S) microbatches of
state regardless of M.

This module implements 1F1B TPU-natively as ONE ``lax.scan`` of
``M + 2S - 2`` lockstep ticks inside ONE ``shard_map`` (vs GPipe's
``M + S - 1`` forward ticks plus as many autodiff-reversed backward
ticks):

* tick ``τ``, stage ``s`` **forwards** microbatch ``f = τ - s`` and
  **backwards** microbatch ``b = τ - (2S - 2 - s)`` (both masked to the
  valid range) — after warmup every tick is one-forward-one-backward;
* activations ride down the pipe and cotangents ride up the pipe with two
  ``lax.ppermute`` neighbor exchanges per tick;
* only the **stage input** of each in-flight microbatch is kept (a
  ``2S - 1``-slot ring buffer, *independent of M*); the backward tick
  re-runs the local blocks under ``jax.vjp`` — the standard
  rematerialized-backward trade (one extra local forward) that every
  production 1F1B implementation makes;
* the per-microbatch loss head (final layer + objective) runs on the last
  stage in the same tick as that microbatch's forward, seeding the
  cotangent stream immediately — this is what makes interleaving legal:
  no global loss barrier;
* block-parameter gradients accumulate stage-locally and come back
  sharded over ``axis`` exactly like the stacked parameters themselves.

**Interleaved virtual stages** (``virtual_chunks=V > 1``, the Megatron-LM
interleaved schedule): each device hosts ``V`` non-contiguous chunks of
``depth/(S·V)`` blocks (block-chunk ``c`` lives on device ``c mod S``), and
a tick advances ONE chunk (not a whole device share), so the pipeline
fill/drain is paid in chunk units — wall ticks go from
``(M + 2S - 2)`` stage-units to ``(MV + VS + S - 2)`` chunk-units, i.e.
the bubble shrinks from ``(2S-2)·V`` to ``VS + S - 2`` chunk-units
(e.g. S=4, M=8, V=3: 18 → 14, a ~10% wall reduction; larger at small M).
The trade is the ring buffer growing from ``2S-1`` to ``2SV-1`` slots
(still M-independent). The V=1 schedule below is exactly the classic
1F1B — one engine serves both.

Schedule closed forms (device ``s``, tick ``t``, ``SV = S·V``): the
forward *unit* is ``u = t - s`` with chunk ``v = (u // S) % V`` and
microbatch ``m = (u // SV)·S + (u % S)`` (valid while ``0 ≤ u < M·V``;
requires ``M % S == 0`` when V > 1); the backward unit is
``r = t - (VS-1) - (S-1-s)`` with ``v_b = V-1 - (r % SV) // S`` and
``m_b = (r // SV)·S + (r % S)``. Both streams are dense per device, one
hop per tick rides each ``ppermute`` (chunk v on device S-1 feeds chunk
v+1 on device 0 through the same ring edge), and the loss head still
seeds the backward on the last device in the very tick the final chunk's
forward completes — the V=1 invariants all carry over.

The reference has no distributed training of any kind (SURVEY.md §2.3);
this and pipeline.py exist so the framework scales deep transformer
denoisers past one chip. Gradients are parity-tested against plain
``jax.grad`` of the sequential model on the virtual CPU mesh
(tests/test_pipeline_train.py).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

__all__ = ["one_f_one_b", "pp_dit_grads"]


def one_f_one_b(
    block_fn: Callable,
    head_fn: Callable,
    stacked_params,
    head_params,
    h: jax.Array,
    c: jax.Array,
    aux,
    mesh: Mesh,
    axis: str = "stage",
    n_micro: int = 4,
    data_axis: Optional[str] = None,
    virtual_chunks: int = 1,
):
    """Loss + gradients of ``mean_m head(final(blocks(h_m), c_m), aux_m)``
    under the 1F1B schedule (interleaved when ``virtual_chunks > 1``).

    :param block_fn: ``(block_params, h [mb, ...], c [mb, ...]) -> h`` —
        one block, one microbatch (same contract as gpipe_blocks).
    :param head_fn: ``(head_params, y [mb, ...], aux_mb) -> scalar`` — the
        per-microbatch loss head (e.g. DiT final layer + objective MSE).
        The total loss is the mean of the per-microbatch head losses.
    :param stacked_params: tree with leading dim == depth
        (pipeline.stack_block_params), sharded over ``axis``.
    :param h: block-stack input activations [B, ...].
    :param c: per-sample conditioning [B, ...].
    :param aux: pytree of per-sample loss inputs (targets, timesteps, ...),
        every leaf [B, ...].
    :param n_micro: microbatch count M; B % M == 0.
    :param data_axis: optional mesh axis carrying data parallelism.
    :param virtual_chunks: V chunks per device (Megatron interleaving);
        block-chunk ``c`` lives on device ``c mod S``. 1 = classic 1F1B.
    :returns: ``(loss, d_stacked, d_head, dh, dc, d_aux)`` — loss is the
        scalar mean over the GLOBAL batch; d_stacked matches stacked_params
        (stage-sharded; block order matches the input even when
        interleaving permutes the on-device layout); d_head matches
        head_params; dh/dc match h/c; d_aux matches aux (the head's
        cotangent into its per-sample inputs — e.g. the final layer's
        adaLN read of the conditioning). With a ``data_axis`` the data
        reduction happens HERE: loss/d_stacked/d_head are pmean'd over the
        data axis and the per-sample cotangents are rescaled from
        local-mean to global-mean (1/n_data) — so every output is exactly
        the global-batch-mean quantity, matching ``jax.value_and_grad`` of
        the sequential model on the full batch. (The earlier contract —
        "the caller reduces" — was a silent-divergence trap: out_specs
        declared loss/d_head replicated while each data shard held a
        different partial, and no caller ever reduced them.)
    """
    import numpy as np

    S = mesh.shape[axis]
    V = virtual_chunks
    depth = jax.tree.leaves(stacked_params)[0].shape[0]
    assert V >= 1 and depth % (S * V) == 0, (
        f"depth {depth} not divisible by stages*virtual_chunks = {S}*{V}")
    b = h.shape[0]
    assert b % n_micro == 0, (b, n_micro)
    mb = b // n_micro
    if data_axis is not None:
        assert mb % mesh.shape[data_axis] == 0, (
            f"microbatch rows ({mb}) must divide over the data axis "
            f"({mesh.shape[data_axis]} shards); lower n_micro or raise the "
            "batch size")
    M = n_micro
    assert V == 1 or M % S == 0, (
        f"interleaved 1F1B needs n_micro % stages == 0 (got {M} % {S}); "
        "the group-of-S round-robin is what keeps the chunk streams dense")
    L = depth // (S * V)  # blocks per chunk
    SV = S * V
    Mu = M * V  # fwd/bwd chunk-units per device
    h_m = h.reshape(M, mb, *h.shape[1:])
    c_m = c.reshape(M, mb, *c.shape[1:])
    aux_m = jax.tree.map(lambda a: a.reshape(M, mb, *a.shape[1:]), aux)
    NB = 2 * SV - 1  # ring-buffer slots: max in-flight lifetime is 2(SV-1)

    # interleaved on-device layout: device s holds chunks v*S+s for all v,
    # concatenated v-major — permute the global block stacking so the plain
    # P(axis) shard of the leading dim hands each device exactly that
    perm = np.array([(vv * S + ss) * L + ll
                     for ss in range(S) for vv in range(V) for ll in range(L)])
    if V > 1:
        stacked_params = jax.tree.map(lambda p: jnp.take(p, perm, axis=0),
                                      stacked_params)

    io_spec = P(None, data_axis) if data_axis else P()
    rep = P()

    def stage(local_params, head_params, h_m, c_m, aux_m):
        s = jax.lax.axis_index(axis)
        inv_m = 1.0 / M
        # local_params leading dim is V*L (this device's chunks, v-major)
        lp5 = jax.tree.map(lambda p: p.reshape(V, L, *p.shape[1:]),
                           local_params)

        def chunk_params(v):
            return jax.tree.map(lambda p: p[v], lp5)

        def run_local(lp, h_in, c_in):
            def body(carry, bp):
                return block_fn(bp, carry, c_in), None
            out, _ = jax.lax.scan(body, h_in, lp)
            return out

        def head_grads(hp, y, aux_mb):
            """Per-microbatch loss and its cotangents, pre-scaled by 1/M."""
            loss, vjp = jax.vjp(head_fn, hp, y, aux_mb)
            dhp, gy, daux = vjp(jnp.asarray(inv_m, loss.dtype))
            return loss, dhp, gy, daux

        zeros_f32 = lambda t: jax.tree.map(
            lambda x: jnp.zeros(x.shape, jnp.float32), t)

        def tick(carry, t_step):
            (recv_f, recv_b, buf, d_local, d_head, dh_acc, dc_acc, daux_acc,
             loss_acc) = carry

            # ---- forward: chunk-unit u = t - s --------------------------
            u = t_step - s
            f_ok = (u >= 0) & (u < Mu)
            uc = jnp.clip(u, 0, Mu - 1)
            v_f = (uc // S) % V
            fc = (uc // SV) * S + (uc % S)  # forward microbatch
            x_in = jnp.where((s == 0) & (v_f == 0), h_m[fc], recv_f)
            y = run_local(chunk_params(v_f), x_in, c_m[fc])
            slot = uc % NB
            buf = buf.at[slot].set(jnp.where(f_ok, x_in, buf[slot]))

            # loss head: last stage, final chunk, same tick, same microbatch
            # (for s == S-1, v == V-1 the backward unit coincides — below)
            loss_f, dhp_f, gy, daux_f = head_grads(
                head_params, y, jax.tree.map(lambda a: a[fc], aux_m))
            seed_ok = f_ok & (s == S - 1) & (v_f == V - 1)
            loss_acc = loss_acc + jnp.where(seed_ok, loss_f * inv_m, 0.0)
            d_head = jax.tree.map(
                lambda acc, g: acc + jnp.where(seed_ok, g, 0.0).astype(acc.dtype),
                d_head, dhp_f)
            daux_acc = jax.tree.map(
                lambda acc, g: acc.at[fc].add(
                    jnp.where(seed_ok, g, jnp.zeros_like(g)).astype(acc.dtype)),
                daux_acc, daux_f)

            # ---- backward: chunk-unit r = t - (VS-1) - (S-1-s) ----------
            r = t_step - (V * S - 1) - (S - 1 - s)
            b_ok = (r >= 0) & (r < Mu)
            rc = jnp.clip(r, 0, Mu - 1)
            v_b = V - 1 - (rc % SV) // S
            bc = (rc // SV) * S + (rc % S)  # backward microbatch
            u_b = (rc // SV) * SV + v_b * S + (rc % S)  # its fwd unit index
            x_saved = buf[u_b % NB]
            # seed iff the BACKWARD unit is the pipeline tail chunk: then
            # the forward above IS this microbatch's final chunk (same
            # tick), and gy is its head grad. Keying this on v_f instead
            # would misfire on drain ticks, where the clipped forward index
            # can read v_f == V-1 while the backward needs recv_b.
            tail_b = (s == S - 1) & (v_b == V - 1)
            g_in = jnp.where(tail_b, gy.astype(recv_b.dtype), recv_b)
            _, vjp = jax.vjp(run_local, chunk_params(v_b), x_saved, c_m[bc])
            dlp, dx, dcb = vjp(g_in)
            d_local = jax.tree.map(
                lambda acc, g: acc.at[v_b].add(
                    jnp.where(b_ok, g, 0.0).astype(acc.dtype)),
                d_local, dlp)
            first = (s == 0) & (v_b == 0)
            dh_acc = dh_acc.at[bc].add(
                jnp.where(b_ok & first, dx, jnp.zeros_like(dx)))
            dc_acc = dc_acc.at[bc].add(
                jnp.where(b_ok, dcb, jnp.zeros_like(dcb)))

            # ---- neighbor exchanges ------------------------------------
            recv_f = jax.lax.ppermute(
                y, axis, [(i, (i + 1) % S) for i in range(S)])
            recv_b = jax.lax.ppermute(
                dx.astype(recv_b.dtype), axis,
                [(i, (i - 1) % S) for i in range(S)])
            return (recv_f, recv_b, buf, d_local, d_head, dh_acc, dc_acc,
                    daux_acc, loss_acc), None

        carry0 = (
            jnp.zeros_like(h_m[0]),                       # recv_f
            # cotangents ride in the activation dtype (jax.vjp requires the
            # cotangent dtype to match the primal output's)
            jnp.zeros_like(h_m[0]),                       # recv_b
            jnp.zeros((NB,) + h_m[0].shape, h_m.dtype),   # input ring buffer
            zeros_f32(lp5),                               # d_local [V, L, ...]
            zeros_f32(head_params),                       # d_head
            jnp.zeros(h_m.shape, jnp.float32),            # dh
            jnp.zeros(c_m.shape, jnp.float32),            # dc
            zeros_f32(aux_m),                             # d_aux
            jnp.float32(0.0),                             # loss
        )
        n_ticks = Mu + V * S + S - 2  # == M + 2S - 2 at V=1
        carry, _ = jax.lax.scan(tick, carry0, jnp.arange(n_ticks))
        (_, _, _, d_local, d_head, dh_acc, dc_acc, daux_acc,
         loss_acc) = carry
        d_local = jax.tree.map(
            lambda g: g.reshape((V * L,) + g.shape[2:]), d_local)

        # d_local stays stage-sharded (matches stacked_params); everything
        # computed on a single stage is masked-psum'd to all stages
        psum = lambda t: jax.tree.map(lambda x: jax.lax.psum(x, axis), t)
        # data-parallel reduction (see the return contract): per-shard
        # quantities are means over the LOCAL batch; the global mean is
        # their pmean over the data axis, and per-sample cotangents pick
        # up the extra 1/n_data of the global-mean loss
        if data_axis is not None and mesh.shape[data_axis] > 1:
            dmean = lambda t: jax.tree.map(
                lambda x: jax.lax.pmean(x, data_axis), t)
            inv_d = 1.0 / mesh.shape[data_axis]
            dscale = lambda t: jax.tree.map(
                lambda x: (x * inv_d).astype(x.dtype), t)
        else:
            dmean = dscale = lambda t: t
        return (dmean(psum(loss_acc)), dmean(d_local), dmean(psum(d_head)),
                dscale(psum(dh_acc)), dscale(psum(dc_acc)),
                dscale(psum(daux_acc)))

    loss, d_stacked, d_head, dh_m, dc_m, daux_m = jax.shard_map(
        stage,
        mesh=mesh,
        in_specs=(P(axis), rep, io_spec, io_spec, io_spec),
        out_specs=(rep, P(axis), rep, io_spec, io_spec, io_spec),
        check_vma=False,
    )(stacked_params, head_params, h_m, c_m, aux_m)
    if V > 1:  # undo the interleaved layout: return grads in block order
        inv_perm = np.argsort(perm)
        d_stacked = jax.tree.map(lambda g: jnp.take(g, inv_perm, axis=0),
                                 d_stacked)
    dh = dh_m.reshape(b, *h.shape[1:])
    dc = dc_m.reshape(b, *c.shape[1:])
    d_aux = jax.tree.map(lambda x: x.reshape((b,) + x.shape[2:]), daux_m)
    return loss, d_stacked, d_head, dh, dc, d_aux


def pp_dit_grads(
    model,
    params,
    x_t: jax.Array,
    t: jax.Array,
    target: jax.Array,
    mesh: Mesh,
    y: Optional[jax.Array] = None,
    cond: Optional[jax.Array] = None,
    axis: str = "stage",
    n_micro: int = 4,
    data_axis: Optional[str] = None,
    virtual_chunks: int = 1,
    weight: Optional[jax.Array] = None,
):
    """Full-model (loss, grads) for a DiT objective-MSE step under 1F1B.

    Numerically equal to
    ``jax.value_and_grad(lambda p: mean((model.apply(p, x_t, t) - target)**2))``
    with the block torso's forward AND backward pipelined over ``axis``:
    embed/condition run replicated under an outer ``jax.vjp`` (<1% of the
    FLOPs), the final layer + MSE is the pipeline's per-microbatch loss
    head, and the block gradients come back from the 1F1B engine and are
    unstacked into the flax param tree.

    ``weight``: optional per-sample [N] loss weight
    (``GaussianDiffusion.training_weight`` — p2/min-SNR/VLB reweighting
    composed multiplicatively); it rides the aux pytree so each microbatch
    head weights its own samples, and the microbatch mean of weighted
    means equals the fused train_loss (equal-size microbatches).
    """
    from eo_diffusion_tpu.models.dit import DiT, torso_block
    from eo_diffusion_tpu.parallel.pipeline import stack_block_params

    cfg = model.cfg
    assert cfg.context_dim == 0, (
        "pp_dit_grads does not thread cross-attention context through the "
        "pipeline; use the sequential path for context models")

    def pre(p):
        h = model.apply(p, x_t, cond, method=DiT.embed)
        c = model.apply(p, t, y, method=DiT.condition)
        return h, c

    (h, c), pre_vjp = jax.vjp(pre, params)

    stacked = stack_block_params(params, cfg.depth)
    # torso_block reproduces setup()'s exact construction (incl. ToMe) so
    # the pipelined function IS the sequential one
    block = torso_block(cfg)
    block_fn = lambda bp, hh, cc: block.apply({"params": bp}, hh, cc)

    # the final layer reads c too (its own adaLN modulation), so c rides
    # into the head via aux and its cotangent comes back in d_aux["c"]
    def head_fn(p, y_tokens, aux_mb):
        out = model.apply(p, y_tokens, aux_mb["c"], method=DiT.final)
        err = (out.astype(jnp.float32)
               - aux_mb["target"].astype(jnp.float32)) ** 2
        if "weight" in aux_mb:
            w = aux_mb["weight"].reshape((-1,) + (1,) * (err.ndim - 1))
            err = err * w
        return jnp.mean(err)

    aux = {"c": c, "target": target}
    if weight is not None:
        aux["weight"] = weight.astype(jnp.float32)
    # the loss head only reads the final layer: pass just that subtree so
    # the 1F1B scan doesn't carry (and psum) an f32 shadow of EVERY param
    inner_p = params["params"] if "params" in params else params
    head_keys = ("final_mod", "final_proj")
    head_params = {"params": {k: inner_p[k] for k in head_keys}}
    loss, d_stacked, d_head, dh, dc, d_aux = one_f_one_b(
        block_fn, head_fn, stacked, head_params, h, c, aux, mesh,
        axis=axis, n_micro=n_micro, data_axis=data_axis,
        virtual_chunks=virtual_chunks)
    dc_total = dc + d_aux["c"]

    # embed/condition grads from the pipeline's input cotangents (zeros at
    # the block / final-layer leaves pre() never touches)
    (d_pre,) = pre_vjp((dh.astype(h.dtype), dc_total.astype(c.dtype)))

    # total grad tree: embed/cond leaves + final-layer leaves (from the
    # head subtree) + unstacked block grads
    blocks = {f"block_{i}": jax.tree.map(lambda x, i=i: x[i], d_stacked)
              for i in range(cfg.depth)}
    blocks.update(d_head["params"])
    inner = d_pre["params"] if "params" in d_pre else d_pre
    merged = {k: (jax.tree.map(lambda a, g: (a + g).astype(a.dtype),
                               v, blocks[k]) if k in blocks else v)
              for k, v in inner.items()}
    if "params" in d_pre:
        grads = dict(d_pre, params=merged)
    else:
        grads = merged
    return loss, grads
