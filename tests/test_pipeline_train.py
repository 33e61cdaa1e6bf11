"""1F1B pipeline-training tests (parallel/pipeline_train.py).

Gradient parity is the whole contract: the 1F1B engine must return exactly
the gradients of ``jax.grad`` on the sequential model — block params
(stage-sharded), head params, input/conditioning cotangents — for any
stage count and microbatch count, plus the structural memory claim (ring
buffer sized 2S-1, independent of M).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from eo_diffusion_tpu.models.dit import DiT, DiTConfig
from eo_diffusion_tpu.parallel.pipeline import stack_block_params
from eo_diffusion_tpu.parallel.pipeline_train import one_f_one_b, pp_dit_grads


def stage_mesh(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(jax.devices()[:n]).reshape(n), ("stage",))


# ---------------------------------------------------------------------------
# engine-level parity on a tiny analytic "block": y = tanh(x @ W + c @ U)
# ---------------------------------------------------------------------------

DEPTH, B, D = 4, 8, 6


def make_engine_problem(seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    stacked = {
        "w": 0.4 * jax.random.normal(ks[0], (DEPTH, D, D)),
        "u": 0.3 * jax.random.normal(ks[1], (DEPTH, D, D)),
    }
    head = {"v": 0.5 * jax.random.normal(ks[2], (D, D))}
    h = jax.random.normal(ks[3], (B, D))
    c = jax.random.normal(ks[4], (B, D))
    target = jax.random.normal(ks[5], (B, D))
    return stacked, head, h, c, target


def block_fn(bp, h, c):
    return jnp.tanh(h @ bp["w"] + c @ bp["u"])


def head_fn(hp, y, aux):
    out = y @ hp["v"]
    return jnp.mean((out - aux["target"]) ** 2)


def sequential_loss(stacked, head, h, c, target, n_micro):
    """Mean over microbatches of the per-microbatch head loss — identical
    to what the pipeline computes (equal-sized microbatches make this the
    global mean too)."""
    mb = B // n_micro
    losses = []
    for m in range(n_micro):
        hm, cm, tm = (a[m * mb:(m + 1) * mb] for a in (h, c, target))
        y = hm
        for i in range(DEPTH):
            y = block_fn(jax.tree.map(lambda p: p[i], stacked), y, cm)
        losses.append(head_fn(head, y, {"target": tm}))
    return sum(losses) / n_micro


class TestEngineParity:
    @pytest.mark.parametrize("S,n_micro", [(2, 4), (4, 4), (4, 8), (2, 2),
                                           (1, 4)])
    def test_grads_match_sequential(self, S, n_micro):
        mesh = stage_mesh(S)
        stacked, head, h, c, target = make_engine_problem()

        loss, d_stacked, d_head, dh, dc, d_aux = jax.jit(
            lambda sp, hp, h, c, tg: one_f_one_b(
                block_fn, head_fn, sp, hp, h, c, {"target": tg}, mesh,
                n_micro=n_micro)
        )(stacked, head, h, c, target)

        ref_loss, ref_grads = jax.value_and_grad(
            sequential_loss, argnums=(0, 1, 2, 3))(
                stacked, head, h, c, target, n_micro)
        r_stacked, r_head, r_h, r_c = ref_grads

        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
        for g, r in ((d_stacked, r_stacked), (d_head, r_head)):
            jax.tree.map(lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6), g, r)
        np.testing.assert_allclose(np.asarray(dh), np.asarray(r_h),
                                   rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(dc), np.asarray(r_c),
                                   rtol=2e-4, atol=1e-6)
        # head's aux cotangent: d/d target of the MSE
        np.testing.assert_allclose(
            np.asarray(d_aux["target"]),
            np.asarray(jax.grad(
                lambda tg: sequential_loss(stacked, head, h, c, tg, n_micro)
            )(target)), rtol=2e-4, atol=1e-6)

    @pytest.mark.parametrize("nd,S", [(2, 2), (2, 4)])
    def test_grads_match_sequential_under_dp(self, nd, S):
        """DP x PP: with a data axis the engine must return GLOBAL-mean
        loss/grads (pmean over data for the param grads, 1/nd rescale of
        the per-sample cotangents). Regression for the silent-divergence
        bug where loss/d_head/d_stacked were per-data-shard partials
        declared 'replicated' and never reduced."""
        if len(jax.devices()) < nd * S:
            pytest.skip(f"needs {nd * S} devices")
        mesh = Mesh(np.array(jax.devices()[:nd * S]).reshape(nd, S),
                    ("data", "stage"))
        n_micro = 4
        stacked, head, h, c, target = make_engine_problem()

        loss, d_stacked, d_head, dh, dc, d_aux = jax.jit(
            lambda sp, hp, h, c, tg: one_f_one_b(
                block_fn, head_fn, sp, hp, h, c, {"target": tg}, mesh,
                n_micro=n_micro, data_axis="data")
        )(stacked, head, h, c, target)

        ref_loss, ref_grads = jax.value_and_grad(
            sequential_loss, argnums=(0, 1, 2, 3))(
                stacked, head, h, c, target, n_micro)
        r_stacked, r_head, r_h, r_c = ref_grads

        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
        for g, r in ((d_stacked, r_stacked), (d_head, r_head)):
            jax.tree.map(lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6), g, r)
        np.testing.assert_allclose(np.asarray(dh), np.asarray(r_h),
                                   rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(dc), np.asarray(r_c),
                                   rtol=2e-4, atol=1e-6)

    def test_ring_buffer_is_m_independent(self):
        """Structural memory claim: the in-flight state is 2S-1 stage-input
        slots however many microbatches stream through (GPipe-by-autodiff
        holds all M). Verified on the jaxpr: the scan carry's buffer leaf
        has leading dim 2S-1 for both M=4 and M=16."""
        S = 4
        mesh = stage_mesh(S)
        stacked, head, h, c, target = make_engine_problem()
        h16 = jnp.tile(h, (2, 1))
        c16, t16 = jnp.tile(c, (2, 1)), jnp.tile(target, (2, 1))

        def carry_dims(hh, cc, tt, M):
            jaxpr = jax.make_jaxpr(lambda sp, hp, h, c, tg: one_f_one_b(
                block_fn, head_fn, sp, hp, h, c, {"target": tg}, mesh,
                n_micro=M))(stacked, head, hh, cc, tt)
            # the ring buffer is the only 3-D f32 scan-carry whose leading
            # dim is neither M nor NB... simplest: collect all shapes
            return str(jaxpr)

        # NB = 2S-1 = 7 appears as the buffer's leading dim in both cases;
        # a buffer scaling with M would show 8/32 instead
        mb = B // 4
        assert f"7,{mb},{D}" in carry_dims(h, c, target, 4).replace(" ", "")
        mb16 = 16 // 16
        assert f"7,{mb16},{D}" in carry_dims(
            h16, c16, t16, 16).replace(" ", "")


# ---------------------------------------------------------------------------
# full DiT objective-MSE parity
# ---------------------------------------------------------------------------


def make_dit(depth=4):
    cfg = DiTConfig(image_size=16, in_channels=3, out_channels=3, patch_size=4,
                    hidden_size=64, depth=depth, num_heads=4)
    m = DiT(cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 3))
    t = jnp.arange(8) * 10
    params = jax.jit(m.init)(jax.random.PRNGKey(0), x, t)
    params = jax.tree.map(
        lambda p: p + 0.03 * jax.random.normal(jax.random.PRNGKey(2), p.shape),
        params)
    target = jax.random.normal(jax.random.PRNGKey(3), x.shape)
    return m, params, x, t, target


class TestDiTParity:
    @pytest.mark.parametrize("S,n_micro", [(2, 4), (4, 4)])
    def test_pp_dit_grads_match_value_and_grad(self, S, n_micro):
        mesh = stage_mesh(S)
        model, params, x, t, target = make_dit()

        def seq_loss(p):
            mb = x.shape[0] // n_micro
            losses = []
            for m in range(n_micro):
                sl = slice(m * mb, (m + 1) * mb)
                out = model.apply(p, x[sl], t[sl])
                losses.append(jnp.mean(
                    (out.astype(jnp.float32) - target[sl]) ** 2))
            return sum(losses) / n_micro

        ref_loss, ref_grads = jax.value_and_grad(seq_loss)(params)
        loss, grads = jax.jit(lambda p: pp_dit_grads(
            model, p, x, t, target, mesh, n_micro=n_micro))(params)

        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
        flat_r, tdef_r = jax.tree.flatten(ref_grads)
        flat_g, tdef_g = jax.tree.flatten(grads)
        assert tdef_r == tdef_g
        paths = [jax.tree_util.keystr(kp) for kp, _ in
                 jax.tree_util.tree_flatten_with_path(ref_grads)[0]]
        for pth, a, b in zip(paths, flat_g, flat_r):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=5e-3, atol=5e-5, err_msg=pth)

    def test_pp_dit_grads_match_under_dp(self):
        """Full DiT gradients on a data=2 x model=2 mesh equal sequential
        jax.value_and_grad on the GLOBAL batch — the Trainer's actual
        pp_micro topology (make_mesh(model=S) leaves data = n_dev/S)."""
        if len(jax.devices()) < 4:
            pytest.skip("needs 4 devices")
        mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2),
                    ("data", "model"))
        model, params, x, t, target = make_dit()
        n_micro = 4

        def seq_loss(p):
            mb = x.shape[0] // n_micro
            losses = []
            for m in range(n_micro):
                sl = slice(m * mb, (m + 1) * mb)
                out = model.apply(p, x[sl], t[sl])
                losses.append(jnp.mean(
                    (out.astype(jnp.float32) - target[sl]) ** 2))
            return sum(losses) / n_micro

        ref_loss, ref_grads = jax.value_and_grad(seq_loss)(params)
        loss, grads = jax.jit(lambda p: pp_dit_grads(
            model, p, x, t, target, mesh, axis="model", n_micro=n_micro,
            data_axis="data"))(params)

        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
        flat_r, tdef_r = jax.tree.flatten(ref_grads)
        flat_g, tdef_g = jax.tree.flatten(grads)
        assert tdef_r == tdef_g
        paths = [jax.tree_util.keystr(kp) for kp, _ in
                 jax.tree_util.tree_flatten_with_path(ref_grads)[0]]
        for pth, a, b in zip(paths, flat_g, flat_r):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=5e-3, atol=5e-5, err_msg=pth)

    def test_pp_dit_apply_matches_with_tome(self):
        """pp_dit_apply must run the SAME function as model.apply when the
        config enables ToMe (the rebuilt torso block used to drop the
        tome fields and silently skip merging)."""
        from eo_diffusion_tpu.parallel.pipeline import pp_dit_apply

        mesh = stage_mesh(2)
        cfg = DiTConfig(image_size=16, in_channels=3, out_channels=3,
                        patch_size=2, hidden_size=64, depth=4, num_heads=4,
                        tome_ratio=0.5)
        model = DiT(cfg)
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 3))
        t = jnp.arange(4) * 10
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t)
        ref = model.apply(params, x, t)
        out = jax.jit(lambda p: pp_dit_apply(
            model, p, x, t, mesh, n_micro=2))(params)
        np.testing.assert_allclose(np.asarray(out, np.float32),
                                   np.asarray(ref, np.float32),
                                   rtol=5e-4, atol=5e-5)

    def test_one_step_improves_loss(self):
        """End-to-end sanity: an SGD step along the 1F1B gradients lowers
        the same sequential loss."""
        mesh = stage_mesh(2)
        model, params, x, t, target = make_dit()

        def full_loss(p):
            out = model.apply(p, x, t)
            return jnp.mean((out.astype(jnp.float32) - target) ** 2)

        loss0 = float(full_loss(params))
        _, grads = jax.jit(lambda p: pp_dit_grads(
            model, p, x, t, target, mesh, n_micro=4))(params)
        stepped = jax.tree.map(lambda p, g: p - 0.05 * g.astype(p.dtype),
                               params, grads)
        assert float(full_loss(stepped)) < loss0


# ---------------------------------------------------------------------------
# Trainer + CLI integration (TrainerConfig.pp_micro)
# ---------------------------------------------------------------------------


class TestPPTrainer:
    def _trainer(self, pp_micro, mesh=None, model=None, diffusion=None):
        from eo_diffusion_tpu.diffusion.flow import FlowMatching
        from eo_diffusion_tpu.train.trainer import Trainer, TrainerConfig

        if model is None:
            cfg = DiTConfig(image_size=16, in_channels=3, out_channels=3,
                            patch_size=4, hidden_size=64, depth=4,
                            num_heads=4)
            model = DiT(cfg)
        if diffusion is None:
            diffusion = FlowMatching.create(image_size=16, in_channels=3)
        tcfg = TrainerConfig(lr=3e-3, batch_size=8, epochs=1, timesteps=10,
                             model_ema_steps=1, warmup_epochs=0, seed=3,
                             pp_micro=pp_micro)
        return Trainer(tcfg, model, diffusion, steps_per_epoch=20, mesh=mesh)

    def test_pp_trainer_learns(self):
        """TrainerConfig.pp_micro routes the step through the 1F1B engine:
        the loss falls and EMA/opt/step advance exactly like the autodiff
        step."""
        from eo_diffusion_tpu.parallel.mesh import make_mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        mesh = make_mesh(model=4)
        tr = self._trainer(pp_micro=2, mesh=mesh)
        rng = np.random.default_rng(0)
        mk = lambda: {"image": (rng.choice([-0.5, 0.5], size=(8, 1, 1, 1))
                                * np.ones((8, 16, 16, 3))).astype(np.float32)}
        state = tr.init(jax.random.PRNGKey(0), mk())
        losses = []
        for _ in range(20):
            state, m = tr.step(state, mk())
            losses.append(float(m["loss"]))
        assert int(state.step) == 20
        # the FM loss floor is ~E||eps||^2 ~ 1.0 (the irreducible noise
        # variance): assert the reducible part shrinks, not a fixed ratio
        assert np.mean(losses[-5:]) < np.mean(losses[:5]) - 0.1, losses
        # EMA actually tracked (not stuck at init)
        diff = jax.tree.leaves(jax.tree.map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))),
            state.ema_params, state.params))
        assert max(diff) > 0.0

    def test_pp_rejects_unet_and_tp(self):
        from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
        from eo_diffusion_tpu.models.unet import UNet, UNetConfig
        from eo_diffusion_tpu.parallel.mesh import make_mesh
        from eo_diffusion_tpu.train.trainer import Trainer, TrainerConfig

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        mesh = make_mesh(model=4)
        ucfg = UNetConfig(image_size=8, in_channels=3, model_channels=16,
                          out_channels=3, num_res_blocks=1,
                          attention_resolutions=(), channel_mult=(1, 2),
                          num_heads=1)
        gd = GaussianDiffusion.create(timesteps=10, image_size=8,
                                      in_channels=3)
        with pytest.raises(AssertionError, match="DiT"):
            Trainer(TrainerConfig(pp_micro=2), UNet(ucfg), gd, 1, mesh=mesh)
        cfg = DiTConfig(image_size=16, in_channels=3, out_channels=3,
                        patch_size=4, hidden_size=64, depth=4, num_heads=4)
        with pytest.raises(AssertionError, match="DP only"):
            Trainer(TrainerConfig(pp_micro=2, tp=True), DiT(cfg), gd, 1,
                    mesh=mesh)

    def test_pp_cli_roundtrip(self, tmp_path):
        """--pp_micro through the train CLI on the virtual mesh: steps run,
        checkpoints written (mirrors the --fsdp/--tp CLI test)."""
        import os

        from eo_diffusion_tpu.cli import train as train_cli

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        sample_dir = str(tmp_path / "results")
        cwd = os.getcwd()
        os.chdir(str(tmp_path))
        try:
            train_cli.main(train_cli.parse_args([
                "--preset", "tiny-dit", "--epochs", "1",
                "--steps_per_epoch", "2", "--batch_size", "8",
                "--model_parallel", "2", "--pp_micro", "2",  # tiny-dit depth=2
                "--dir", sample_dir, "--sample_every", "100",
                "--save_every", "2", "--log_freq", "1", "--n_samples", "4",
            ]))
        finally:
            os.chdir(cwd)
        ckpt_root = os.path.join(str(tmp_path), "logs",
                                 os.path.basename(sample_dir))
        assert any(e.startswith("steps_") for e in os.listdir(ckpt_root))


# ---------------------------------------------------------------------------
# interleaved virtual stages (Megatron-style, virtual_chunks > 1)
# ---------------------------------------------------------------------------


class TestInterleavedParity:
    """virtual_chunks=V places block-chunk c on device c mod S; gradients
    must still be exactly jax.grad of the sequential model, with d_stacked
    returned in the ORIGINAL block order (the engine owns the layout)."""

    @pytest.mark.parametrize("S,V,n_micro", [(2, 2, 4), (2, 2, 2), (4, 1, 4),
                                             (1, 4, 4), (2, 1, 4)])
    def test_grads_match_sequential(self, S, V, n_micro):
        # DEPTH=4 divides S*V for every case above
        mesh = stage_mesh(S)
        stacked, head, h, c, target = make_engine_problem()

        loss, d_stacked, d_head, dh, dc, d_aux = jax.jit(
            lambda sp, hp, h, c, tg: one_f_one_b(
                block_fn, head_fn, sp, hp, h, c, {"target": tg}, mesh,
                n_micro=n_micro, virtual_chunks=V)
        )(stacked, head, h, c, target)

        ref_loss, ref_grads = jax.value_and_grad(
            sequential_loss, argnums=(0, 1, 2, 3))(
                stacked, head, h, c, target, n_micro)
        r_stacked, r_head, r_h, r_c = ref_grads

        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
        for g, r in ((d_stacked, r_stacked), (d_head, r_head)):
            jax.tree.map(lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6), g, r)
        np.testing.assert_allclose(np.asarray(dh), np.asarray(r_h),
                                   rtol=2e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(dc), np.asarray(r_c),
                                   rtol=2e-4, atol=1e-6)

    def test_depth8_three_chunks_unequal(self):
        """Depth 8 over S=2 x V=4 and S=4 x V=2 — deeper interleavings."""
        global DEPTH
        old = DEPTH
        DEPTH = 8
        try:
            for S, V in ((2, 4), (4, 2)):
                mesh = stage_mesh(S)
                stacked, head, h, c, target = make_engine_problem(seed=3)
                loss, d_stacked, *_ = jax.jit(
                    lambda sp, hp, h, c, tg: one_f_one_b(
                        block_fn, head_fn, sp, hp, h, c, {"target": tg},
                        mesh, n_micro=4, virtual_chunks=V)
                )(stacked, head, h, c, target)
                ref_loss, r_stacked = jax.value_and_grad(sequential_loss)(
                    stacked, head, h, c, target, 4)
                np.testing.assert_allclose(float(loss), float(ref_loss),
                                           rtol=1e-5)
                jax.tree.map(lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6),
                    d_stacked, r_stacked)
        finally:
            DEPTH = old

    def test_micro_must_divide_stages(self):
        mesh = stage_mesh(2)
        stacked, head, h, c, target = make_engine_problem()
        with pytest.raises(AssertionError, match="n_micro % stages"):
            one_f_one_b(block_fn, head_fn, stacked, head, h, c,
                        {"target": target}, mesh, n_micro=1,
                        virtual_chunks=2)

    def test_tick_count_shrinks_the_bubble(self):
        """The schedule's point: wall ticks (scan length) go from
        (M + 2S - 2) stage-units = (M + 2S - 2)V chunk-units at V=1 to
        MV + VS + S - 2 chunk-units when interleaved."""
        S, M = 2, 4
        mesh = stage_mesh(S)
        stacked, head, h, c, target = make_engine_problem()

        def scan_len(V):
            jaxpr = str(jax.make_jaxpr(lambda sp, hp, h, c, tg: one_f_one_b(
                block_fn, head_fn, sp, hp, h, c, {"target": tg}, mesh,
                n_micro=M, virtual_chunks=V))(stacked, head, h, c, target))
            # the tick scan is the only iota consumed by a scan; read its
            # extent from "iota[] ... shape=(N,)" — simplest robust probe:
            import re

            ns = [int(x) for x in re.findall(r"iota.*?\((\d+),\)", jaxpr)]
            return max(ns)

        # V=1: 4 + 2*2 - 2 = 6 stage-ticks of 2 chunks each = 12 chunk-units
        # V=2: 8 + 4 + 0 = 12... MV + VS + S - 2 = 8 + 4 + 2 - 2 = 12 ticks
        # of ONE chunk each — half the per-tick compute, 12 vs 6*2: equal
        # here (M small); the win appears in the general formula, asserted
        # structurally: tick counts match the closed forms.
        assert scan_len(1) == M + 2 * S - 2
        assert scan_len(2) == M * 2 + 2 * S + S - 2


class TestInterleavedTrainer:
    def test_pp_virtual_trainer_matches_classic(self):
        """pp_virtual=2 (depth-4 DiT over S=2 x V=2) produces the same
        per-step losses as classic 1F1B (V=1) — the interleaving is a pure
        schedule change."""
        from eo_diffusion_tpu.diffusion.flow import FlowMatching
        from eo_diffusion_tpu.parallel.mesh import make_mesh
        from eo_diffusion_tpu.train.trainer import Trainer, TrainerConfig

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        mesh = make_mesh(model=2)
        rng = np.random.default_rng(0)
        batches = [{"image": rng.normal(size=(8, 16, 16, 3)).astype(np.float32)}
                   for _ in range(4)]

        losses = {}
        for V in (1, 2):
            cfg = DiTConfig(image_size=16, in_channels=3, out_channels=3,
                            patch_size=4, hidden_size=64, depth=4,
                            num_heads=4)
            tcfg = TrainerConfig(lr=3e-3, batch_size=8, epochs=1,
                                 timesteps=10, model_ema_steps=1,
                                 warmup_epochs=0, seed=3, pp_micro=2,
                                 pp_virtual=V)
            tr = Trainer(tcfg, DiT(cfg), FlowMatching.create(
                image_size=16, in_channels=3), steps_per_epoch=4, mesh=mesh)
            state = tr.init(jax.random.PRNGKey(0), batches[0])
            ls = []
            for b in batches:
                state, m = tr.step(state, b)
                ls.append(float(m["loss"]))
            losses[V] = ls
        np.testing.assert_allclose(losses[1], losses[2], rtol=2e-4)

    def test_pp_virtual_cli_flag(self, tmp_path):
        """--pp_virtual through the train CLI (tiny-dit depth=2 over S=2
        means V must stay 1; use the depth-4 path via --pp_micro=2 on a
        2-stage mesh with the tiny-dit preset overridden deeper is out of
        preset scope — assert the flag reaches TrainerConfig instead)."""
        from eo_diffusion_tpu.cli import train as train_cli

        args = train_cli.parse_args(["--pp_virtual", "3"])
        assert args.pp_virtual == 3


class TestInterleavedCLI:
    def test_pp_virtual_cli_roundtrip(self, tmp_path):
        """--pp_micro 2 --pp_virtual 2 through the train CLI on the virtual
        mesh with the depth-4 tiny-dit4 preset (depth % (S*V) == 0)."""
        import os

        from eo_diffusion_tpu.cli import train as train_cli

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        sample_dir = str(tmp_path / "results")
        cwd = os.getcwd()
        os.chdir(str(tmp_path))
        try:
            train_cli.main(train_cli.parse_args([
                "--preset", "tiny-dit4", "--epochs", "1",
                "--steps_per_epoch", "2", "--batch_size", "8",
                "--model_parallel", "2", "--pp_micro", "2",
                "--pp_virtual", "2",
                "--dir", sample_dir, "--sample_every", "100",
                "--save_every", "2", "--log_freq", "1", "--n_samples", "4",
            ]))
        finally:
            os.chdir(cwd)
        ckpt_root = os.path.join(str(tmp_path), "logs",
                                 os.path.basename(sample_dir))
        assert any(e.startswith("steps_") for e in os.listdir(ckpt_root))


# ---------------------------------------------------------------------------
# reweighted-loss support (r4 weak #8 lifted): p2/min-SNR/VLB under PP
# ---------------------------------------------------------------------------


class TestReweightedPP:
    def test_training_weight_decomposition_matches_fused_loss(self):
        """mean(w * (pred - target)^2) with (x_t, t, target) from
        training_tuple and w from training_weight must equal the fused
        train_loss for every reweighting combination (same rng -> same
        (t, eps) draw: both split the key 3 ways in the same order)."""
        from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion

        x0 = jax.random.normal(jax.random.PRNGKey(7), (8, 8, 8, 3))
        model_fn = lambda x, t, c, y: 0.3 * x  # deterministic stand-in
        for kw in ({"p2_loss_weight_gamma": 1.0},
                   {"min_snr_gamma": 5.0},
                   {"elbo_weight": 0.01},
                   {"p2_loss_weight_gamma": 0.5, "min_snr_gamma": 5.0,
                    "elbo_weight": 0.001},
                   {}):
            diff = GaussianDiffusion.create(
                timesteps=50, image_size=8, in_channels=3, **kw)
            rng = jax.random.PRNGKey(11)
            fused = float(diff.train_loss(model_fn, rng, x0))
            x_t, t, target = diff.training_tuple(rng, x0)
            pred = model_fn(x_t, t, None, None)
            err = (pred.astype(jnp.float32) - target) ** 2
            w = diff.training_weight(t)
            if w is not None:
                err = err * w[:, None, None, None]
            np.testing.assert_allclose(float(jnp.mean(err)), fused,
                                       rtol=1e-5, err_msg=str(kw))

    def test_pp_dit_grads_weighted_parity(self):
        """pp_dit_grads(weight=...) == jax.grad of the sequentially
        weighted per-microbatch loss."""
        mesh = stage_mesh(2)
        model, params, x, t, target = make_dit()
        n_micro = 4
        weight = jnp.linspace(0.5, 2.0, x.shape[0])

        def seq_loss(p):
            mb = x.shape[0] // n_micro
            losses = []
            for m in range(n_micro):
                sl = slice(m * mb, (m + 1) * mb)
                out = model.apply(p, x[sl], t[sl])
                err = (out.astype(jnp.float32) - target[sl]) ** 2
                losses.append(jnp.mean(err * weight[sl][:, None, None, None]))
            return sum(losses) / n_micro

        ref_loss, ref_grads = jax.value_and_grad(seq_loss)(params)
        loss, grads = jax.jit(lambda p: pp_dit_grads(
            model, p, x, t, target, mesh, n_micro=n_micro,
            weight=weight))(params)
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
        paths = [jax.tree_util.keystr(kp) for kp, _ in
                 jax.tree_util.tree_flatten_with_path(ref_grads)[0]]
        for pth, a, b in zip(paths, jax.tree.leaves(grads),
                             jax.tree.leaves(ref_grads)):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=5e-3, atol=5e-5, err_msg=pth)

    def test_pp_trainer_accepts_reweighted_config(self):
        """The Trainer PP path runs (and learns) with p2 + min-SNR on —
        the configs the old assert rejected."""
        from eo_diffusion_tpu.diffusion.gaussian import GaussianDiffusion
        from eo_diffusion_tpu.parallel.mesh import make_mesh
        from eo_diffusion_tpu.train.trainer import Trainer, TrainerConfig

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        cfg = DiTConfig(image_size=8, in_channels=3, out_channels=3,
                        patch_size=4, hidden_size=32, depth=2, num_heads=2)
        model = DiT(cfg)
        diff = GaussianDiffusion.create(
            timesteps=50, image_size=8, in_channels=3,
            p2_loss_weight_gamma=1.0, min_snr_gamma=5.0)
        mesh = make_mesh(model=2)
        tcfg = TrainerConfig(lr=1e-3, batch_size=16, epochs=1, timesteps=50,
                             pp_micro=2)
        tr = Trainer(tcfg, model, diff, 50, mesh=mesh)
        batch = {"image": np.random.default_rng(0).normal(
            0, 0.5, (16, 8, 8, 3)).astype(np.float32)}
        state = tr.init(jax.random.PRNGKey(0), batch)
        losses = []
        for _ in range(12):
            state, m = tr.step(state, batch)
            losses.append(float(m["loss"]))
        assert losses[-1] < losses[0], losses
