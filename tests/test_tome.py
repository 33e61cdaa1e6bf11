"""Token merging (ops/tome.py + models/dit.py tome_ratio).

ToMe (arXiv:2303.17604) is parameter-free and static-shape by design here:
these tests pin the partition geometry, the exactness guarantees of the
merge/unmerge round trip, the aligned merge count, and the end-to-end DiT
integration (merged attention width, checkpoint compatibility, gradients).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eo_diffusion_tpu.ops.tome import (aligned_merge_count, build_merge,
                                       tome_partition)


class TestPartition:
    def test_disjoint_cover(self):
        dst, src = tome_partition(8, 8)
        assert len(dst) == 16 and len(src) == 48
        assert sorted(np.concatenate([dst, src]).tolist()) == list(range(64))

    def test_stride_geometry(self):
        dst, _ = tome_partition(4, 6, sx=3, sy=2)
        # dst = rows 0,2 x cols 0,3 of a 4x6 grid (row-major)
        assert dst.tolist() == [0, 3, 12, 15]


class TestAlignedCount:
    def test_alignment_matches_kernel_dispatch(self):
        # 1024 tokens (256px/p8): merged count snaps to the 8-sublane
        # granule (any T%8==0 <= 1024 runs the whole-T q-block kernel,
        # ops/attention.py:763-771); ratio 0.375 lands exactly on 640
        dst, src = tome_partition(32, 32)
        r = aligned_merge_count(1024, len(src), 0.4)
        assert (1024 - r) % 8 == 0 and abs((1024 - r) - 614) <= 8
        assert 1024 - aligned_merge_count(1024, len(src), 0.375) == 640
        # above 1024 the auto q-block is 512: merged count snaps to 512s
        dst2, src2 = tome_partition(64, 64)  # 4096 tokens (512px/p8)
        r2 = aligned_merge_count(4096, len(src2), 0.4)
        assert (4096 - r2) % 512 == 0

    def test_small_grids_unaligned(self):
        _, src = tome_partition(8, 8)
        assert aligned_merge_count(64, len(src), 0.25) == 16

    def test_clamped_to_src(self):
        _, src = tome_partition(8, 8)
        assert aligned_merge_count(64, len(src), 1.0) == len(src)
        assert aligned_merge_count(64, len(src), 0.0) == 0


class TestMergeUnmerge:
    def test_r0_exact_roundtrip(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 5))
        merge, unmerge = build_merge(x, (8, 8), 0)
        xm = merge(x)
        assert xm.shape == (2, 64, 5)  # permutation only
        np.testing.assert_array_equal(np.asarray(unmerge(xm)), np.asarray(x))

    def test_constant_tokens_exact(self):
        x = jnp.full((1, 64, 3), 0.7)
        merge, unmerge = build_merge(x, (8, 8), 16)
        xm = merge(x)
        assert xm.shape == (1, 48, 3)
        np.testing.assert_allclose(np.asarray(unmerge(xm)), 0.7, rtol=1e-6)

    def test_duplicate_sources_reconstruct(self):
        # every src token is an exact copy of one dst token; merging ALL
        # srcs then unmerging must reproduce x exactly (mean of identical
        # rows is the row; unmerge copies each dst back to its sources)
        k = jax.random.PRNGKey(1)
        dst_idx, src_idx = tome_partition(8, 8)
        vals = jax.random.normal(k, (len(dst_idx), 6)) * 3.0
        x = jnp.zeros((64, 6))
        x = x.at[jnp.asarray(dst_idx)].set(vals)
        # src j copies dst (j % n_dst)
        x = x.at[jnp.asarray(src_idx)].set(vals[np.arange(len(src_idx)) % len(dst_idx)])
        x = x[None]
        merge, unmerge = build_merge(x, (8, 8), len(src_idx))
        xm = merge(x)
        assert xm.shape == (1, 16, 6)
        np.testing.assert_allclose(np.asarray(unmerge(xm)), np.asarray(x),
                                   rtol=1e-4, atol=1e-5)

    def test_kept_sources_pass_through(self):
        # with r < Ns, the kept src positions and (un-merged-into) dst rows
        # survive the round trip bit-exactly; merged srcs land on their
        # dst's merged value
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 4))
        r = 8
        merge, unmerge = build_merge(x, (8, 8), r)
        out = np.asarray(unmerge(merge(x)))
        # at least Ns - r src positions + every dst position where nothing
        # merged must be exactly preserved => >= 64 - 2r exact rows
        exact = np.all(np.isclose(out, np.asarray(x), atol=1e-6), axis=-1)
        assert exact.sum(axis=1).min() >= 64 - 2 * r


def tiny_cfg(**kw):
    from eo_diffusion_tpu.models.dit import DiTConfig

    return DiTConfig(image_size=16, in_channels=3, out_channels=3,
                     patch_size=2, hidden_size=32, depth=2, num_heads=4,
                     **kw)  # 8x8 grid -> 64 tokens


class TestDiTIntegration:
    def _perturbed(self, model, seed=0):
        x = jnp.zeros((2, 16, 16, 3))
        t = jnp.zeros((2,), jnp.int32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t)
        # nudge every param (incl. the zero-init adaLN gates) so blocks
        # actually contribute — a fresh DiT is the identity by design
        leaves, treedef = jax.tree.flatten(params)
        keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
        leaves = [l + 0.05 * jax.random.normal(k, l.shape, l.dtype)
                  for l, k in zip(leaves, keys)]
        return jax.tree.unflatten(treedef, leaves)

    def test_merged_attention_width_and_shapes(self, monkeypatch):
        from eo_diffusion_tpu.models.dit import DiT
        from eo_diffusion_tpu.ops import attention as attn_mod

        widths = []
        orig = attn_mod.attention_from_qkv

        def spy(qkv, heads, **kw):
            widths.append(qkv.shape[1])
            return orig(qkv, heads, **kw)

        monkeypatch.setattr(attn_mod, "attention_from_qkv", spy)
        model = DiT(tiny_cfg(tome_ratio=0.25))
        x = jnp.zeros((2, 16, 16, 3))
        t = jnp.zeros((2,), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), x, t)
        out = model.apply(params, x, t)
        assert out.shape == (2, 16, 16, 3)
        assert widths and all(w == 48 for w in widths)  # 64 - 16 merged

    def test_checkpoint_compatible_and_close(self):
        # parameter-free: params from the un-merged config apply under the
        # merged config, and (with every gate perturbed on) the output
        # stays close to the full forward — the whole point of ToMe
        from eo_diffusion_tpu.models.dit import DiT

        base = DiT(tiny_cfg())
        params = self._perturbed(base)
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 3))
        t = jnp.full((2,), 37, jnp.int32)
        full = np.asarray(base.apply(params, x, t), np.float32)

        merged = DiT(tiny_cfg(tome_ratio=0.25, tome_mlp=True))
        out = np.asarray(merged.apply(params, x, t), np.float32)
        assert out.shape == full.shape
        assert np.isfinite(out).all()
        rel = np.linalg.norm(out - full) / max(np.linalg.norm(full), 1e-8)
        assert rel < 0.35, rel
        # ...but it is actually merging (not a silent no-op)
        assert np.abs(out - full).max() > 1e-7

    def test_gradients_finite(self):
        from eo_diffusion_tpu.models.dit import DiT

        model = DiT(tiny_cfg(tome_ratio=0.25))
        x = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 16, 3))
        t = jnp.zeros((1,), jnp.int32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t)

        def loss(p):
            return jnp.mean(model.apply(p, x, t) ** 2)

        g = jax.grad(loss)(params)
        assert all(np.isfinite(np.asarray(l)).all()
                   for l in jax.tree.leaves(g))


class TestToMeCLI:
    def test_train_under_tome_then_infer_without(self, tmp_path):
        """--tome_ratio at TRAINING time (differentiable merge): the run
        produces a checkpoint structurally identical to the un-merged
        config, which then samples WITHOUT ToMe — full interchangeability
        in both directions."""
        import os

        from eo_diffusion_tpu.cli import inference as infer_cli
        from eo_diffusion_tpu.cli import train as train_cli

        samples = str(tmp_path / "results")
        cwd = os.getcwd()
        os.chdir(str(tmp_path))
        try:
            train_cli.main(train_cli.parse_args([
                "--preset", "tiny-dit", "--epochs", "1",
                "--steps_per_epoch", "3", "--batch_size", "8", "--lr",
                "2e-3", "--dir", samples, "--sample_every", "0",
                "--save_every", "3", "--log_freq", "1", "--n_samples", "4",
                "--tome_ratio", "0.25", "--tome_mlp",
            ]))
        finally:
            os.chdir(cwd)
        ckpt_root = os.path.join(str(tmp_path), "logs",
                                 os.path.basename(samples))
        step_dirs = sorted(d for d in os.listdir(ckpt_root)
                           if d.startswith("steps_"))
        outdir = str(tmp_path / "infer")
        infer_cli.main(infer_cli.parse_args([
            "--preset", "tiny-dit", "--ckpt",
            os.path.join(ckpt_root, step_dirs[-1]), "--sampler", "ddim",
            "--sampler_steps", "4", "--samples_fid", "--n_iter", "0",
            "--batch_size", "4", "--outdir", outdir,
        ]))
        assert os.listdir(os.path.join(outdir, "samples_fid"))

    def test_flag_rejected_on_unet_preset(self):
        from eo_diffusion_tpu.cli import inference as infer_cli

        args = infer_cli.parse_args([
            "--preset", "tiny", "--ckpt", "/nonexistent", "--tome_ratio",
            "0.5", "--n_iter", "0", "--batch_size", "2",
        ])
        with pytest.raises(AssertionError, match="DiT"):
            infer_cli.main(args)
