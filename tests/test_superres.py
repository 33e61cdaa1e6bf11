"""Super-resolution stage + cascaded generation (reference SuperResModel
capability, backbones/unet.py:828-842, generalized into an end-to-end
recipe: sr_factor presets + cli/cascade.py)."""

import json
import os

import numpy as np
import pytest

from eo_diffusion_tpu.data.transforms import sr_cond, sr_degrade


class TestSRTransforms:
    def test_degrade_is_blockwise_mean(self):
        x = np.arange(2 * 8 * 8 * 3, dtype=np.float32).reshape(2, 8, 8, 3)
        lo = sr_degrade(x, 2)
        assert lo.shape == (2, 4, 4, 3)
        np.testing.assert_allclose(lo[0, 0, 0, 0],
                                   x[0, :2, :2, 0].mean(), rtol=1e-6)

    def test_cond_is_shape_preserving_nearest(self):
        x = np.random.default_rng(0).normal(
            size=(2, 16, 16, 3)).astype(np.float32)
        c = sr_cond(x, 4)
        assert c.shape == x.shape
        lo = sr_degrade(x, 4)
        # every 4x4 block of the cond is the constant block mean
        for di in range(4):
            for dj in range(4):
                np.testing.assert_allclose(c[:, di::4, dj::4], lo, rtol=1e-6)

    def test_hwc_roundtrip_and_divisibility(self):
        x = np.ones((8, 8, 1), np.float32)
        assert sr_cond(x, 2).shape == (8, 8, 1)
        with pytest.raises(AssertionError):
            sr_degrade(np.ones((1, 6, 6, 1), np.float32), 4)

    def test_identity_image_survives(self):
        # a block-constant image is a fixed point of degrade->upsample
        lo = np.random.default_rng(1).normal(size=(1, 4, 4, 3))
        x = np.repeat(np.repeat(lo, 2, axis=1), 2, axis=2).astype(np.float32)
        np.testing.assert_allclose(sr_cond(x, 2), x, rtol=1e-5)


class TestSRPreset:
    def test_sr_presets_registered(self):
        from eo_diffusion_tpu.cli.presets import get_preset

        sr = get_preset("sr64-256")
        assert sr.sr_factor == 4 and sr.image_size == 256
        assert sr.cond_type == "concat"
        tiny = get_preset("tiny-sr")
        assert tiny.image_size // tiny.sr_factor == get_preset(
            "tiny").image_size  # cascade partners line up

    def test_model_batch_derives_sr_cond(self):
        from eo_diffusion_tpu.cli.train import _to_model_batch

        img = np.random.default_rng(0).normal(
            size=(4, 16, 16, 3)).astype(np.float32)
        mb = _to_model_batch({"image": img}, "concat", sr_factor=2)
        assert mb["cond"].shape == img.shape
        np.testing.assert_allclose(mb["cond"], sr_cond(img, 2), rtol=1e-6)
        # without sr_factor there is nothing to condition on
        assert "cond" not in _to_model_batch({"image": img}, "concat")


class TestCascadeCLI:
    def test_train_sr_and_cascade(self, tmp_path):
        """tiny base + tiny-sr stage through the argparse entry points:
        train both, reconstruct with the inference CLI (SR SSIM/PSNR), then
        chain them with cli.cascade (one jitted base->upsample->SR
        program)."""
        from eo_diffusion_tpu.cli import cascade as cascade_cli
        from eo_diffusion_tpu.cli import inference as infer_cli
        from eo_diffusion_tpu.cli import train as train_cli

        cwd = os.getcwd()
        os.chdir(str(tmp_path))
        try:
            for preset, d in (("tiny", "res_base"), ("tiny-sr", "res_sr")):
                train_cli.main(train_cli.parse_args([
                    "--preset", preset, "--epochs", "1",
                    "--steps_per_epoch", "3", "--batch_size", "8",
                    "--dir", d, "--sample_every", "0",
                    "--save_every", "3", "--log_freq", "1",
                ]))
            roots = {d: os.path.join(str(tmp_path), "logs", d)
                     for d in ("res_base", "res_sr")}
            ckpts = {d: os.path.join(r, sorted(
                x for x in os.listdir(r) if x.startswith("steps_"))[-1])
                for d, r in roots.items()}

            # SR reconstruction eval: conditions on sr_cond(gt) and scores
            # SSIM/PSNR against gt through the standard inference loop
            outdir = str(tmp_path / "infer_sr")
            infer_cli.main(infer_cli.parse_args([
                "--preset", "tiny-sr", "--ckpt", ckpts["res_sr"],
                "--sampler", "ddim", "--sampler_steps", "4", "--metrics",
                "--save", "--n_iter", "0", "--batch_size", "4",
                "--outdir", outdir,
            ]))
            assert os.path.isfile(os.path.join(outdir, "metrics.txt"))

            casc = str(tmp_path / "cascade")
            m = cascade_cli.main(cascade_cli.parse_args([
                "--base_preset", "tiny", "--base_ckpt", ckpts["res_base"],
                "--sr_preset", "tiny-sr", "--sr_ckpt", ckpts["res_sr"],
                "--n", "4", "--batch_size", "4", "--base_steps", "4",
                "--sr_steps", "4", "--outdir", casc, "--no_bf16",
            ]))
            assert np.isfinite(m["cascade_rmse"])
            assert m["sr_px"] == 16 and m["base_px"] == 8
            for f in ("base.png", "base_upsampled.png", "sr.png",
                      "sr_samples.npy", "cascade_metrics.json"):
                assert os.path.isfile(os.path.join(casc, f)), f
            arr = np.load(os.path.join(casc, "sr_samples.npy"))
            assert arr.shape == (4, 16, 16, 3) and np.isfinite(arr).all()
            saved = json.load(open(os.path.join(casc,
                                                "cascade_metrics.json")))
            assert saved["factor"] == 2
        finally:
            os.chdir(cwd)

    def test_grid_mismatch_rejected(self, tmp_path):
        from eo_diffusion_tpu.cli import cascade as cascade_cli

        with pytest.raises(AssertionError, match="grid mismatch"):
            cascade_cli.main(cascade_cli.parse_args([
                "--base_preset", "synthetic64", "--base_ckpt", "/none",
                "--sr_preset", "tiny-sr", "--sr_ckpt", "/none"]))
        with pytest.raises(AssertionError, match="sr_factor"):
            cascade_cli.main(cascade_cli.parse_args([
                "--base_preset", "tiny", "--base_ckpt", "/none",
                "--sr_preset", "tiny", "--sr_ckpt", "/none"]))
