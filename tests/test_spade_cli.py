"""SPADE/SDM semantic-diffusion presets through the CLIs.

The reference vendors the SDM UNet (backbones/unet.py:557+) but never
builds an entry point for it; here ``backbone="spade"`` presets train
segmap-modulated generation end-to-end (cond_type="spade": the dataset's
segmentation IS the conditioning, modulating every GroupNorm — not
channel-concat).
"""

import os

import numpy as np
import pytest


class TestSpadePreset:
    def test_model_config_builds_spade(self):
        from eo_diffusion_tpu.cli.presets import build_denoiser, get_preset
        from eo_diffusion_tpu.models.unet_spade import SpadeUNet, SpadeUNetConfig

        p = get_preset("tiny-spade")
        cfg = p.model_config(cond_channels=1, bf16=False)
        assert isinstance(cfg, SpadeUNetConfig)
        assert cfg.label_channels == 1
        assert isinstance(build_denoiser(cfg), SpadeUNet)

    def test_class_conditional_rejected(self):
        from eo_diffusion_tpu.cli.presets import get_preset

        p = get_preset("tiny-spade")
        with pytest.raises(AssertionError):
            p.model_config(num_classes=5, cond_channels=1)


class TestSpadeCLI:
    def test_train_infer_roundtrip(self, tmp_path):
        """Train tiny-spade through the train CLI (segmap rides cond into
        every SPADE norm), then sample through the inference CLI with
        metrics (cond present -> SSIM/PSNR vs gt written)."""
        from eo_diffusion_tpu.cli import inference as infer_cli
        from eo_diffusion_tpu.cli import train as train_cli

        cwd = os.getcwd()
        os.chdir(str(tmp_path))
        try:
            train_cli.main(train_cli.parse_args([
                "--preset", "tiny-spade", "--epochs", "1",
                "--steps_per_epoch", "3", "--batch_size", "8",
                "--dir", "res_spade", "--sample_every", "2",
                "--save_every", "3", "--log_freq", "1", "--n_samples", "4",
            ]))
            ckpt_root = os.path.join(str(tmp_path), "logs", "res_spade")
            steps = sorted(d for d in os.listdir(ckpt_root)
                           if d.startswith("steps_"))
            ckpt = os.path.join(ckpt_root, steps[-1])
            # conditioned preview grid + cond visualization written
            pngs = [f for f in os.listdir("res_spade") if f.endswith(".png")]
            assert pngs

            outdir = str(tmp_path / "infer_spade")
            infer_cli.main(infer_cli.parse_args([
                "--preset", "tiny-spade", "--ckpt", ckpt,
                "--sampler", "ddim", "--sampler_steps", "5",
                "--metrics", "--save", "--samples_fid",
                "--n_iter", "0", "--batch_size", "4", "--outdir", outdir,
            ]))
            assert os.path.exists(os.path.join(outdir, "metrics.txt"))
            assert os.listdir(os.path.join(outdir, "samples_fid"))
        finally:
            os.chdir(cwd)
