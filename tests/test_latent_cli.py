"""Latent-diffusion CLI round trip: first-stage training -> latent UNet
training -> latent sampling with pixel decode, all through the argparse entry
points (the reference capability: CompVis LatentDiffusion, ddpm.py:628-692)."""

import json
import os

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="module")
def run_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_latent")
    return {"samples": str(root / "results"), "infer": str(root / "infer")}


@pytest.fixture(scope="module")
def trained(run_dirs):
    from eo_diffusion_tpu.cli import train as train_cli

    cwd = os.getcwd()
    os.chdir(os.path.dirname(run_dirs["samples"]))
    try:
        args = train_cli.parse_args([
            "--preset", "tiny-latent", "--epochs", "1", "--steps_per_epoch", "3",
            "--batch_size", "8", "--lr", "2e-3", "--ae_steps", "25",
            "--dir", run_dirs["samples"], "--sample_every", "2",
            "--save_every", "3", "--log_freq", "1", "--n_samples", "4",
            "--preview_sampler", "ddim", "--preview_steps", "4",
        ])
        train_cli.main(args)
    finally:
        os.chdir(cwd)
    return os.path.join(os.path.dirname(run_dirs["samples"]), "logs",
                        os.path.basename(run_dirs["samples"]))


class TestLatentTrainCLI:
    def test_first_stage_saved(self, trained):
        ae_dir = os.path.join(trained, "ae")
        assert os.path.isfile(os.path.join(ae_dir, "ae_meta.json"))
        meta = json.load(open(os.path.join(ae_dir, "ae_meta.json")))
        assert meta["scale_factor"] > 0
        assert meta["num_down"] == 1 and meta["latent_channels"] == 4

    def test_checkpoints_written(self, trained):
        assert any(e.startswith("steps_") for e in os.listdir(trained))

    def test_previews_are_pixel_space(self, trained, run_dirs):
        """Periodic previews decode to pixels: the tiny-latent preset is 16px,
        so a 2x2 grid must be 32px, not the 8px latent grid."""
        pngs = [f for f in os.listdir(run_dirs["samples"]) if f.endswith(".png")]
        assert pngs
        with Image.open(os.path.join(run_dirs["samples"], pngs[0])) as im:
            assert min(im.size) >= 16

    def test_ae_reused_on_second_run(self, trained, run_dirs, capsys):
        """A second training run against the same log dir loads the saved
        first stage instead of retraining it."""
        from eo_diffusion_tpu.cli import train as train_cli

        cwd = os.getcwd()
        os.chdir(os.path.dirname(run_dirs["samples"]))
        try:
            args = train_cli.parse_args([
                "--preset", "tiny-latent", "--epochs", "1",
                "--steps_per_epoch", "1", "--batch_size", "8",
                "--dir", run_dirs["samples"], "--sample_every", "100",
                "--save_every", "100", "--preview_sampler", "ddim",
            ])
            train_cli.main(args)
        finally:
            os.chdir(cwd)
        assert "loading first stage" in capsys.readouterr().out


class TestLatentInferenceCLI:
    @pytest.mark.parametrize("sampler,extra", [
        ("ddim", ["--sampler_steps", "4"]),
        ("dpm", ["--sampler_steps", "4"]),
        ("ddpm", []),
    ])
    def test_latent_roundtrip(self, trained, run_dirs, sampler, extra):
        from eo_diffusion_tpu.cli import inference as infer_cli

        step_dirs = sorted(d for d in os.listdir(trained) if d.startswith("steps_"))
        ckpt = os.path.join(trained, step_dirs[-1])
        outdir = os.path.join(run_dirs["infer"], sampler)
        args = infer_cli.parse_args([
            "--preset", "tiny-latent", "--ckpt", ckpt, "--sampler", sampler,
            "--save", "--samples_fid", "--n_iter", "0", "--batch_size", "4",
            "--outdir", outdir, *extra,
        ])
        infer_cli.main(args)
        files = os.listdir(os.path.join(outdir, "samples"))
        assert files
        # decoded samples are pixel-sized (16px), not the 8px latent grid
        with Image.open(os.path.join(outdir, "samples", files[0])) as im:
            assert min(im.size) >= 16

    def test_missing_first_stage_raises(self, trained, run_dirs, tmp_path):
        from eo_diffusion_tpu.cli import inference as infer_cli

        step_dirs = sorted(d for d in os.listdir(trained) if d.startswith("steps_"))
        ckpt = os.path.join(trained, step_dirs[-1])
        args = infer_cli.parse_args([
            "--preset", "tiny-latent", "--ckpt", ckpt,
            "--ae_ckpt", str(tmp_path / "nonexistent"),
            "--n_iter", "0", "--batch_size", "2", "--outdir", str(tmp_path / "o"),
        ])
        with pytest.raises(AssertionError, match="first stage"):
            infer_cli.main(args)

    def test_explicit_ae_ckpt(self, trained, run_dirs, tmp_path):
        """--ae_ckpt points anywhere (decoupled first stage / UNet ckpts)."""
        from eo_diffusion_tpu.cli import inference as infer_cli

        step_dirs = sorted(d for d in os.listdir(trained) if d.startswith("steps_"))
        ckpt = os.path.join(trained, step_dirs[-1])
        outdir = str(tmp_path / "explicit_ae")
        args = infer_cli.parse_args([
            "--preset", "tiny-latent", "--ckpt", ckpt,
            "--ae_ckpt", os.path.join(trained, "ae"),
            "--sampler", "ddim", "--sampler_steps", "3",
            "--save", "--n_iter", "0", "--batch_size", "2", "--outdir", outdir,
        ])
        infer_cli.main(args)
        assert os.listdir(os.path.join(outdir, "samples"))


class TestLatentGuidanceCLI:
    def test_image_cfg_encodes_uncond(self, tmp_path):
        """--guidance_scale on a latent concat preset: the pixel-space zero
        uncond must ride the first stage like cond (review finding — a raw
        pixel uncond would shape-mismatch the latent cond)."""
        from eo_diffusion_tpu.cli import inference as infer_cli
        from eo_diffusion_tpu.cli import train as train_cli

        sample_dir = str(tmp_path / "results")
        cwd = os.getcwd()
        os.chdir(str(tmp_path))
        try:
            train_cli.main(train_cli.parse_args([
                "--preset", "tiny-latent", "--cond_type", "concat",
                "--epochs", "1", "--steps_per_epoch", "3",
                "--batch_size", "8", "--ae_steps", "25",
                "--dir", sample_dir, "--sample_every", "100",
                "--save_every", "3", "--log_freq", "1", "--n_samples", "4",
            ]))
        finally:
            os.chdir(cwd)
        ckpt_root = os.path.join(str(tmp_path), "logs",
                                 os.path.basename(sample_dir))
        steps = sorted(d for d in os.listdir(ckpt_root) if d.startswith("steps_"))
        outdir = str(tmp_path / "infer")
        infer_cli.main(infer_cli.parse_args([
            "--preset", "tiny-latent", "--cond_type", "concat",
            "--ckpt", os.path.join(ckpt_root, steps[-1]),
            "--sampler", "ddim", "--sampler_steps", "5",
            "--guidance_scale", "2.0", "--samples_fid", "--n_iter", "0",
            "--batch_size", "4", "--outdir", outdir,
        ]))
        assert os.listdir(os.path.join(outdir, "samples_fid"))
