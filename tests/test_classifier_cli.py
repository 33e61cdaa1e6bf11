"""Classifier-guidance CLI surface: train a noisy-image classifier, then
sample with --classifier_ckpt/--classifier_scale through the inference CLI
(reference capability: vendored EncoderUNetModel, backbones/unet.py:845+,
never trained or wired there)."""

import os

import numpy as np
import pytest


class TestTrainClassifierCLI:
    def test_train_and_eval(self, tmp_path):
        from eo_diffusion_tpu.cli import train_classifier as tc

        d = str(tmp_path / "clf")
        meta = tc.main(tc.parse_args([
            "--preset", "tiny", "--steps", "30", "--batch_size", "16",
            "--class_correlated", "--dir", d, "--eval_n", "32",
        ]))
        assert meta["num_classes"] == 5
        assert all(np.isfinite(v) for v in meta["eval_acc"].values())
        assert os.path.isdir(os.path.join(d, "classifier"))
        assert os.path.isfile(os.path.join(d, "classifier.json"))

    def test_non_ddpm_preset_rejected(self):
        from eo_diffusion_tpu.cli import train_classifier as tc

        with pytest.raises(AssertionError, match="DDPM"):
            tc.main(tc.parse_args(["--preset", "tiny-flow"]))


class TestGuidedInferenceCLI:
    def test_train_classifier_guide_sampling(self, tmp_path):
        """Full loop: denoiser + classifier trained on the correlated
        fixture, then guided sampling through the inference CLI; the
        guided run must produce finite PNGs and differ from unguided."""
        from eo_diffusion_tpu.cli import inference as infer_cli
        from eo_diffusion_tpu.cli import train as train_cli
        from eo_diffusion_tpu.cli import train_classifier as tc

        cwd = os.getcwd()
        os.chdir(str(tmp_path))
        try:
            train_cli.main(train_cli.parse_args([
                "--preset", "tiny", "--epochs", "1", "--steps_per_epoch",
                "3", "--batch_size", "8", "--dir", "res_g",
                "--sample_every", "0", "--save_every", "3",
                "--log_freq", "1",
            ]))
            ckpt_root = os.path.join(str(tmp_path), "logs", "res_g")
            step = sorted(d for d in os.listdir(ckpt_root)
                          if d.startswith("steps_"))[-1]
            clf_dir = str(tmp_path / "clf")
            tc.main(tc.parse_args([
                "--preset", "tiny", "--steps", "10", "--batch_size", "16",
                "--class_correlated", "--dir", clf_dir, "--eval_n", "16",
            ]))

            outs = {}
            for tag, extra in (("guided", ["--classifier_ckpt", clf_dir,
                                           "--classifier_scale", "5.0"]),
                               ("plain", [])):
                outdir = str(tmp_path / f"infer_{tag}")
                infer_cli.main(infer_cli.parse_args([
                    "--preset", "tiny", "--ckpt",
                    os.path.join(ckpt_root, step),
                    "--sampler", "ddim", "--sampler_steps", "4",
                    "--save", "--n_iter", "0",
                    "--batch_size", "4", "--outdir", outdir, *extra,
                ]))
                import PIL.Image
                pngs = sorted(os.path.join(r, f)
                              for r, _, fs in os.walk(outdir)
                              for f in fs if f.endswith(".png"))
                assert pngs, tag
                outs[tag] = np.asarray(PIL.Image.open(pngs[0]), np.float32)
                assert np.isfinite(outs[tag]).all()
            # same seed, same denoiser: the classifier gradient must move
            # the samples
            assert not np.array_equal(outs["guided"], outs["plain"])
        finally:
            os.chdir(cwd)

    def test_classifier_scale_requires_ckpt(self):
        from eo_diffusion_tpu.cli import inference as infer_cli

        with pytest.raises(AssertionError, match="classifier_ckpt"):
            infer_cli.main(infer_cli.parse_args([
                "--preset", "tiny", "--classifier_scale", "2.0",
                "--num_classes", "5", "--n_iter", "0",
            ]))
