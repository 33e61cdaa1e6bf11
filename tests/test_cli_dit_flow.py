"""CLI round-trips for the beyond-reference axes: the DiT backbone preset
and the rectified-flow process preset, train -> checkpoint -> inference
through the argparse entry points."""

import os

import pytest


@pytest.fixture(scope="module")
def run_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli_dit_flow")
    return {
        "dit_samples": str(root / "results_dit"),
        "flow_samples": str(root / "results_flow"),
        "infer": str(root / "infer"),
        "root": str(root),
    }


def _train(preset, sample_dir):
    from eo_diffusion_tpu.cli import train as train_cli

    cwd = os.getcwd()
    os.chdir(os.path.dirname(sample_dir))
    try:
        args = train_cli.parse_args([
            "--preset", preset, "--epochs", "1", "--steps_per_epoch", "3",
            "--batch_size", "8", "--lr", "2e-3",
            "--dir", sample_dir, "--sample_every", "2",
            "--save_every", "3", "--log_freq", "1", "--n_samples", "4",
        ])
        train_cli.main(args)
    finally:
        os.chdir(cwd)
    ckpt_root = os.path.join(os.path.dirname(sample_dir), "logs",
                             os.path.basename(sample_dir))
    steps = sorted(d for d in os.listdir(ckpt_root) if d.startswith("steps_"))
    assert steps, ckpt_root
    return os.path.join(ckpt_root, steps[-1])


@pytest.fixture(scope="module")
def dit_ckpt(run_dirs):
    return _train("tiny-dit", run_dirs["dit_samples"])


@pytest.fixture(scope="module")
def flow_ckpt(run_dirs):
    return _train("tiny-flow", run_dirs["flow_samples"])


class TestDiTCLI:
    def test_preview_grids_written(self, dit_ckpt, run_dirs):
        pngs = [f for f in os.listdir(run_dirs["dit_samples"]) if f.endswith(".png")]
        assert pngs, "DiT training produced no preview grid"

    @pytest.mark.parametrize("sampler,extra", [
        ("ddim", ["--sampler_steps", "5"]),
        ("dpm", ["--sampler_steps", "5"]),
        # ToMe (ops/tome.py) is parameter-free: the same trained checkpoint
        # loads and samples under the merged config (arXiv:2303.17604)
        ("ddim", ["--sampler_steps", "5", "--tome_ratio", "0.25",
                  "--tome_mlp"]),
    ])
    def test_inference_roundtrip(self, dit_ckpt, run_dirs, sampler, extra):
        from eo_diffusion_tpu.cli import inference as infer_cli

        outdir = os.path.join(run_dirs["infer"], f"dit_{sampler}")
        args = infer_cli.parse_args([
            "--preset", "tiny-dit", "--ckpt", dit_ckpt, "--sampler", sampler,
            "--save", "--samples_fid", "--n_iter", "0", "--batch_size", "4",
            "--outdir", outdir, *extra,
        ])
        infer_cli.main(args)
        assert os.listdir(os.path.join(outdir, "samples_fid"))

    def test_deepcache_rejected_for_dit(self, dit_ckpt, run_dirs):
        from eo_diffusion_tpu.cli import inference as infer_cli

        args = infer_cli.parse_args([
            "--preset", "tiny-dit", "--ckpt", dit_ckpt, "--deepcache", "2",
            "--n_iter", "0", "--batch_size", "2",
            "--outdir", os.path.join(run_dirs["infer"], "dit_dc"),
        ])
        with pytest.raises(AssertionError, match="DeepCache"):
            infer_cli.main(args)


class TestLatentFlowCLI:
    """Latent rectified flow: FlowMatching inside LatentDiffusion, through
    the CLIs (first stage trained in-run, ODE sampling in latent space)."""

    def test_train_infer_roundtrip(self, run_dirs):
        from eo_diffusion_tpu.cli import inference as infer_cli

        sample_dir = os.path.join(run_dirs["root"], "results_lflow")
        ckpt = _train("tiny-latent-flow", sample_dir)
        outdir = os.path.join(run_dirs["infer"], "latent_flow")
        args = infer_cli.parse_args([
            "--preset", "tiny-latent-flow", "--ckpt", ckpt,
            "--sampler_steps", "6", "--save", "--samples_fid",
            "--n_iter", "0", "--batch_size", "4", "--outdir", outdir,
        ])
        infer_cli.main(args)
        assert os.listdir(os.path.join(outdir, "samples_fid"))

    def test_latent_cr_roundtrip(self, run_dirs):
        """tiny-latent-cr: the conditional production recipe (VERDICT r4
        item 2, tools/capstone_latent256_cond.py) at tiny scale — cloudy
        view first-stage-encoded + channel-concatenated to the noisy
        latent, DiT + rectified flow, through the CLIs."""
        from eo_diffusion_tpu.cli import inference as infer_cli

        sample_dir = os.path.join(run_dirs["root"], "results_lcr")
        ckpt = _train("tiny-latent-cr", sample_dir)
        outdir = os.path.join(run_dirs["infer"], "latent_cr")
        args = infer_cli.parse_args([
            "--preset", "tiny-latent-cr", "--ckpt", ckpt,
            "--sampler_steps", "4", "--save", "--samples_fid",
            "--n_iter", "0", "--batch_size", "4", "--outdir", outdir,
        ])
        infer_cli.main(args)
        assert os.listdir(os.path.join(outdir, "samples_fid"))

    def test_latent_dit_roundtrip(self, run_dirs):
        """The latent256 production recipe at tiny scale (VERDICT r4 item
        2): f4 ConvAE first stage + DiT + rectified flow on the latent
        grid, trained and sampled through the CLIs."""
        from eo_diffusion_tpu.cli import inference as infer_cli

        sample_dir = os.path.join(run_dirs["root"], "results_ldit")
        ckpt = _train("tiny-latent-dit", sample_dir)
        outdir = os.path.join(run_dirs["infer"], "latent_dit")
        args = infer_cli.parse_args([
            "--preset", "tiny-latent-dit", "--ckpt", ckpt,
            "--sampler_steps", "4", "--save", "--samples_fid",
            "--n_iter", "0", "--batch_size", "4", "--outdir", outdir,
        ])
        infer_cli.main(args)
        assert os.listdir(os.path.join(outdir, "samples_fid"))


class TestFlowCLI:
    def test_sdedit_roundtrip(self, flow_ckpt, run_dirs):
        """SDEdit on the flow stack: the Euler tail from the partially
        noised source (diffusion/edit.py)."""
        from eo_diffusion_tpu.cli import inference as infer_cli

        outdir = os.path.join(run_dirs["infer"], "flow_sdedit")
        args = infer_cli.parse_args([
            "--preset", "tiny-flow", "--ckpt", flow_ckpt,
            "--sampler_steps", "6", "--sdedit_strength", "0.5",
            "--save", "--samples_fid", "--n_iter", "0", "--batch_size", "4",
            "--outdir", outdir,
        ])
        infer_cli.main(args)
        assert os.listdir(os.path.join(outdir, "samples_fid"))

    def test_preview_grids_written(self, flow_ckpt, run_dirs):
        pngs = [f for f in os.listdir(run_dirs["flow_samples"]) if f.endswith(".png")]
        assert pngs, "flow training produced no preview grid"

    def test_sum_inpainting_roundtrip(self, flow_ckpt, run_dirs):
        """Cloud-removal use-case on the flow stack: cond_type=sum maps to
        FlowMatching.sample's mask/x0 RePaint path through the CLI."""
        from eo_diffusion_tpu.cli import inference as infer_cli

        outdir = os.path.join(run_dirs["infer"], "flow_sum")
        args = infer_cli.parse_args([
            "--preset", "tiny-flow", "--ckpt", flow_ckpt,
            "--cond_type", "sum", "--metrics",
            "--sampler_steps", "6", "--save", "--samples_fid",
            "--n_iter", "0", "--batch_size", "4", "--outdir", outdir,
        ])
        infer_cli.main(args)
        assert os.path.exists(os.path.join(outdir, "metrics.txt"))

    @pytest.mark.parametrize("method,extra", [
        ("euler", []),
        ("heun", []),
        # DeepCache's stateful-model hook rides the flow ODE loop too
        ("euler", ["--deepcache", "2"]),
    ])
    def test_inference_roundtrip(self, flow_ckpt, run_dirs, method, extra):
        from eo_diffusion_tpu.cli import inference as infer_cli

        name = f"flow_{method}" + ("_dc" if extra else "")
        outdir = os.path.join(run_dirs["infer"], name)
        # --sampler ddpm is overridden to flow by the preset's process
        args = infer_cli.parse_args([
            "--preset", "tiny-flow", "--ckpt", flow_ckpt,
            "--sampler_steps", "6", "--flow_method", method,
            "--save", "--samples_fid", "--n_iter", "0", "--batch_size", "4",
            "--outdir", outdir, *extra,
        ])
        infer_cli.main(args)
        assert os.listdir(os.path.join(outdir, "samples_fid"))
