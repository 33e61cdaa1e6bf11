"""Real-data runbook dry-run (tools/run_when_mounted.py, VERDICT r4 item
8): with a fixture .pt checkpoint the convert+demo stages execute end to
end; unmounted artifacts are recorded as skipped."""

import json
import os
import sys

import numpy as np
import pytest

pytest.importorskip("torch")

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))
import run_when_mounted as rwm  # noqa: E402


def _make_fixture_pt(path):
    """A tiny torch checkpoint in the reference's on-disk format, generated
    through the INVERSE converter (params_to_state_dict) like
    tests/test_convert.py does."""
    import torch

    import jax
    import jax.numpy as jnp

    from eo_diffusion_tpu.cli.presets import get_preset
    from eo_diffusion_tpu.models.unet import UNet
    from eo_diffusion_tpu.tools.convert_ckpt import params_to_state_dict

    preset = get_preset("tiny")
    cfg = preset.unet_config(bf16=False)
    model = UNet(cfg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, cfg.image_size, cfg.image_size,
                                          cfg.in_channels)),
        jnp.zeros((1,), jnp.int32))
    rng = np.random.default_rng(0)
    params = jax.tree.map(
        lambda p: jnp.asarray(rng.normal(0, 0.05, p.shape), p.dtype), params)
    sd = params_to_state_dict(jax.device_get(params), cfg)
    torch.save({"model": {"model." + k: torch.from_numpy(np.asarray(v))
                          for k, v in sd.items()},
                "model_ema": {"module.model." + k:
                              torch.from_numpy(np.asarray(v))
                              for k, v in sd.items()}}, path)


class TestRunbook:
    def test_probe_nothing_mounted(self, tmp_path):
        """No artifacts anywhere -> every stage skipped, report written."""
        args = ["--report_dir", str(tmp_path / "rep"),
                "--clouds_pt", str(tmp_path / "nope.pt"),
                "--inria_root", str(tmp_path / "no_dir"),
                "--cmc_root", str(tmp_path / "no_dir"),
                "--sen12_root", str(tmp_path / "no_dir"),
                "--inception", str(tmp_path / "no.pth")]
        env_clear = {}
        for k in ("EO_CLOUDS_PT", "EO_INCEPTION_WEIGHTS", "EO_INRIA_ROOT",
                  "EO_CMC_ROOT", "EO_SEN12_ROOT"):
            env_clear[k] = os.environ.pop(k, None)
        try:
            report = rwm.main(args)
        finally:
            for k, v in env_clear.items():
                if v is not None:
                    os.environ[k] = v
        for stage in ("convert", "demo", "inception_fid", "train_inria",
                      "train_cmc", "train_sen12"):
            assert report[stage]["status"] == "skipped", (stage, report[stage])
        assert os.path.exists(str(tmp_path / "rep" / "report.json"))

    @pytest.mark.smoke
    def test_dry_run_plans_convert(self, tmp_path):
        """Fixture .pt present -> dry run plans convert+demo, executes
        nothing."""
        pt = str(tmp_path / "clouds_best.pt")
        _make_fixture_pt(pt)
        report = rwm.main(["--report_dir", str(tmp_path / "rep"),
                           "--clouds_pt", pt, "--preset", "tiny",
                           "--dry_run", "--smoke"])
        stages = [p["stage"] for p in report["plan"]]
        assert stages[:2] == ["convert", "demo"]
        assert not os.path.exists(
            str(tmp_path / "rep" / "clouds_best_converted"))

    def test_convert_and_demo_execute(self, tmp_path):
        """The real execution path on the fixture checkpoint: conversion
        produces an Orbax dir; the demo stage samples from it."""
        pt = str(tmp_path / "clouds_best.pt")
        _make_fixture_pt(pt)
        rep_dir = str(tmp_path / "rep")
        report = rwm.main(["--report_dir", rep_dir, "--clouds_pt", pt,
                           "--preset", "tiny", "--smoke"])
        assert report["convert"]["status"] == "ok", report["convert"]
        assert report["demo"]["status"] == "ok", report["demo"]
        out = json.load(open(os.path.join(rep_dir, "report.json")))
        assert out["convert"]["status"] == "ok"
        sample_dir = os.path.join(rep_dir, "demo", "samples_fid")
        assert os.listdir(sample_dir)
