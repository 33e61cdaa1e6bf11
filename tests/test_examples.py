"""Smoke tests for the four examples/ demo scripts (VERDICT r3 weak #5).

Each demo has a --smoke/--synthetic data-free mode (tiny model, 16px
scenes); the tests subprocess-run them exactly as a user would and assert
the documented output artifacts appear. These guard the demos' imports and
argument surface against package refactors — the full-size recipes are
exercised by the chip capstones.
"""

import os
import subprocess
import sys

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def _run(script, args, tmp_path):
    out = str(tmp_path / "out")
    proc = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, script), "--out", out] + args,
        capture_output=True, text=True, timeout=900,
        cwd=str(tmp_path), env=os.environ.copy(),
    )
    assert proc.returncode == 0, (
        f"{script} failed:\n--- stdout ---\n{proc.stdout[-3000:]}\n"
        f"--- stderr ---\n{proc.stderr[-3000:]}")
    return out


@pytest.mark.parametrize("script,args,artifacts", [
    ("cloud_removal_demo.py",
     ["--synthetic", "--smoke", "--ddim", "5"],
     ["input_cloudy.png", "cloud_mask.png", "cloud_removed.png"]),
    ("change_pair_demo.py",
     ["--synthetic", "--smoke"],
     ["before.png", "after_generated.png"]),
    ("inpainting_demo.py",
     ["--synthetic", "--smoke", "--sampler", "ddim"],
     ["original.png", "replan_region.png", "replanned.png"]),
    ("modern_stack_demo.py",
     ["--smoke", "--sample_steps", "2"],
     ["samples_heun2.png"]),
])
def test_demo_smoke(script, args, artifacts, tmp_path):
    out = _run(script, args, tmp_path)
    for name in artifacts:
        path = os.path.join(out, name)
        assert os.path.isfile(path) and os.path.getsize(path) > 0, (
            f"{script} did not write {name}")
