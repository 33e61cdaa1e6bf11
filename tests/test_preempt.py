"""Preemption-safe training (SURVEY.md §5 failure-recovery row,
beyond-reference: the reference's only recovery is a manual --ckpt restart
that loses opt state/step, reference train.py:94-98).

SIGTERM mid-run -> the CLI finishes the in-flight step, writes a clean
checkpoint, and exits 0; a --resume rerun rendezvouses with the saved step
counter and continues to completion."""

import os
import re
import signal
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env():
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_"))}
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = _REPO
    return env


def _train_cmd(steps_per_epoch, epochs, extra=()):
    return [sys.executable, "-m", "eo_diffusion_tpu.cli.train",
            "--preset", "tiny", "--steps_per_epoch", str(steps_per_epoch),
            "--epochs", str(epochs), "--batch_size", "8", "--lr", "1e-3",
            "--dir", "samples", "--sample_every", "0", "--save_every", "0",
            "--log_freq", "1", *extra]


def test_sigterm_checkpoints_and_resume_continues(tmp_path):
    # phase 1: a long run, preempted after a few steps
    p = subprocess.Popen(_train_cmd(20, 1000), cwd=tmp_path, env=_env(),
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
    lines = []
    deadline = time.time() + 420
    stepped = 0
    for line in p.stdout:
        lines.append(line)
        if re.search(r"Step\[\d+/", line):
            stepped += 1
            if stepped >= 3:
                break
        assert time.time() < deadline, "".join(lines[-30:])
    p.send_signal(signal.SIGTERM)
    rest, _ = p.communicate(timeout=300)
    lines.append(rest)
    out = "".join(lines)
    assert p.returncode == 0, out[-3000:]
    m = re.search(r"preempted \(signal 15\): checkpoint saved at step (\d+)",
                  out)
    assert m, out[-3000:]
    saved_step = int(m.group(1))
    assert saved_step >= 3

    ckpt_root = os.path.join(tmp_path, "logs", "samples")
    step_dirs = [d for d in os.listdir(ckpt_root) if d.startswith("steps_")]
    assert f"steps_{saved_step:08d}" in step_dirs, (step_dirs, saved_step)

    # phase 2: --resume picks the checkpoint up and runs to a completion
    # bound strictly beyond the preempted step (step counter preserved)
    epochs = saved_step // 20 + 1
    r = subprocess.run(_train_cmd(20, epochs, extra=("--resume",)),
                       cwd=tmp_path, env=_env(), capture_output=True,
                       text=True, timeout=420)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-2000:]
    assert "auto-resume: found" in r.stdout, r.stdout[-2000:]
    m = re.search(r"done: (\d+) steps", r.stdout)
    assert m, r.stdout[-2000:]
    final = int(m.group(1))
    # resume granularity is epochs: the partially-run epoch restarts, so the
    # counter continues FROM the saved step and adds whole epochs on top
    expect = saved_step + (epochs - saved_step // 20) * 20
    assert final == expect and final > saved_step, (final, expect, saved_step)
