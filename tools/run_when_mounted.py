"""One-command real-data runbook (VERDICT r4 next-round item 8).

The three environment-blocked parity items (VERDICT "What's missing" #1-3)
should cost zero thinking the day the artifacts appear. This tool probes
for them and executes, in dependency order, whatever is actually mounted:

  1. convert        — the published ``clouds_best.pt``
                      (/root/reference/README.md:11) through
                      eo_diffusion_tpu.tools.convert_ckpt (plan-driven,
                      parity-tested on generated checkpoints).
  2. demo           — notebook-parity sampling from the converted
                      checkpoint via cli.inference (the notebook's cell-4
                      demo, EO_Diffusion_TPU.ipynb).
  3. inception_fid  — cli.evaluate --extractor inception when torchvision
                      InceptionV3 weights are mounted
                      (/root/reference/script_utils/evaluate_metrics.py:3-17;
                      loader: models/inception.py, EO_INCEPTION_WEIGHTS).
  4. train_inria / train_cmc / train_sen12 — short preset trainings on
                      whichever real raster roots exist (Inria 5000² tiles,
                      Sentinel-2 CMC .npy, SEN12MS-CR GeoTIFFs —
                      /root/reference/data_utils/data_load.py:159-207,
                      400-445, sen12ms_cr_dataLoader.py:118-136).

Everything not mounted is recorded as ``skipped`` (with the probed paths),
and one report (JSON + markdown) lands in ``logs/run_when_mounted/``.

Usage:
  python tools/run_when_mounted.py [--dry_run] [--smoke]
      [--clouds_pt P] [--inception P] [--inria_root P] [--cmc_root P]
      [--sen12_root P] [--report_dir P] [--preset clouds64-attn]

Env fallbacks: EO_CLOUDS_PT, EO_INCEPTION_WEIGHTS, EO_INRIA_ROOT,
EO_CMC_ROOT, EO_SEN12_ROOT.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _probe(explicit, env_var, candidates, is_dir=False):
    """First existing path among explicit > $env > defaults (None if none)."""
    opts = ([explicit] if explicit else []) + \
        ([os.environ[env_var]] if os.environ.get(env_var) else []) + \
        list(candidates)
    for p in opts:
        for hit in sorted(glob.glob(os.path.expanduser(p))):
            if os.path.isdir(hit) if is_dir else os.path.isfile(hit):
                return hit
    return None


def parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--clouds_pt", default=None)
    ap.add_argument("--inception", default=None)
    ap.add_argument("--inria_root", default=None)
    ap.add_argument("--cmc_root", default=None)
    ap.add_argument("--sen12_root", default=None)
    ap.add_argument("--preset", default="clouds64-attn",
                    help="preset the .pt checkpoint was trained as")
    ap.add_argument("--report_dir",
                    default=os.path.join(ROOT, "logs", "run_when_mounted"))
    ap.add_argument("--dry_run", action="store_true",
                    help="probe + print the plan; execute nothing")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny budgets (fixture tests)")
    return ap.parse_args(argv)


def probe_all(args):
    return {
        "clouds_pt": _probe(args.clouds_pt, "EO_CLOUDS_PT", [
            "/root/data/clouds_best.pt",
            "/root/reference/clouds_best.pt",
            "/root/reference/checkpoints/clouds_best.pt",
            os.path.join(ROOT, "data", "clouds_best.pt")]),
        "inception": _probe(args.inception, "EO_INCEPTION_WEIGHTS", [
            "~/.cache/torch/hub/checkpoints/inception_v3_google-*.pth"]),
        "inria_root": _probe(args.inria_root, "EO_INRIA_ROOT", [
            os.path.join(ROOT, "..", "EO-Diffusion", "data",
                         "AerialImageDataset"),
            "/root/data/AerialImageDataset"], is_dir=True),
        "cmc_root": _probe(args.cmc_root, "EO_CMC_ROOT", [
            os.path.join(ROOT, "..", "data", "Sentinel-2-CMC"),
            "/root/data/Sentinel-2-CMC"], is_dir=True),
        "sen12_root": _probe(args.sen12_root, "EO_SEN12_ROOT", [
            os.path.join(ROOT, "..", "data", "SEN12MS_CR"),
            "/root/data/SEN12MS_CR"], is_dir=True),
    }


def _run(report, name, cmd, cwd=ROOT):
    env = dict(os.environ)
    env["PYTHONPATH"] = ROOT + os.pathsep + env.get("PYTHONPATH", "")
    t0 = time.time()
    r = subprocess.run(cmd, cwd=cwd, env=env, capture_output=True, text=True)
    tail = (r.stdout + r.stderr).strip().splitlines()[-8:]
    report[name] = {"status": "ok" if r.returncode == 0 else "failed",
                    "cmd": " ".join(cmd), "wall_s": round(time.time() - t0, 1),
                    "tail": tail}
    print(f"[{name}] {'OK' if r.returncode == 0 else 'FAILED'} "
          f"({report[name]['wall_s']}s)", flush=True)
    return r.returncode == 0


def main(argv=None):
    args = parse_args(argv)
    paths = probe_all(args)
    os.makedirs(args.report_dir, exist_ok=True)
    report = {"probed": paths, "dry_run": bool(args.dry_run)}
    py = sys.executable

    plan = []
    converted = os.path.join(args.report_dir, "clouds_best_converted")
    samples = os.path.join(args.report_dir, "demo")
    if paths["clouds_pt"]:
        plan.append(("convert", [py, "-m",
                                 "eo_diffusion_tpu.tools.convert_ckpt",
                                 paths["clouds_pt"], converted,
                                 "--preset", args.preset]))
        # the inference CLI loads reference .pt files natively
        # (tools/convert_ckpt.load_torch_checkpoint); the convert stage's
        # Orbax artifact is for the trainers/serving
        plan.append(("demo", [py, "-m", "eo_diffusion_tpu.cli.inference",
                              "--preset", args.preset,
                              "--ckpt", paths["clouds_pt"],
                              "--sampler", "ddim", "--sampler_steps",
                              "5" if args.smoke else "50",
                              "--batch_size", "4", "--n_iter", "0",
                              "--save", "--samples_fid",
                              "--outdir", samples]
                     + (["--no_bf16"] if args.smoke else [])))
    if paths["inception"] and paths["clouds_pt"] and paths["cmc_root"]:
        # cli.evaluate consumes PNG dirs; export the real side from the
        # mounted Sentinel-2 CMC database first
        real_png = os.path.join(args.report_dir, "real_png")
        export_code = (
            "import os,sys,numpy as np;from PIL import Image;"
            "from eo_diffusion_tpu.data.factories import create_cloud_dataloaders;"
            f"tr,_=create_cloud_dataloaders(1,return_dataset=True,root={paths['cmc_root']!r});"
            f"os.makedirs({real_png!r},exist_ok=True);"
            "n=min(len(tr),256);"
            "[Image.fromarray((np.clip(tr[i]['image'],0,1)*255).astype('uint8'))"
            f".save(os.path.join({real_png!r},f'{{i:04d}}.png')) for i in range(n)]"
        )
        plan.append(("export_real", [py, "-c", export_code]))
        plan.append(("inception_fid",
                     [py, "-m", "eo_diffusion_tpu.cli.evaluate",
                      "--real", real_png,
                      "--fake", os.path.join(samples, "samples_fid"),
                      "--extractor", "inception",
                      "--inception_weights", paths["inception"],
                      "--out", os.path.join(args.report_dir,
                                            "inception_fid.json")]))
    trains = [("train_inria", "inria_root", "inria64"),
              ("train_cmc", "cmc_root", args.preset),
              ("train_sen12", "sen12_root", "sen12mscr256")]
    for name, key, preset in trains:
        if paths[key]:
            plan.append((name, [py, "-m", "eo_diffusion_tpu.cli.train",
                                "--preset", preset, "--epochs", "1",
                                "--steps_per_epoch",
                                "3" if args.smoke else "500",
                                "--dir", os.path.join(args.report_dir, name),
                                "--data_root", paths[key]]))

    for name, _key, _p in trains:
        if not paths[_key]:
            report[name] = {"status": "skipped", "reason": f"{_key} not mounted"}
    if not paths["clouds_pt"]:
        report["convert"] = report["demo"] = {
            "status": "skipped", "reason": "clouds_best.pt not mounted"}
    if not (paths["inception"] and paths["clouds_pt"] and paths["cmc_root"]):
        report["inception_fid"] = {"status": "skipped",
                                   "reason": "needs inception weights + "
                                             "clouds_best.pt + the CMC "
                                             "dataset all mounted"}

    if args.dry_run:
        report["plan"] = [{"stage": n, "cmd": " ".join(c)} for n, c in plan]
        print(json.dumps(report, indent=2))
    else:
        for name, cmd in plan:
            ok = _run(report, name, cmd)
            if name == "convert" and not ok:
                break  # everything downstream needs the converted ckpt

    with open(os.path.join(args.report_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    lines = ["# run_when_mounted report", ""]
    for k, v in report.items():
        if isinstance(v, dict) and "status" in v:
            lines.append(f"- **{k}**: {v['status']}"
                         + (f" — {v.get('reason', '')}"
                            if v.get("reason") else ""))
    with open(os.path.join(args.report_dir, "report.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"report -> {args.report_dir}/report.json")
    return report


if __name__ == "__main__":
    main()
