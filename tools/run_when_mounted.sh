#!/usr/bin/env bash
# One-command real-data runbook (VERDICT r4 item 8): probes for the
# published clouds_best.pt, torchvision Inception weights, and real EO
# raster roots, then runs conversion -> notebook demo -> Inception-FID ->
# real-data preset trainings for whatever is mounted. Report lands in
# logs/run_when_mounted/. See tools/run_when_mounted.py for flags/env vars.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
exec python tools/run_when_mounted.py "$@"
