#!/usr/bin/env bash
# Round-4 chip queue: runs the remaining r4 capstones sequentially, one
# process per training (host-RSS discipline, CLAUDE.md), with marker files
# so a restart resumes where it left off.
#
#   bash tools/run_r4_chip_queue.sh
#
# Stages:
#   1. evalregime cfg re-run (grad-clip fix; --force replaces the diverged
#      entry)
#   2. capstone_guided        (guidance distillation, item 3)
#   3. capstone_meanflow_cfg  (CFG-integrated MeanFlow 30k, item 5)
#   4. capstone_latent256     (the production LDM config, item 2)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
MARKERS=logs/r4_queue
mkdir -p "$MARKERS" logs/r4

wait_for_tpu() {
  for i in $(seq 1 60); do
    if timeout 120 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then
      return 0
    fi
    echo "tpu not reachable, retry $i/60"; sleep 60
  done
  echo "giving up waiting for the tpu"; exit 1
}

run_stage() {
  local name="$1"; shift
  if [ -f "$MARKERS/$name.done" ]; then
    echo "== $name already done, skipping"
    return 0
  fi
  echo "== $name: $*"
  wait_for_tpu
  if "$@" > "logs/r4/$name.log" 2>&1; then
    touch "$MARKERS/$name.done"
    echo "== $name OK"
  else
    echo "== $name FAILED (see logs/r4/$name.log)"
    return 1
  fi
}

run_stage cfg_rerun python tools/capstone_evalregime.py --stage cfg --force
run_stage guided python tools/capstone_guided.py
run_stage meanflow_cfg python tools/capstone_meanflow_cfg.py --steps 30000
run_stage latent256 python tools/capstone_latent256.py
echo "r4 queue complete"
