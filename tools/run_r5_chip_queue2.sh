#!/usr/bin/env bash
# Round-5 chip queue, part 2 (after run_r5_chip_queue.sh drains):
#   1. evalharden  — rerun after the HTTP-413 fix (threaded param trees)
#   2. mfcfg_3k    — the off-floor MeanFlow-CFG A/B at 3k steps (8k was
#                    still at the harness floor)
#   3. cond_serve  — conditional latent256 serving smoke (euler-2 engine)
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
MARKERS=logs/r5_queue
mkdir -p "$MARKERS" logs/r5

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
  if "$@" > "logs/r5/$name.log" 2>&1; then
    touch "$MARKERS/$name.done"
    echo "== $name OK"
  else
    echo "== $name FAILED (see logs/r5/$name.log)"
    return 1
  fi
}

run_stage evalharden2 python tools/capstone_evalharden.py --stage rescore
run_stage mfcfg_3k python tools/capstone_meanflow_cfg.py --steps 3000 --tag budget3k
run_stage cond_serve python tools/capstone_latent256_cond.py --stage serve --force
echo "r5 queue-2 complete"
