#!/usr/bin/env bash
# Round-5 chip queue (VERDICT r4 "Next round" items), marker-resumable.
#
#   bash tools/run_r5_chip_queue.sh
#
# Stages (one process per training, host-RSS discipline per CLAUDE.md):
#   1. latent_distill — ReFlow few-step distillation ON the latent256
#      production stack (VERDICT item 1, the top-leverage item).
# Later stages are appended as their capstone tools land; re-running the
# script skips *.done markers.
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

run_stage latent_distill python tools/capstone_latent_distill.py
run_stage latent256_cond python tools/capstone_latent256_cond.py
run_stage evalharden python tools/capstone_evalharden.py
run_stage moe python tools/capstone_moe.py
run_stage int8_attn python tools/probe_int8_attn.py
run_stage mfcfg_offfloor python tools/capstone_meanflow_cfg.py --steps 8000 --tag budget8k
# round-2 latent distillation: the round-1 student was refit-limited
# (KID flat ~0.55 across 1-8 NFE); double the pairs, 1.5x the budget
run_stage latent_distill2 python tools/capstone_latent_distill.py \
  --tag round2 --n_pairs 32768 --refit_steps 24000
echo "r5 queue complete (present stages)"
