#!/bin/bash
# Round-3 chip queue: wait for the axon TPU tunnel to come back, then run
# the pending on-chip capstones sequentially (one process holds the chip
# at a time). Logs to logs/r3_queue/. Safe to re-run; each capstone is
# skippable via the *_DONE marker files.
set -u
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
LOGS="$ROOT/logs/r3_queue"
mkdir -p "$LOGS"
export PYTHONPATH="$ROOT:${PYTHONPATH:-}"

echo "[queue] waiting for TPU..." | tee -a "$LOGS/queue.log"
until timeout 180 python -c "import jax; d=jax.devices(); assert d, d" \
    >>"$LOGS/probe.log" 2>&1; do
  echo "[queue] tpu unreachable $(date +%H:%M:%S); retry in 120s" \
      | tee -a "$LOGS/queue.log"
  sleep 120
done
echo "[queue] TPU reachable at $(date +%H:%M:%S)" | tee -a "$LOGS/queue.log"

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  if [ -f "$LOGS/${name}_DONE" ]; then
    echo "[queue] $name already done, skipping" | tee -a "$LOGS/queue.log"
    return 0
  fi
  echo "[queue] START $name $(date +%H:%M:%S)" | tee -a "$LOGS/queue.log"
  if timeout "$t" "$@" >"$LOGS/$name.log" 2>&1; then
    touch "$LOGS/${name}_DONE"
    echo "[queue] OK $name $(date +%H:%M:%S)" | tee -a "$LOGS/queue.log"
  else
    echo "[queue] FAIL $name (exit $?) — see $LOGS/$name.log" \
        | tee -a "$LOGS/queue.log"
  fi
}

# cheap first: bench sanity on the warm cache (records nothing, proves the
# chip + cache path before burning capstone time)
run bench 3600 python "$ROOT/bench.py"

# the ZTSNR capstone (2 trainings + 3 sampling configs)
run vpred 7200 python "$ROOT/tools/capstone_vpred.py" --steps 4000

# EDM capstone (1 training + 4 sampling configs)
run edm 7200 python "$ROOT/tools/capstone_edm.py" --steps 6000

# ReFlow distillation: 64px UNet teacher, then the 256px DiT
run reflow64 7200 python "$ROOT/tools/capstone_reflow.py" --model unet64
run reflow256 10800 python "$ROOT/tools/capstone_reflow.py" --model dit256

# consistency distillation capstone (teacher train + distill + eval)
run cm64 10800 python "$ROOT/tools/capstone_cm.py"

# serving overhead at the headline protocol
run serving 3600 python "$ROOT/tools/bench_serving.py"

# super-resolution stage + cascaded generation (base 64px -> SR 128px)
run sr128 10800 python "$ROOT/tools/capstone_sr.py"

# classifier guidance: unconditional denoiser + trained noisy classifier
run clf 10800 python "$ROOT/tools/capstone_clf.py"

# Brownian-bridge paired cloud removal vs the concat-DDPM baseline
run bridge 10800 python "$ROOT/tools/capstone_bridge.py"

# DDNM restoration + SDEdit sweep + progressive distillation (one teacher)
run restore 10800 python "$ROOT/tools/capstone_restore.py"

echo "[queue] all done $(date +%H:%M:%S)" | tee -a "$LOGS/queue.log"
