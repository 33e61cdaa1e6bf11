#!/bin/bash
# Round-3 chip queue, pass 3 (fresh VM: logs/ wiped, so pass-1/2 DONE
# markers and the non-versioned teacher checkpoints are gone; .jax_cache
# survived). Runs ONLY the capstones with no recorded results yet:
#   tome_phema  post-hoc EMA sweep + ToMe curves + UniPC frontier + autoguidance
#   int8        weight-only int8 serving vs bf16 at the 256px protocol
#   edm         EDM preconditioned family (pass-1 transient failure)
#   bridge      Brownian-bridge paired cloud removal vs concat-DDPM
#   restore     DDNM + SDEdit + progressive distillation
#   sr128       full cascade (base checkpoint lost with logs/)
#   dit_flow    teacher retrain (metrics landed in pass 1; reflow needs ckpt)
#   reflow64    ReFlow distillation on the flow64 teacher
#   dit256      256px DiT teacher retrain (ckpt for reflow256)
#   reflow256   ReFlow on the modern-stack 256px configuration
# Safe to re-run; each capstone is skippable via the *_DONE marker files.
set -u
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
LOGS="$ROOT/logs/r3_queue"
mkdir -p "$LOGS"
export PYTHONPATH="$ROOT:${PYTHONPATH:-}"

echo "[queue3] waiting for TPU..." | tee -a "$LOGS/queue.log"
until timeout 180 python -c "import jax; d=jax.devices(); assert d, d" \
    >>"$LOGS/probe.log" 2>&1; do
  echo "[queue3] tpu unreachable $(date +%H:%M:%S); retry in 120s" \
      | tee -a "$LOGS/queue.log"
  sleep 120
done
echo "[queue3] TPU reachable at $(date +%H:%M:%S)" | tee -a "$LOGS/queue.log"

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  if [ -f "$LOGS/${name}_DONE" ]; then
    echo "[queue3] $name already done, skipping" | tee -a "$LOGS/queue.log"
    return 0
  fi
  echo "[queue3] START $name $(date +%H:%M:%S)" | tee -a "$LOGS/queue.log"
  if timeout "$t" "$@" >"$LOGS/$name.log" 2>&1; then
    touch "$LOGS/${name}_DONE"
    echo "[queue3] OK $name $(date +%H:%M:%S)" | tee -a "$LOGS/queue.log"
  else
    echo "[queue3] FAIL $name (exit $?) — see $LOGS/$name.log" \
        | tee -a "$LOGS/queue.log"
  fi
}

# warm-cache sanity probe (also re-validates the headline number on this VM)
run bench 3600 python "$ROOT/bench.py"

# new-feature capstones with zero grounding, cheapest plausible first
run tome_phema 10800 python "$ROOT/tools/capstone_tome_phema.py"
run int8 7200 python "$ROOT/tools/bench_int8.py"
run edm 7200 python "$ROOT/tools/capstone_edm.py" --steps 6000
run bridge 10800 python "$ROOT/tools/capstone_bridge.py"
run restore 10800 python "$ROOT/tools/capstone_restore.py"
run sr128 10800 python "$ROOT/tools/capstone_sr.py"

# teacher retrains + the reflow distillations that need their checkpoints
run dit_flow 10800 python "$ROOT/tools/capstone_dit_flow.py"
run reflow64 7200 python "$ROOT/tools/capstone_reflow.py" --model unet64
run dit256 14400 python "$ROOT/tools/capstone_dit256.py"
run reflow256 10800 python "$ROOT/tools/capstone_reflow.py" --model dit256

echo "[queue3] all done $(date +%H:%M:%S)" | tee -a "$LOGS/queue.log"
