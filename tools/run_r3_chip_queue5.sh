#!/bin/bash
# Round-3 chip queue, pass 5: recovery from the host-feed OOM class
# (per-step batches through the axon tunnel leak ~6-25 MB/step of host
# RSS; two-training processes die ~124 GB — PERF.md). Every stage here
# runs ONE training per process:
#   bridge_rest   concat-DDPM baseline (bridge json merges; bridge ckpt saved)
#   bridge_scene  1024px one-pass scene translation (sampling only)
#   dit_flow_dit  DiT-S/4 teacher (preempted in queue3)
#   dit_flow_flow flow UNet teacher (reflow64's teacher)
#   sr_base       SR capstone base stage (preempted in queue3)
#   sr_stage      SR capstone 128px stage + cascade
#   reflow64      rerun (queue3's copy failed fast on the missing teacher)
set -u
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
LOGS="$ROOT/logs/r3_queue"
mkdir -p "$LOGS"
export PYTHONPATH="$ROOT:${PYTHONPATH:-}"

echo "[queue5] waiting for queue4 to finish..." | tee -a "$LOGS/queue.log"
until grep -q "\[queue4\] all done" "$LOGS/queue.log" 2>/dev/null; do
  sleep 120
done
echo "[queue5] queue4 done; starting $(date +%H:%M:%S)" | tee -a "$LOGS/queue.log"

run() {
  local name="$1" t="$2"; shift 2
  if [ -f "$LOGS/${name}_DONE" ]; then
    echo "[queue5] $name already done, skipping" | tee -a "$LOGS/queue.log"
    return 0
  fi
  echo "[queue5] START $name $(date +%H:%M:%S)" | tee -a "$LOGS/queue.log"
  if timeout "$t" "$@" >"$LOGS/$name.log" 2>&1; then
    touch "$LOGS/${name}_DONE"
    echo "[queue5] OK $name $(date +%H:%M:%S)" | tee -a "$LOGS/queue.log"
  else
    echo "[queue5] FAIL $name (exit $?) — see $LOGS/$name.log" \
        | tee -a "$LOGS/queue.log"
  fi
}

run bridge_rest 7200 python "$ROOT/tools/capstone_bridge.py" \
    --skip_bridge --skip_scene
run bridge_scene 3600 python "$ROOT/tools/capstone_bridge.py" \
    --skip_bridge --skip_baseline
run dit_flow_dit 7200 python "$ROOT/tools/capstone_dit_flow.py" --only dit
run dit_flow_flow 7200 python "$ROOT/tools/capstone_dit_flow.py" --only flow
run sr_base 7200 python "$ROOT/tools/capstone_sr.py" --skip_sr
run sr_stage 7200 python "$ROOT/tools/capstone_sr.py" --skip_base
run reflow64_q5 7200 python "$ROOT/tools/capstone_reflow.py" --model unet64

echo "[queue5] all done $(date +%H:%M:%S)" | tee -a "$LOGS/queue.log"
