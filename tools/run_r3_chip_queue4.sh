#!/bin/bash
# Round-3 chip queue, pass 4: runs AFTER queue3 releases the chip.
#   ctrl        ControlNet adapter capstone (frozen base + hint branch)
#   tome_phema2 rerun with the fixed autoguidance degraded-model choice
set -u
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
LOGS="$ROOT/logs/r3_queue"
mkdir -p "$LOGS"
export PYTHONPATH="$ROOT:${PYTHONPATH:-}"

echo "[queue4] waiting for queue3 to finish..." | tee -a "$LOGS/queue.log"
until grep -q "\[queue3\] all done" "$LOGS/queue.log" 2>/dev/null; do
  sleep 120
done
echo "[queue4] queue3 done; starting $(date +%H:%M:%S)" | tee -a "$LOGS/queue.log"

run() {
  local name="$1" t="$2"; shift 2
  if [ -f "$LOGS/${name}_DONE" ]; then
    echo "[queue4] $name already done, skipping" | tee -a "$LOGS/queue.log"
    return 0
  fi
  echo "[queue4] START $name $(date +%H:%M:%S)" | tee -a "$LOGS/queue.log"
  if timeout "$t" "$@" >"$LOGS/$name.log" 2>&1; then
    touch "$LOGS/${name}_DONE"
    echo "[queue4] OK $name $(date +%H:%M:%S)" | tee -a "$LOGS/queue.log"
  else
    echo "[queue4] FAIL $name (exit $?) — see $LOGS/$name.log" \
        | tee -a "$LOGS/queue.log"
  fi
}

run ctrl 10800 python "$ROOT/tools/capstone_controlnet.py"
run tome_phema2 10800 python "$ROOT/tools/capstone_tome_phema.py"

echo "[queue4] all done $(date +%H:%M:%S)" | tee -a "$LOGS/queue.log"
