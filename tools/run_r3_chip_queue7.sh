#!/bin/bash
# Round-3 chip queue, pass 7: the tail of the capstone backlog once
# queue6's flow teacher lands. One training per process (host-feed RSS
# leak — see CLAUDE.md). Order = value per minute:
#   rider_pd     matched-NFE PD control (teacher DDIM-1/2; sampling only)
#   reflow64     ReFlow distillation off the fresh flow64 teacher
#   sr_base      SR capstone base stage (64px DDPM; ckpt lost with logs/)
#   sr_stage     SR capstone 128px stage + cascade
set -u
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
LOGS="$ROOT/logs/r3_queue"
mkdir -p "$LOGS"
export PYTHONPATH="$ROOT:${PYTHONPATH:-}"

echo "[queue7] waiting for queue6 to finish..." | tee -a "$LOGS/queue.log"
until grep -q "\[queue6\] all done" "$LOGS/queue.log" 2>/dev/null; do
  sleep 60
done
echo "[queue7] queue6 done; starting $(date +%H:%M:%S)" | tee -a "$LOGS/queue.log"

run() {
  local name="$1" t="$2"; shift 2
  if [ -f "$LOGS/${name}_DONE" ]; then
    echo "[queue7] $name already done, skipping" | tee -a "$LOGS/queue.log"
    return 0
  fi
  echo "[queue7] START $name $(date +%H:%M:%S)" | tee -a "$LOGS/queue.log"
  if timeout "$t" "$@" >"$LOGS/$name.log" 2>&1; then
    touch "$LOGS/${name}_DONE"
    echo "[queue7] OK $name $(date +%H:%M:%S)" | tee -a "$LOGS/queue.log"
  else
    echo "[queue7] FAIL $name (exit $?) — see $LOGS/$name.log" \
        | tee -a "$LOGS/queue.log"
  fi
}

run rider_pd 1800 python "$ROOT/tools/rider_pd_control.py"
run reflow64_q7 7200 python "$ROOT/tools/capstone_reflow.py" --model unet64
run sr_base 7200 python "$ROOT/tools/capstone_sr.py" --skip_sr
run sr_stage 10800 python "$ROOT/tools/capstone_sr.py" --skip_base

echo "[queue7] all done $(date +%H:%M:%S)" | tee -a "$LOGS/queue.log"
