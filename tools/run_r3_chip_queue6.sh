#!/bin/bash
# Round-3 chip queue, pass 6: recovery after the 13:00 VM restart killed
# queue3 mid-restore (DDNM+SDEdit measured; PD stage pending) and left
# queue5's stages unstarted. One training per process (host-feed RSS
# leak — see CLAUDE.md). Order = value per minute with ~1h of round left:
#   restore_pd    PD halving rounds on the saved restore_teacher ckpt
#   bridge_rest   concat-DDPM baseline (bridge ckpt saved in queue3)
#   bridge_scene  1024px one-pass scene translation (sampling only)
#   dit_flow_*    teachers (best-effort; long)
set -u
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
LOGS="$ROOT/logs/r3_queue"
mkdir -p "$LOGS"
export PYTHONPATH="$ROOT:${PYTHONPATH:-}"

run() {
  local name="$1" t="$2"; shift 2
  if [ -f "$LOGS/${name}_DONE" ]; then
    echo "[queue6] $name already done, skipping" | tee -a "$LOGS/queue.log"
    return 0
  fi
  echo "[queue6] START $name $(date +%H:%M:%S)" | tee -a "$LOGS/queue.log"
  if timeout "$t" "$@" >"$LOGS/$name.log" 2>&1; then
    touch "$LOGS/${name}_DONE"
    echo "[queue6] OK $name $(date +%H:%M:%S)" | tee -a "$LOGS/queue.log"
  else
    echo "[queue6] FAIL $name (exit $?) — see $LOGS/$name.log" \
        | tee -a "$LOGS/queue.log"
  fi
}

run restore_pd 7200 python "$ROOT/tools/capstone_restore.py" --skip_teacher
run bridge_rest 7200 python "$ROOT/tools/capstone_bridge.py" \
    --skip_bridge --skip_scene
run bridge_scene 3600 python "$ROOT/tools/capstone_bridge.py" \
    --skip_bridge --skip_baseline
run dit_flow_dit 7200 python "$ROOT/tools/capstone_dit_flow.py" --only dit
run dit_flow_flow 7200 python "$ROOT/tools/capstone_dit_flow.py" --only flow

echo "[queue6] all done $(date +%H:%M:%S)" | tee -a "$LOGS/queue.log"
