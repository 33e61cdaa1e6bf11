#!/bin/bash
# Resume pass for queue8 after the 18:21 session drop: the ControlNet base
# stage finished (Orbax ckpt in logs/capstone_controlnet/base) but the ctrl
# stage and queue8 died with the session. Reruns ctrl --skip_base, appends
# the "[ctrlq] ctrl exit" marker queue8 waits on, then runs queue8 itself
# (whose own _DONE markers make this idempotent).
set -u
ROOT=/root/repo
LOG=$ROOT/logs/r3_queue
export PYTHONPATH=$ROOT:${PYTHONPATH:-}
mkdir -p "$LOG"

if ! grep -q "\[ctrlq\] ctrl exit" "$LOG/queue.log" 2>/dev/null; then
    echo "[ctrlq] RESUME ctrl $(date +%H:%M:%S)" >> "$LOG/queue.log"
    timeout 7200 python "$ROOT/tools/capstone_controlnet.py" --skip_base > "$LOG/ctrl_ctrl.log" 2>&1
    rc=$?
    echo "[ctrlq] ctrl exit $rc $(date +%H:%M:%S)" >> "$LOG/queue.log"
fi
exec bash "$ROOT/tools/run_r3_chip_queue8.sh"
