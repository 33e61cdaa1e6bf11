#!/bin/bash
# One-off recovery watcher (2026-08-19): an orphaned srtex_base capstone
# (PID $1) is finishing its training after the duplicate-queue8 incident.
# Wait for it, mark srtex_base_DONE iff it logged its clean exit line,
# then run queue8 (whose markers make the rest sequential + idempotent).
set -u
ROOT=/root/repo
LOG=$ROOT/logs/r3_queue
PID=${1:?pid}
while kill -0 "$PID" 2>/dev/null; do sleep 15; done
if grep -q "base stage done; skip_sr set" "$LOG/srtex_base.log"; then
    touch "$LOG/srtex_base_DONE"
    echo "[watch] srtex_base finished clean; marked $(date +%H:%M:%S)" >> "$LOG/queue.log"
else
    echo "[watch] srtex_base exited WITHOUT the clean-exit line — queue8 will retry it" >> "$LOG/queue.log"
fi
exec bash "$ROOT/tools/run_r3_chip_queue8.sh"
