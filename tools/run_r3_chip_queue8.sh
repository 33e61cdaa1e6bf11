#!/bin/bash
# r3 queue pass 8: waits for the ControlNet capstone (run_ctrl_capstone.sh),
# then runs the texture-SR cascade (stage-split: one training per process,
# CLAUDE.md RSS leak), retrains the dit256 flow teacher (lost with the wiped
# logs dir), and distills it with ReFlow at 256px. Markers in logs/r3_queue/.
set -u
ROOT=/root/repo
LOG=$ROOT/logs/r3_queue
export PYTHONPATH=$ROOT:${PYTHONPATH:-}
mkdir -p "$LOG"

note() { echo "[queue8] $1 $(date +%H:%M:%S)" >> "$LOG/queue.log"; }

# wait for the ctrl capstone runner to finish (its runner logs 'ctrl exit').
# The cap must cover the runner's WORST case (two 7200s-timeout trainings:
# 4h), not 2h — starting capstones while a training still holds the chip
# and the single host core is the exact contention CLAUDE.md forbids.
note "waiting for the controlnet capstone..."
waited=0
for i in $(seq 1 1500); do
    grep -q "\[ctrlq\] ctrl exit" "$LOG/queue.log" 2>/dev/null && { waited=1; break; }
    sleep 10
done
if [ "$waited" -eq 1 ]; then
    note "controlnet done; starting"
else
    note "controlnet never logged 'ctrl exit' after 4.2h — aborting queue8"
    exit 1
fi

run() { # name timeout cmd...
    local name=$1 tmo=$2; shift 2
    [ -e "$LOG/${name}_DONE" ] && { note "SKIP $name (marker)"; return 0; }
    note "START $name"
    timeout "$tmo" "$@" > "$LOG/${name}.log" 2>&1
    local rc=$?
    if [ $rc -eq 0 ]; then
        touch "$LOG/${name}_DONE"; note "OK $name"
    else
        note "FAIL $name (exit $rc) — see $LOG/${name}.log"
    fi
    return 0
}

run srtex_base  7200 python "$ROOT/tools/capstone_sr.py" --texture 0.8 --skip_sr
run srtex_stage 7200 python "$ROOT/tools/capstone_sr.py" --texture 0.8 --skip_base
run dit256      7200 python "$ROOT/tools/capstone_dit256.py"
run reflow256   7200 python "$ROOT/tools/capstone_reflow.py" --model dit256
note "all done"
