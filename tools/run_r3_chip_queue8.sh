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

# wait for the ctrl capstone runner to finish (its runner logs 'ctrl exit')
note "waiting for the controlnet capstone..."
for i in $(seq 1 720); do
    grep -q "\[ctrlq\] ctrl exit" "$LOG/queue.log" 2>/dev/null && break
    sleep 10
done
note "controlnet done; starting"

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
