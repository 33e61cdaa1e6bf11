#!/bin/bash
# Round-3 chip queue, fix-up pass. Run AFTER refreshing the worktree to
# current HEAD (the tome_phema/int8 entries need this session's code).
#
# Pass 1 failures being addressed: edm died on a transient tunnel
# FailedPrecondition; reflow64/256 need teacher checkpoints
# (logs/capstone_dit_flow, logs/capstone_dit256) that are not versioned and
# were never trained this round. Order: cheap + new-feature capstones
# first, the heavy 256px teacher trainings last, then a final rerun of the
# pass-1 script (its *_DONE markers skip everything that already
# succeeded).
set -u
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
LOGS="$ROOT/logs/r3_queue"
mkdir -p "$LOGS"
export PYTHONPATH="$ROOT:${PYTHONPATH:-}"

run() {  # run <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  if [ -f "$LOGS/${name}_DONE" ]; then
    echo "[queue2] $name already done, skipping" | tee -a "$LOGS/queue.log"
    return 0
  fi
  echo "[queue2] START $name $(date +%H:%M:%S)" | tee -a "$LOGS/queue.log"
  if timeout "$t" "$@" >"$LOGS/$name.log" 2>&1; then
    touch "$LOGS/${name}_DONE"
    echo "[queue2] OK $name $(date +%H:%M:%S)" | tee -a "$LOGS/queue.log"
  else
    echo "[queue2] FAIL $name (exit $?) — see $LOGS/$name.log" \
        | tee -a "$LOGS/queue.log"
  fi
}

# this session's features, grounded (post-hoc EMA sweep + ToMe + UniPC)
run tome_phema 10800 python "$ROOT/tools/capstone_tome_phema.py"
# weight-only int8 serving: bf16 vs int8 at the 256px protocol
run int8 7200 python "$ROOT/tools/bench_int8.py"
# pass-1 transient failure, retried early (self-contained, ~15 min)
run edm 7200 python "$ROOT/tools/capstone_edm.py" --steps 6000
# pass-1 sr128 died to a host OOM at sr-stage step ~3000 (a concurrent
# process hit 125 GB); the base model's checkpoint survived — retry only
# the SR stage + eval
run sr128 10800 python "$ROOT/tools/capstone_sr.py" --skip_base
# teachers for the reflow distillation capstones
run dit_flow 10800 python "$ROOT/tools/capstone_dit_flow.py"
run dit256 14400 python "$ROOT/tools/capstone_dit256.py"
# final sweep over the original list (DONE markers skip the successes;
# reflow64/256 now find their teachers)
bash "$ROOT/tools/run_r3_chip_queue.sh"
