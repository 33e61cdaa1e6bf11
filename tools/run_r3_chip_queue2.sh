#!/bin/bash
# Round-3 chip queue, fix-up pass. The first pass (run_r3_chip_queue.sh)
# assumed the reflow teacher checkpoints (logs/capstone_dit_flow/flow64,
# logs/capstone_dit256/final) were still on disk; logs/ is not versioned,
# so on a fresh machine they must be retrained first. This pass trains the
# teachers, then re-invokes the first-pass script — its *_DONE markers skip
# everything that already succeeded, and the entries that FAILED (edm: a
# transient tunnel FailedPrecondition; reflow64/256: the missing teachers)
# re-run.
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

# teachers for the reflow distillation capstones
run dit_flow 10800 python "$ROOT/tools/capstone_dit_flow.py"
run dit256 14400 python "$ROOT/tools/capstone_dit256.py"

# second pass over the original list (DONE markers skip the successes)
bash "$ROOT/tools/run_r3_chip_queue.sh"

# session additions: post-hoc EMA sweep + ToMe quality/speed (both features
# landed this session; tools/capstone_tome_phema.py)
run tome_phema 10800 python "$ROOT/tools/capstone_tome_phema.py"
run int8 7200 python "$ROOT/tools/bench_int8.py"
