#!/bin/bash
# Round-3 chip queue, pass 9: the optimizer + MeanFlow follow-ups.
# One training per process (host-feed RSS leak — see CLAUDE.md; all of
# these use device-resident data, the split is belt-and-braces).
#   muon_adamw    AdamW baseline training (flow64 protocol, 6000 steps)
#   muon_muon     Muon training (lr-mult probe + 6000 steps)
#   muon_eval     Heun-8 KID for both + JSON/grids
#   meanflow18k   the interrupted 18k-step MeanFlow rerun (--tag keeps the
#                 committed 9k artifacts intact)
set -u
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
LOGS="$ROOT/logs/r3_queue"
mkdir -p "$LOGS"
export PYTHONPATH="$ROOT:${PYTHONPATH:-}"

# wait for the tunnel (fresh VM: the chip appears when axon is up)
echo "[queue9] waiting for the TPU tunnel..." | tee -a "$LOGS/queue.log"
for i in $(seq 1 60); do
  if python -c "import jax; assert jax.devices()[0].platform == 'tpu'" \
      2>/dev/null; then
    break
  fi
  sleep 10
done
echo "[queue9] starting $(date +%H:%M:%S)" | tee -a "$LOGS/queue.log"

run() {
  local name="$1" t="$2"; shift 2
  if [ -f "$LOGS/${name}_DONE" ]; then
    echo "[queue9] $name already done, skipping" | tee -a "$LOGS/queue.log"
    return 0
  fi
  echo "[queue9] START $name $(date +%H:%M:%S)" | tee -a "$LOGS/queue.log"
  if timeout "$t" "$@" >"$LOGS/$name.log" 2>&1; then
    touch "$LOGS/${name}_DONE"
    echo "[queue9] OK $name $(date +%H:%M:%S)" | tee -a "$LOGS/queue.log"
  else
    echo "[queue9] FAIL $name (exit $?) — see $LOGS/$name.log" \
        | tee -a "$LOGS/queue.log"
  fi
}

run muon_adamw 5400 python "$ROOT/tools/capstone_muon.py" --opt adamw
run muon_muon 7200 python "$ROOT/tools/capstone_muon.py" --opt muon
run muon_eval 1800 python "$ROOT/tools/capstone_muon.py" --eval
run meanflow18k 7200 python "$ROOT/tools/capstone_meanflow.py" \
    --steps 18000 --tag meanflow64_18k

echo "[queue9] all done $(date +%H:%M:%S)" | tee -a "$LOGS/queue.log"
