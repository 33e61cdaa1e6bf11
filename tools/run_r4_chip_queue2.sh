#!/usr/bin/env bash
# Round-4 chip queue, part 2: waits for part 1 (marker latent256.done),
# then runs the stages that depend on its artifacts + the cfg retrain
# (part 1's cfg_rerun reused a stale diverged checkpoint; the ckpt dir was
# deleted so this run trains fresh with the grad-clip fix).
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
MARKERS=logs/r4_queue
mkdir -p "$MARKERS" logs/r4

for i in $(seq 1 240); do
  [ -f "$MARKERS/latent256.done" ] && break
  sleep 60
done
if [ ! -f "$MARKERS/latent256.done" ]; then
  echo "part 1 never finished; aborting"; exit 1
fi

wait_for_tpu() {
  for i in $(seq 1 60); do
    if timeout 120 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then
      return 0
    fi
    echo "tpu not reachable, retry $i/60"; sleep 60
  done
  exit 1
}

run_stage() {
  local name="$1"; shift
  if [ -f "$MARKERS/$name.done" ]; then
    echo "== $name already done, skipping"; return 0
  fi
  echo "== $name: $*"
  wait_for_tpu
  if "$@" > "logs/r4/$name.log" 2>&1; then
    touch "$MARKERS/$name.done"; echo "== $name OK"
  else
    echo "== $name FAILED (see logs/r4/$name.log)"; return 1
  fi
}

run_stage cfg_retrain python tools/capstone_evalregime.py --stage cfg --force
run_stage w8a8_rider python tools/rider_w8a8.py
echo "r4 queue part 2 complete"
