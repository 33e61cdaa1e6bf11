#!/usr/bin/env bash
# Crash-isolated full-suite runner: one pytest process per shard of test
# files, so a transient XLA:CPU compile-cache-write segfault (observed
# r5: Fatal Python error inside compilation_cache.put_executable_and_time
# mid-suite; the same tests pass in a fresh process) voids one shard, not
# the whole 2h run. Shards also bound the long-lived process heap (the
# crashing run had 105 extension modules loaded).
#
#   bash tools/run_suite_sharded.sh [shard_size]
#
# Exit code: number of failing shards. Per-shard tails land in
# logs/suite_shards/.
set -u
cd "$(dirname "$0")/.."
SHARD=${1:-8}
mkdir -p logs/suite_shards
mapfile -t FILES < <(ls tests/test_*.py | sort)
total=${#FILES[@]}
fails=0
i=0
n=0
while [ $i -lt $total ]; do
  chunk=("${FILES[@]:$i:$SHARD}")
  n=$((n + 1))
  log="logs/suite_shards/shard_$n.log"
  echo "== shard $n: ${chunk[*]}"
  if python -m pytest "${chunk[@]}" -q > "$log" 2>&1; then
    tail -1 "$log"
  else
    echo "== shard $n FAILED (tail below; full log: $log)"
    tail -5 "$log"
    fails=$((fails + 1))
  fi
  i=$((i + SHARD))
done
echo "== $n shards, $fails failed"
exit $fails
