#!/bin/bash
# Round-5 follow-up queue: re-run the two steps that failed in r5a
# (ml3b: harness key bug, fixed; relbias_1024: the XLA *variant* OOMs at
# B=32 — the Pallas side succeeded at 386ms — so measure the XLA side at
# B=8 for a same-batch ratio), plus relbias_256 to validate the new
# bias-path auto threshold, plus the driver contract.
set -u
LOG=${1:-benchmarks/tpu_r5_results}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."
FAILED=0

step() {
  name=$1; tmo=$2; shift 2
  if [ -f "$LOG/$name.done" ]; then
    echo "=== $name cached ===" | tee -a "$LOG/driver.log"
    return 0
  fi
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$LOG/driver.log"
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc ($(date +%H:%M:%S))" | tee -a "$LOG/driver.log"
  if [ $rc -eq 0 ]; then touch "$LOG/$name.done"; else FAILED=1; fi
  return $rc
}

step ml3b 5400 python benchmarks/ml3b_rehearsal.py \
  --prefix build/ml20mx4/2x2 --steps 40 --out "$LOG/ml3b.jsonl"

step relbias_1024_b8 3600 python benchmarks/train_bench.py --seq_len 1024 \
  --batch_size 8 --variants relbias

step relbias_256 3600 python benchmarks/train_bench.py --seq_len 256 \
  --batch_size 32 --variants relbias

step entry 900 python __graft_entry__.py

echo "R5B DONE failed=$FAILED ($(date +%H:%M:%S))" | tee -a "$LOG/driver.log"
exit $FAILED
