#!/bin/bash
# Round-5 queue E: refresh the end-to-end numbers on the post-unlock
# kernels — M-FALCON crossover (dense + prefill paths ride the +41%
# serving-shape win), flagship train step, delta-only re-tune with
# noise-proof loop counts.
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

step mfalcon_e 7200 python benchmarks/mfalcon_sweep.py \
  --uih 512 1024 --m 40 160 --chunks 0 20 --reuse 1 4 16 \
  --out "$LOG/mfalcon_e.jsonl"

step train_bench_e 3600 python benchmarks/train_bench.py

echo "R5E DONE failed=$FAILED ($(date +%H:%M:%S))" | tee -a "$LOG/driver.log"
exit $FAILED
