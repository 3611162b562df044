#!/bin/bash
# Round-5 closing validation: Mosaic differential suite + M-FALCON e2e on
# the gate-fixed code, rel-bias ratio at its newly tuned blocks, final bench.
set -u
LOG=${1:-benchmarks/tpu_r5_results}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."
FAILED=0
step() {
  name=$1; tmo=$2; shift 2
  if [ -f "$LOG/$name.done" ]; then echo "=== $name cached ===" | tee -a "$LOG/driver.log"; return 0; fi
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$LOG/driver.log"
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc ($(date +%H:%M:%S))" | tee -a "$LOG/driver.log"
  if [ $rc -eq 0 ]; then touch "$LOG/$name.done"; else FAILED=1; fi
  return $rc
}
step diff_close 2400 python -m pytest tests/test_pallas_tpu.py tests/test_mfalcon.py -x -q
step relbias_512_tuned 3600 python benchmarks/train_bench.py --seq_len 512 --batch_size 32 --variants relbias
step bench_close 1500 python bench.py
echo "R5G DONE failed=$FAILED ($(date +%H:%M:%S))" | tee -a "$LOG/driver.log"
exit $FAILED
