#!/bin/bash
# Round-5 queue C: validate + measure the two-tier (bsplit) forward kernel
# on silicon, then re-tune blocks under the new free-bk rule, then the
# fixed ML-3B rehearsal (loss activation checkpointing fits B=96).
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

# 1. Mosaic-lowered differential suite on the real chip (the correctness bar)
step diff_bsplit 2400 python -m pytest tests/test_pallas_tpu.py -x -q

# 2. headline bench on the new kernel
step bench_bsplit 1500 python bench.py

# 3. A/B attribution: nobsplit reverts the two-tier walk
step ablate_fwd_b 3600 python benchmarks/kernel_ablate.py 2048 fwd
step ablate_fwdbwd_b 3600 python benchmarks/kernel_ablate.py 2048 fwdbwd

# 4. block re-tune under free-bk + 256-mult padding (serving shapes unlock)
step attn_tune_b 5400 python benchmarks/attn_tune.py

# 5. ML-3B rehearsal with loss activation checkpointing
step ml3b_b 5400 python benchmarks/ml3b_rehearsal.py \
  --prefix build/ml20mx4/2x2 --steps 40 --out "$LOG/ml3b.jsonl"

echo "R5C DONE failed=$FAILED ($(date +%H:%M:%S))" | tee -a "$LOG/driver.log"
exit $FAILED
