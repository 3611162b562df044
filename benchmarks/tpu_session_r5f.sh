#!/bin/bash
# Round-5 queue F (finale): refresh the serving LoadGen peak cells on the
# current kernels, re-tune delta with noise-proof loop counts, and take
# the final headline bench.
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

step serve_b32_m160 2400 python -m generative_recommenders_tpu.inference.main \
  --scenario Offline --batch_size 32 --max_uih_len 512 \
  --max_num_candidates 160 --num_queries 64 --target_qps 40

step serve_mfalcon_b16 2400 python -m generative_recommenders_tpu.inference.main \
  --scenario Offline --batch_size 16 --max_uih_len 512 \
  --max_num_candidates 160 --num_queries 64 --target_qps 40 \
  --mfalcon --candidates_per_chunk 160

step attn_tune_d 5400 python benchmarks/attn_tune.py

step bench_r5 1500 python bench.py

echo "R5F DONE failed=$FAILED ($(date +%H:%M:%S))" | tee -a "$LOG/driver.log"
exit $FAILED
