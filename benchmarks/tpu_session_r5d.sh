#!/bin/bash
# Round-5 queue D (final): validate + measure under the FINAL dispatch
# policy — two-tier fwd only at non-dividing bk (measured loss elsewhere),
# legacy bwd, relbias back on 128-mult padding, FACTORY re-bucketed —
# then the ML-3B rehearsal with block remat + loss checkpointing.
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

step probe_d 420 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256), jnp.bfloat16); (x@x).block_until_ready()
print('TPU OK', jax.devices())" || { rm -f "$LOG/probe_d.done"; exit 1; }
rm -f "$LOG/probe_d.done"

step diff_final 2400 python -m pytest tests/test_pallas_tpu.py tests/test_mfalcon.py -x -q

step bench_final 1500 python bench.py

step attn_tune_c 5400 python benchmarks/attn_tune.py

step ml3b_c 5400 python benchmarks/ml3b_rehearsal.py \
  --prefix build/ml20mx4/2x2 --steps 40 --out "$LOG/ml3b.jsonl"

step entry_d 900 python __graft_entry__.py

echo "R5D DONE failed=$FAILED ($(date +%H:%M:%S))" | tee -a "$LOG/driver.log"
exit $FAILED
