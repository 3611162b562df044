#!/bin/bash
# Round-3 TPU measurement queue — run once when the axon relay is healthy.
# Ordered so the highest-value items land first if the relay heals late:
# bench + ablations (kernel next-move decision) -> real-chip differential
# suites -> rel-bias ratio -> M-FALCON crossover -> ML-3B rehearsal.
# One TPU job at a time; every step under timeout; everything logged.
# Usage: bash benchmarks/tpu_session.sh [logdir]
set -u
LOG=${1:-/tmp/tpu_r3}
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

# 0. probe (fail fast if the relay is still down)
step probe 420 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256), jnp.bfloat16); (x@x).block_until_ready()
print('TPU OK', jax.devices())" || { rm -f "$LOG/probe.done"; exit 1; }
rm -f "$LOG/probe.done"

# 1. current bench baseline (fast-mask change included)
step bench_base 1500 python bench.py

# 2. VPU budget attribution + sigmoid/interior variants at the bench shape
step ablate_fwdbwd 3000 python benchmarks/kernel_ablate.py 2048 fwdbwd
step ablate_fwd 2400 python benchmarks/kernel_ablate.py 2048 fwd

# 3. real-chip differential suites for the kernels touched this round
step diff_pallas 2400 python -m pytest tests/test_pallas_tpu.py -x -q
step diff_relbias 2400 python -m pytest tests/test_relbias_attention.py -x -q
step diff_delta 1800 python -m pytest tests/test_delta_mask.py tests/test_mfalcon.py -x -q

# 4. block re-tune at the bench shape
step attn_tune 3600 python benchmarks/attn_tune.py 2048 fwdbwd

# 5. rel-bias: preset step time, Pallas in-kernel vs XLA fallback (N=512)
step relbias_512 3600 python benchmarks/train_bench.py --seq_len 512 \
  --batch_size 128 --variants relbias
step relbias_1024 3600 python benchmarks/train_bench.py --seq_len 1024 \
  --batch_size 32 --variants relbias

# 6. M-FALCON crossover sweep (delta-q Pallas kernel in the cached path)
step mfalcon 5400 python benchmarks/mfalcon_sweep.py \
  --uih 512 1024 --m 40 160 --chunks 0 20 --reuse 1 4 16 \
  --out "$LOG/mfalcon.jsonl"

# 7. ML-3B single-chip rehearsal over the fractal MultiFile corpus
step ml3b 5400 python benchmarks/ml3b_rehearsal.py \
  --prefix build/ml20mx4/2x2 --steps 40 --out "$LOG/ml3b.jsonl"

# 8. driver contract
step entry 900 python __graft_entry__.py

echo "ALL DONE failed=$FAILED ($(date +%H:%M:%S))" | tee -a "$LOG/driver.log"
exit $FAILED
