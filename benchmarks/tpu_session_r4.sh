#!/bin/bash
# Round-4 TPU measurement queue — run when the axon relay is healthy.
# Ordered highest-value-first: bench + ablations (quantify the alpha/inv_norm
# folding win) -> block re-tune -> rel-bias step-time ratio -> M-FALCON
# crossover -> ML-3B rehearsal -> driver contract.
# One TPU job at a time; every step under timeout; everything logged.
# Usage: bash benchmarks/tpu_session_r4.sh [logdir]
set -u
LOG=${1:-benchmarks/tpu_r4_results}
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

# 0. probe (fail fast if the relay is down)
step probe 420 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256), jnp.bfloat16); (x@x).block_until_ready()
print('TPU OK', jax.devices())" || { rm -f "$LOG/probe.done"; exit 1; }
rm -f "$LOG/probe.done"

# 1. bench after the alpha/inv_norm folding
step bench_fold 1500 python bench.py

# 2. VPU budget attribution with the fixed fwd methodology
step ablate_fwdbwd 3600 python benchmarks/kernel_ablate.py 2048 fwdbwd
step ablate_fwd 3600 python benchmarks/kernel_ablate.py 2048 fwd

# 3. block re-tune at the bench shape (empty log in r3 — retry)
step attn_tune 5400 python benchmarks/attn_tune.py 2048 fwdbwd

# 4. rel-bias: preset step time, Pallas in-kernel vs XLA fallback
step relbias_512 3600 python benchmarks/train_bench.py --seq_len 512 \
  --batch_size 128 --variants relbias
step relbias_1024 3600 python benchmarks/train_bench.py --seq_len 1024 \
  --batch_size 32 --variants relbias

# 5. M-FALCON crossover sweep (delta-q Pallas kernel in the cached path)
step mfalcon 7200 python benchmarks/mfalcon_sweep.py \
  --uih 512 1024 --m 40 160 --chunks 0 20 --reuse 1 4 16 \
  --out "$LOG/mfalcon.jsonl"

# 6. ML-3B single-chip rehearsal over the fractal MultiFile corpus
step ml3b 5400 python benchmarks/ml3b_rehearsal.py \
  --prefix build/ml20mx4/2x2 --steps 40 --out "$LOG/ml3b.jsonl"

# 7. driver contract
step entry 900 python __graft_entry__.py

echo "ALL DONE failed=$FAILED ($(date +%H:%M:%S))" | tee -a "$LOG/driver.log"
exit $FAILED
