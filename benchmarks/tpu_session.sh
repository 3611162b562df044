#!/bin/bash
# Round-3 TPU measurement queue — run once when the axon relay is healthy.
# One TPU job at a time; every step under timeout; everything logged.
# Usage: bash benchmarks/tpu_session.sh [logdir]
set -u
LOG=${1:-/tmp/tpu_r3}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."

step() {
  name=$1; tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ===" | tee -a "$LOG/driver.log"
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc ($(date +%H:%M:%S))" | tee -a "$LOG/driver.log"
  return $rc
}

# 0. probe (fail fast if the relay is still down)
step probe 420 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256), jnp.bfloat16); (x@x).block_until_ready()
print('TPU OK', jax.devices())" || exit 1

# 1. real-chip differential suites for the kernels touched this round
step diff_pallas 2400 python -m pytest tests/test_pallas_tpu.py -x -q
step diff_relbias 2400 python -m pytest tests/test_relbias_attention.py -x -q
step diff_delta 1800 python -m pytest tests/test_delta_mask.py tests/test_mfalcon.py -x -q

# 2. current bench baseline (fast-mask change included)
step bench_base 1200 python bench.py

# 3. VPU budget attribution + sigmoid variant at the bench shape
step ablate_fwdbwd 2400 python benchmarks/kernel_ablate.py 2048 fwdbwd
step ablate_fwd 1800 python benchmarks/kernel_ablate.py 2048 fwd
step tanh_fwdbwd 1200 env GR_TPU_KERNEL_ABLATE=tanh python bench.py

# 4. block re-tune at the bench shape (also seeds the autotune cache)
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

echo "ALL DONE ($(date +%H:%M:%S))" | tee -a "$LOG/driver.log"
