#!/bin/bash
# Round-5 TPU measurement queue — runs FIRST this round (verdict r4 next #8).
# Priority order from VERDICT.md: M-FALCON crossover (3 rounds overdue) ->
# rel-bias step-time ratio at a FITTING batch (B=32; r4's B=128 OOMed) ->
# ML-3B rehearsal -> attn autotune table -> ablations with the FIXED
# differential carry (lengths + c, not c*0) -> mxu sweep re-confirm.
# One TPU job at a time; every step under timeout; everything logged.
# Usage: bash benchmarks/tpu_session_r5.sh [logdir]
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

# 0. probe (fail fast if the relay is down)
step probe 420 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256), jnp.bfloat16); (x@x).block_until_ready()
print('TPU OK', jax.devices())" || { rm -f "$LOG/probe.done"; exit 1; }
rm -f "$LOG/probe.done"

# 1. M-FALCON crossover sweep (verdict missing #1 — third round on the books)
step mfalcon 7200 python benchmarks/mfalcon_sweep.py \
  --uih 512 1024 --m 40 160 --chunks 0 20 --reuse 1 4 16 \
  --out "$LOG/mfalcon.jsonl"

# 2. rel-bias step-time ratio at a fitting config (r4 OOM was B=128:
#    4.08G sampled-softmax gather + 16x320MB kernel operands; B=32 fits)
step relbias_512 3600 python benchmarks/train_bench.py --seq_len 512 \
  --batch_size 32 --variants relbias
step relbias_1024 3600 python benchmarks/train_bench.py --seq_len 1024 \
  --batch_size 32 --variants relbias

# 3. ML-3B single-chip rehearsal over the fractal MultiFile corpus
step ml3b 5400 python benchmarks/ml3b_rehearsal.py \
  --prefix build/ml20mx4/2x2 --steps 40 --out "$LOG/ml3b.jsonl"

# 4. block autotune at the bench + serving + relbias + ml3b shapes
step attn_tune 5400 python benchmarks/attn_tune.py 2048 fwdbwd

# 5. VPU budget attribution with the FIXED fwd methodology (lengths + c)
step ablate_fwdbwd 3600 python benchmarks/kernel_ablate.py 2048 fwdbwd
step ablate_fwd 3600 python benchmarks/kernel_ablate.py 2048 fwd

# 6. re-confirm the MXU width sweep with the fixed carry
step mxu_sweep 3600 python benchmarks/mxu_width_sweep.py 2048 8

# 7. baseline bench at HEAD (pre-kernel-work reference point)
step bench_head 1500 python bench.py

echo "ALL DONE failed=$FAILED ($(date +%H:%M:%S))" | tee -a "$LOG/driver.log"
exit $FAILED
