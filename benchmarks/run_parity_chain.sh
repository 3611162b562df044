#!/bin/bash
# Sequential quality-parity chain (one TPU). Appends to benchmarks/parity_results.jsonl
cd /root/repo
set -x
timeout 9000 python benchmarks/parity_quality.py --preset ml-20m/hstu-sampled-softmax-n128-large --scale ml-20m --seed 0 --budget_s 6600
timeout 2700 python benchmarks/parity_quality.py --preset ml-1m/hstu-sampled-softmax-n128-large --scale ml-1m --seed 0 --budget_s 1200
timeout 2700 python benchmarks/parity_quality.py --preset ml-1m/hstu-sampled-softmax-n128-large --scale ml-1m --seed 1 --budget_s 1200
timeout 2700 python benchmarks/parity_quality.py --preset ml-1m/hstu-sampled-softmax-n128-large --scale ml-1m --seed 0 --compute_dtype bfloat16 --budget_s 1200
timeout 2700 python benchmarks/parity_quality.py --preset ml-1m/hstu-sampled-softmax-n128-large --scale ml-1m --seed 1 --compute_dtype bfloat16 --budget_s 1200
timeout 2400 python benchmarks/parity_quality.py --preset ml-1m/hstu-sampled-softmax-n128-large --scale ml-1m --seed 0 --bias_gather take --budget_s 900
echo CHAIN_DONE
