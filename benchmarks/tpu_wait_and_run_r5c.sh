#!/bin/bash
# Relay-outage watcher: probe the axon relay every 5 minutes; when it
# answers, run the r5c validation+measurement queue (resumable via .done
# markers). The relay died at 09:54 mid diff-suite (round-3 had the same
# outage pattern); nothing in the queue mutates state so re-running is safe.
set -u
LOG=${1:-benchmarks/tpu_r5_results}
cd "$(dirname "$0")/.."
for i in $(seq 1 72); do
  if timeout 240 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256), jnp.bfloat16); (x@x).block_until_ready()
print('TPU OK')" > /dev/null 2>&1; then
    echo "relay up after $i probes ($(date +%H:%M:%S))" | tee -a "$LOG/driver.log"
    exec bash benchmarks/tpu_session_r5c.sh "$LOG"
  fi
  sleep 300
done
echo "relay still down after 6h ($(date +%H:%M:%S))" | tee -a "$LOG/driver.log"
exit 1
