#!/bin/bash
# Poll the axon TPU tunnel until it answers, then run the Pallas march
# on-chip bench.  Output -> /tmp/march_bench_out.txt, probe log -> stdout.
set -u
for i in $(seq 1 120); do
  if timeout -k 30 180 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
jnp.ones((8, 8)).block_until_ready()
EOF
  then
    echo "chip up after probe $i at $(date)"
    timeout -k 30 3000 python scripts/pallas_march_bench.py \
      > /tmp/march_bench_out.txt 2>&1
    echo "march bench rc=$? at $(date)"
    exit 0
  fi
  echo "probe $i down at $(date)"
  sleep 120
done
echo "gave up"
exit 1
