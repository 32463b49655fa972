#!/bin/bash
# Wait for the axon TPU tunnel, then run the round-2 on-chip batch
# sequentially (ONE process at a time — a stale process serializes the
# single chip).  Logs: /tmp/chip_batch/<step>.log
set -u
mkdir -p /tmp/chip_batch
cd /root/repo

probe() {
  timeout -k 30 180 python - <<'EOF' >/dev/null 2>&1
import jax, jax.numpy as jnp
jnp.ones((8, 8)).block_until_ready()
EOF
}

for i in $(seq 1 200); do
  if probe; then echo "chip up after probe $i at $(date)"; break; fi
  echo "probe $i down at $(date)"
  sleep 120
  [ "$i" = 200 ] && { echo "gave up"; exit 1; }
done

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 to=$2; shift 2
  echo "=== $name start $(date)"
  timeout -k 30 "$to" "$@" > "/tmp/chip_batch/$name.log" 2>&1
  echo "=== $name rc=$? $(date)"
  # if the worker crashed, give the tunnel time to recover before the
  # next step, and re-probe
  for j in $(seq 1 30); do
    probe && return 0
    echo "    tunnel down post-$name, waiting ($j)"
    sleep 120
  done
}

run march_bench   3000 python scripts/pallas_march_bench.py
run bench         1800 python bench.py
run roofline      1800 python scripts/roofline_probe.py
run profile_trace 1800 python scripts/profile_trace.py
run pallas_dense  3000 python scripts/pallas_bench.py
run bench_suite   9000 python scripts/bench_suite.py
echo "batch done $(date)"
