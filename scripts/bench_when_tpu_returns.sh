#!/bin/bash
# Poll the axon tunnel; when it answers, validate the default kernel paths on
# silicon (check_kernels_tpu) then run the full bench once, and exit.
# Probe is a separate short python so a dead tunnel never wedges the loop.
cd /root/repo
for i in $(seq 1 60); do
  if timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "tunnel up at $(date)" >> /tmp/bench_watch.log
    timeout 3600 python scripts/check_kernels_tpu.py > /tmp/kernels_tpu.log 2>&1
    echo "kernel check exit=$? at $(date)" >> /tmp/bench_watch.log
    timeout 7200 python bench.py > /tmp/bench_r3_fresh.log 2>&1
    echo "bench exit=$? at $(date)" >> /tmp/bench_watch.log
    exit 0
  fi
  echo "probe $i: tunnel down at $(date)" >> /tmp/bench_watch.log
  sleep 540
done
echo "gave up at $(date)" >> /tmp/bench_watch.log
