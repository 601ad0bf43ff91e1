#!/bin/bash
# Round-5 batch J — slab-gate validation: the gate is exactness-preserving,
# so pick results must be BITWISE-IDENTICAL to batch H (any drift = gate bug).
# Then re-profile the kernel at the shipped config to guide the next lever.
cd /root/repo
export VALIDATE_ROUND=5

run() {
  local name=$1; shift; local to=$1; shift
  echo "=== $name start $(date)" >> /tmp/r5_progress.log
  timeout "$to" "$@" > "/tmp/r5_${name}.log" 2>&1
  echo "$name EXIT=$?" >> "/tmp/r5_${name}.log"
  echo "=== $name done $(date)" >> /tmp/r5_progress.log
}

echo "BATCH r5j START $(date) sha=$(git rev-parse --short HEAD)" >> /tmp/r5_progress.log
run pick_sw1c    8000 python scripts/validate.py pick world 10 panda_pick "" 1
run bench_swd3   3000 python bench.py
run omni_world3  8000 python scripts/validate.py omni world 5
echo "BATCH r5j COMPLETE $(date)" >> /tmp/r5_progress.log
