#!/bin/bash
# Round-5 batch K — validate the net_cf reporting fix (static bodies report
# the physical reaction instead of the stiff bookkeeping spring): omni is the
# target (the ~350 N table-force transient vetoed every sampled grasp); pick
# and the suite re-attest because their objectives read the same forces.
cd /root/repo
export VALIDATE_ROUND=5

run() {
  local name=$1; shift; local to=$1; shift
  echo "=== $name start $(date)" >> /tmp/r5_progress.log
  timeout "$to" "$@" > "/tmp/r5_${name}.log" 2>&1
  echo "$name EXIT=$?" >> "/tmp/r5_${name}.log"
  echo "=== $name done $(date)" >> /tmp/r5_progress.log
}

echo "BATCH r5k START $(date) sha=$(git rev-parse --short HEAD)" >> /tmp/r5_progress.log
run omni_world4  8000 python scripts/validate.py omni world 5
run pick_sw1d    8000 python scripts/validate.py pick world 10 panda_pick "" 1
run pick_swd4    8000 python scripts/validate.py pick world 10
run suite3       8000 python scripts/validate.py suite
run bench4       3000 env BENCH_SWEEPS=1 python bench.py
run boxer12_s0   1000 python scripts/validate.py one boxer_push mppi.horizon=12 mppi.seed_val=0
run boxer12_s1   1000 python scripts/validate.py one boxer_push mppi.horizon=12 mppi.seed_val=1
echo "BATCH r5k COMPLETE $(date)" >> /tmp/r5_progress.log
