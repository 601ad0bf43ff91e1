#!/bin/bash
# Round-5 batch H — re-validate after the effort-finger motor-curve +
# finger-friction physics fix (the omni grasp unlock). Order matters: omni
# first (the headline question), then pick re-attestation, bench, anymal.
cd /root/repo
export VALIDATE_ROUND=5

run() {
  local name=$1; shift; local to=$1; shift
  echo "=== $name start $(date)" >> /tmp/r5_progress.log
  timeout "$to" "$@" > "/tmp/r5_${name}.log" 2>&1
  echo "$name EXIT=$?" >> "/tmp/r5_${name}.log"
  echo "=== $name done $(date)" >> /tmp/r5_progress.log
}

echo "BATCH r5h START $(date) sha=$(git rev-parse --short HEAD)" >> /tmp/r5_progress.log
run omni_world2  8000 python scripts/validate.py omni world 5
run pick_sw1b    8000 python scripts/validate.py pick world 10 panda_pick "" 1
run bench2       3000 env BENCH_SWEEPS=1 python bench.py
run pick_swd2    8000 python scripts/validate.py pick world 10
# fast fidelity was 3/10 BEFORE the finger-motor fix (lambda carry/snap was
# load-bearing for capture) — the drive-side stabilization may rescue it,
# which would make the 527 Hz config a task-passing one
run pick_fast2   8000 python scripts/validate.py pick fast 10
run anymal2      6000 python scripts/validate.py anymal 5 none
run suite2       6000 python scripts/validate.py suite
echo "BATCH r5h COMPLETE $(date)" >> /tmp/r5_progress.log
