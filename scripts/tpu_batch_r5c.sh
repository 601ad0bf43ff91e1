#!/bin/bash
# Round-5 batch C — diagnostics after batch B: the stick_push regression
# (suite null @1500 after the damper cap; was green-by-derived-gate in r3)
# and the anymal failing seeds (2, 4).
cd /root/repo
export VALIDATE_ROUND=5
while ! grep -q "BATCH r5b COMPLETE" /tmp/r5_progress.log 2>/dev/null; do sleep 60; done

run() {
  local name=$1; shift; local to=$1; shift
  echo "=== $name start $(date)" >> /tmp/r5_progress.log
  timeout "$to" "$@" > "/tmp/r5_${name}.log" 2>&1
  echo "$name EXIT=$?" >> "/tmp/r5_${name}.log"
  echo "=== $name done $(date)" >> /tmp/r5_progress.log
}

run stick_diag  2500 python scripts/diag_stick.py 1500 0 50
run stick_s1    2500 python scripts/validate.py one panda_stick_push mppi.seed_val=1
run anymal_s2   2500 python scripts/diag_anymal_seed.py 2
run anymal_s4   2500 python scripts/diag_anymal_seed.py 4
echo "BATCH r5c COMPLETE $(date)" >> /tmp/r5_progress.log
