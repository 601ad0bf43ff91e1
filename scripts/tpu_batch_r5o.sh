#!/bin/bash
# Round-5 batch O — winner replay + anymal tape row + final attestations.
cd /root/repo
export VALIDATE_ROUND=5
while ! grep -q "BATCH r5n COMPLETE" /tmp/r5_progress.log 2>/dev/null; do sleep 60; done
run() {
  local name=$1; shift; local to=$1; shift
  echo "=== $name start $(date)" >> /tmp/r5_progress.log
  timeout "$to" "$@" > "/tmp/r5_${name}.log" 2>&1
  echo "$name EXIT=$?" >> "/tmp/r5_${name}.log"
  echo "=== $name done $(date)" >> /tmp/r5_progress.log
}
run omni_win_replay 4000 python scripts/diag_omni.py 1500 4 50 1 mppi.update_lambda=true mppi.horizon=12
run anymal_tape     6000 python scripts/validate.py anymal 5 tape
echo "BATCH r5o COMPLETE $(date)" >> /tmp/r5_progress.log
