#!/bin/bash
# Round-5 batch M — omni operating-point search around the first success
# (h12 + adaptive lambda, seed 4 @1353): 10-seed rate estimate + h16/h20.
cd /root/repo
export VALIDATE_ROUND=5
run() {
  local name=$1; shift; local to=$1; shift
  echo "=== $name start $(date)" >> /tmp/r5_progress.log
  timeout "$to" "$@" > "/tmp/r5_${name}.log" 2>&1
  echo "$name EXIT=$?" >> "/tmp/r5_${name}.log"
  echo "=== $name done $(date)" >> /tmp/r5_progress.log
}
echo "BATCH r5m START $(date)" >> /tmp/r5_progress.log
run omni_lam12_10 9000 env VALIDATE_EXTRA=mppi.update_lambda=true,mppi.horizon=12 python scripts/validate.py omni world 10
run omni_lam16    9000 env VALIDATE_EXTRA=mppi.update_lambda=true,mppi.horizon=16 python scripts/validate.py omni world 5
run omni_lam20    9000 env VALIDATE_EXTRA=mppi.update_lambda=true,mppi.horizon=20 python scripts/validate.py omni world 5
echo "BATCH r5m COMPLETE $(date)" >> /tmp/r5_progress.log
