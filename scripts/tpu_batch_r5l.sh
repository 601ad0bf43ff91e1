#!/bin/bash
# Round-5 batch L — omni with the sw=8 rollout model across horizons.
cd /root/repo
export VALIDATE_ROUND=5
run() {
  local name=$1; shift; local to=$1; shift
  echo "=== $name start $(date)" >> /tmp/r5_progress.log
  timeout "$to" "$@" > "/tmp/r5_${name}.log" 2>&1
  echo "$name EXIT=$?" >> "/tmp/r5_${name}.log"
  echo "=== $name done $(date)" >> /tmp/r5_progress.log
}
echo "BATCH r5l START $(date) sha=$(git rev-parse --short HEAD)" >> /tmp/r5_progress.log
run omni_sw8_h6   9000 python scripts/validate.py omni world 5
run omni_sw8_h12  9000 env VALIDATE_EXTRA=mppi.horizon=12 python scripts/validate.py omni world 5
run omni_sw8_h24  9000 env VALIDATE_EXTRA=mppi.horizon=24 python scripts/validate.py omni world 5
echo "BATCH r5l COMPLETE $(date)" >> /tmp/r5_progress.log
