#!/bin/bash
# Round-5 batch E — omni_panda_pick discrimination on the TPU:
# scripted world pick from a perfect straddle (probe_omni_lift). A succeeding
# script indicts the rollout model/solver; a slipping script indicts physics.
cd /root/repo
export VALIDATE_ROUND=5
while ! grep -q "BATCH r5d COMPLETE" /tmp/r5_progress.log 2>/dev/null; do sleep 60; done

run() {
  local name=$1; shift; local to=$1; shift
  echo "=== $name start $(date)" >> /tmp/r5_progress.log
  timeout "$to" "$@" > "/tmp/r5_${name}.log" 2>&1
  echo "$name EXIT=$?" >> "/tmp/r5_${name}.log"
  echo "=== $name done $(date)" >> /tmp/r5_progress.log
}

run omni_lift    5000 python -u scripts/probe_omni_lift.py --fresh
run omni_teleport 5000 python -u scripts/diag_omni_teleport.py 896 0 500
echo "BATCH r5e COMPLETE $(date)" >> /tmp/r5_progress.log
