#!/bin/bash
# Round-5 batch G — rerun the FIXED scripted omni pick (PD-hold phases;
# reuses the straddle state captured by batch E's phase A).
cd /root/repo
export VALIDATE_ROUND=5
while ! grep -q "BATCH r5f COMPLETE" /tmp/r5_progress.log 2>/dev/null; do sleep 60; done

run() {
  local name=$1; shift; local to=$1; shift
  echo "=== $name start $(date)" >> /tmp/r5_progress.log
  timeout "$to" "$@" > "/tmp/r5_${name}.log" 2>&1
  echo "$name EXIT=$?" >> "/tmp/r5_${name}.log"
  echo "=== $name done $(date)" >> /tmp/r5_progress.log
}

run omni_lift2  4000 python -u scripts/probe_omni_lift.py
echo "BATCH r5g COMPLETE $(date)" >> /tmp/r5_progress.log
