#!/bin/bash
# Serialized TPU validation batch — ONE process at a time (the tunnel
# serializes dispatches anyway; parallel processes just thrash compiles).
# Logs under /tmp/v_*.log; progress in /tmp/v_progress.log
cd /root/repo
# truncate: a stale "BATCH{N} COMPLETE" from a previous run would release all
# follower batches immediately (advisor finding r2)
: > /tmp/v_progress.log

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1; shift
  local to=$1; shift
  echo "=== $name start $(date)" >> /tmp/v_progress.log
  timeout "$to" "$@" > "/tmp/v_${name}.log" 2>&1
  echo "$name EXIT=$?" >> "/tmp/v_${name}.log"
  echo "=== $name done $(date)" >> /tmp/v_progress.log
}

run pick    1500 python scripts/validate.py pick fast 5
run anymal  1500 python scripts/validate.py anymal 3
run bench   1200 python bench.py
run suite   2400 python scripts/validate.py suite
run omni    1200 python scripts/validate.py omni fast 3
echo "BATCH COMPLETE $(date)" >> /tmp/v_progress.log
