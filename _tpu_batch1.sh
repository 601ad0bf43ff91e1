#!/bin/bash
# Serialized TPU batch — ONE process at a time, strictly.
set -x
cd /root/repo

# 1. pick 5-seed sweep with the fast-rollout knobs
timeout 4000 python _exp33b.py fast > /tmp/b1_pick_fast.log 2>&1
echo "pick_fast EXIT=$?" >> /tmp/b1_pick_fast.log

# 2. anymal diagnostic episode (chunked, instrumented via post-hoc states)
timeout 3000 python _exp40.py > /tmp/b1_anymal.log 2>&1
echo "anymal EXIT=$?" >> /tmp/b1_anymal.log

echo BATCH1 DONE
