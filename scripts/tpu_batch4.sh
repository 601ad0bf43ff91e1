#!/bin/bash
# Batch 4: omni_panda_pick retry (runner block-name fix) after batch 3.
cd /root/repo
while ! grep -q "BATCH3 COMPLETE" /tmp/v_progress.log 2>/dev/null; do sleep 30; done
echo "=== omni2 start $(date)" >> /tmp/v_progress.log
timeout 1500 python scripts/validate.py omni fast 3 > /tmp/v_omni2.log 2>&1
echo "omni2 EXIT=$?" >> /tmp/v_omni2.log
echo "=== omni2 done $(date)" >> /tmp/v_progress.log
echo "BATCH4 COMPLETE $(date)" >> /tmp/v_progress.log
