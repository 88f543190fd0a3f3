#!/bin/bash
# Round-5 TPU artifact refresh queue — serialized (one chip).
cd /root/repo
echo "=== flagship (new kernel modes) $(date)" | tee /tmp/r5_queue.log
timeout 1800 python tools/bench_flagship.py --envs PickSingleYCB-v1 TwoRobotPushCube-v1 \
  >> /tmp/r5_flagship.log 2>&1
echo "flagship rc=$?" | tee -a /tmp/r5_queue.log
echo "=== visual $(date)" | tee -a /tmp/r5_queue.log
timeout 2700 python tools/bench_visual.py >> /tmp/r5_visual.log 2>&1
echo "visual rc=$?" | tee -a /tmp/r5_queue.log
echo "=== roofline $(date)" | tee -a /tmp/r5_queue.log
timeout 1500 python tools/roofline.py >> /tmp/r5_roofline.log 2>&1
echo "roofline rc=$?" | tee -a /tmp/r5_queue.log
echo "=== done $(date)" | tee -a /tmp/r5_queue.log
