#!/bin/bash
# Round-5 TPU queue 3: render sweep, fixed roofline, PPO evidence, oracle.
cd /root/repo
echo "=== render sweep $(date)" | tee -a /tmp/r5_queue3.log
timeout 3000 python tools/render_sweep.py > /tmp/r5_sweep.log 2>&1
echo "sweep rc=$?" | tee -a /tmp/r5_queue3.log
echo "=== roofline $(date)" | tee -a /tmp/r5_queue3.log
timeout 1800 python tools/roofline.py > /tmp/r5_roofline2.log 2>&1
echo "roofline rc=$?" | tee -a /tmp/r5_queue3.log
echo "=== ppo $(date)" | tee -a /tmp/r5_queue3.log
timeout 2400 python tools/run_baselines.py ppo > /tmp/r5_ppo.log 2>&1
echo "ppo rc=$?" | tee -a /tmp/r5_queue3.log
echo "=== oracle stackcube $(date)" | tee -a /tmp/r5_queue3.log
timeout 3000 python tools/oracle.py StackCube-v1 --episodes 2 \
  > /tmp/r5_oracle_stack.log 2>&1
echo "oracle-stack rc=$?" | tee -a /tmp/r5_queue3.log
echo "=== oracle push/pick 5ep $(date)" | tee -a /tmp/r5_queue3.log
timeout 3000 python tools/oracle.py PushCube-v1 PickCube-v1 --episodes 5 \
  > /tmp/r5_oracle.log 2>&1
echo "oracle rc=$?" | tee -a /tmp/r5_queue3.log
echo "=== done $(date)" | tee -a /tmp/r5_queue3.log
