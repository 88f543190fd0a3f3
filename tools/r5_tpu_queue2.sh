#!/bin/bash
# Round-5 TPU queue 2: bench + baselines evidence + oracle contract refresh.
cd /root/repo
echo "=== bench $(date)" | tee -a /tmp/r5_queue2.log
timeout 1500 python bench.py > /tmp/r5_bench.log 2>&1
echo "bench rc=$?" | tee -a /tmp/r5_queue2.log
tail -1 /tmp/r5_bench.log | tee -a /tmp/r5_queue2.log
echo "=== ppo baseline $(date)" | tee -a /tmp/r5_queue2.log
timeout 2400 python tools/run_baselines.py ppo > /tmp/r5_ppo.log 2>&1
echo "ppo rc=$?" | tee -a /tmp/r5_queue2.log
echo "=== oracle $(date)" | tee -a /tmp/r5_queue2.log
timeout 3600 python tools/oracle.py PushCube-v1 PickCube-v1 --episodes 5 \
  > /tmp/r5_oracle.log 2>&1
echo "oracle rc=$?" | tee -a /tmp/r5_queue2.log
echo "=== oracle stackcube $(date)" | tee -a /tmp/r5_queue2.log
timeout 3600 python tools/oracle.py StackCube-v1 --episodes 2 \
  > /tmp/r5_oracle_stack.log 2>&1
echo "oracle-stack rc=$?" | tee -a /tmp/r5_queue2.log
echo "=== done $(date)" | tee -a /tmp/r5_queue2.log
