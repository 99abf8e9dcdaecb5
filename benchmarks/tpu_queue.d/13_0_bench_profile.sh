#!/bin/bash
# Steady-state breakdown of the flagship bench (refresh vs step scan),
# feeding the round-5 throughput optimization.
cd /root/repo
BENCH_VERBOSE=1 timeout 2400 python bench.py --run \
  > results/r5/bench_profile.txt 2>&1
