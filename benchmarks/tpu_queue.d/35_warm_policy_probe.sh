#!/bin/bash
# Refresh-policy A/B at the real grid-64 post-jump scenario (VERDICT r3
# weak #6): carried-products rounds vs recompute escalation.
cd /root/repo
timeout 2400 python benchmarks/diagnostics/warm_policy_probe.py 64 \
  > results/r5/warm_policy_probe_grid64.txt 2>&1
