#!/bin/bash
# LOBPCG refresh-body cost breakdown at grid-64 thickness scale (VERDICT
# r3 weak #6) — feeds the round-5 refresh-floor optimization.
cd /root/repo
timeout 1500 python benchmarks/diagnostics/refresh_profile.py 64 \
  > results/r5/refresh_profile_grid64.txt 2>&1
