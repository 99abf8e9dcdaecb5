#!/bin/bash
# VERDICT r3 item 2 (4 rounds overdue): geometry task at FULL reference
# config (bob/oloid/spot, grid 32, 64 modes, 1000 iters) on TPU.
# Per-mesh budget 3900s so all three finish even at worst-case step cost.
cd /root/repo
mkdir -p out/r5_geometry
timeout 13500 python -m diffsound_tpu.experiments.geometry \
  --config configs/geometry_train.json --out_dir out/r5_geometry/ \
  --time_budget_s 3900 \
  > results/r5/geometry_grid32_full.txt 2>&1
cp out/r5_geometry/16/metrics.jsonl results/r5/geometry_metrics.jsonl 2>/dev/null
