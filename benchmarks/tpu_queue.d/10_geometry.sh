#!/bin/bash
# VERDICT r3 item 2: geometry task at reference config (bob/oloid/spot,
# grid 32, 64 modes, iter 1000) ON TPU — time-boxed per mesh so all
# three produce artifacts (best eig loss + exported mesh + per-iter
# timing) within the round.
cd /root/repo
mkdir -p out/r4_geometry
timeout 2100 python -m diffsound_tpu.experiments.geometry \
  --config configs/geometry_train.json --out_dir out/r4_geometry/ \
  --time_budget_s 360 \
  > results/r4/geometry_grid32_tpu.txt 2>&1
cp out/r4_geometry/16/metrics.jsonl results/r4/geometry_metrics.jsonl 2>/dev/null
