#!/bin/bash
# Job 10's outer timeout (13500s) undershoots 3 x (pretrain + 3900s
# budget) — spot dies mid-optimize without its export (code-review r5
# finding #1).  Dedicated spot run with a sound budget.
cd /root/repo
mkdir -p out/r5_geometry_spot2
timeout 3300 python -m diffsound_tpu.experiments.geometry \
  --config configs/geometry_train.json --out_dir out/r5_geometry_spot2/ \
  --mesh_name_list '["spot"]' --time_budget_s 1800 \
  > results/r5/geometry_grid32_spot2.txt 2>&1
cp out/r5_geometry_spot2/16/metrics.jsonl results/r5/geometry_spot2_metrics.jsonl 2>/dev/null
