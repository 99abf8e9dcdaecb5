#!/bin/bash
# oloid's in-process best mesh was lost to a wedged relay RPC mid-run
# (metrics.jsonl streamed 285 iters of history; the export needs the
# loop to finish).  Dedicated oloid run with the round-5 timing code.
cd /root/repo
mkdir -p out/r5_geometry_oloid
timeout 3300 python -m diffsound_tpu.experiments.geometry \
  --config configs/geometry_train.json --out_dir out/r5_geometry_oloid/ \
  --mesh_name_list '["oloid"]' --time_budget_s 1800 \
  > results/r5/geometry_grid32_oloid.txt 2>&1
cp out/r5_geometry_oloid/16/metrics.jsonl results/r5/geometry_oloid_metrics.jsonl 2>/dev/null
