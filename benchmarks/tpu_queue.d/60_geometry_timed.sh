#!/bin/bash
# Short geometry runs with the round-5 per-phase timing (march/solve/
# grad split + warm-refresh iteration counts in metrics.jsonl), and a
# refresh_every=2 A/B at reference scale (bob, grid 32, 64 modes).
cd /root/repo
mkdir -p out/r5_geometry_timed out/r5_geometry_cadence2
timeout 1500 python -m diffsound_tpu.experiments.geometry \
  --config configs/geometry_train.json --out_dir out/r5_geometry_timed/ \
  --mesh_name_list '["bob"]' --time_budget_s 600 \
  > results/r5/geometry_timed_bob.txt 2>&1
cp out/r5_geometry_timed/16/metrics.jsonl results/r5/geometry_timed_bob_metrics.jsonl 2>/dev/null
timeout 1500 python -m diffsound_tpu.experiments.geometry \
  --config configs/geometry_train.json --out_dir out/r5_geometry_cadence2/ \
  --mesh_name_list '["bob"]' --time_budget_s 600 --refresh_every 2 \
  > results/r5/geometry_cadence2_bob.txt 2>&1
cp out/r5_geometry_cadence2/16/metrics.jsonl results/r5/geometry_cadence2_bob_metrics.jsonl 2>/dev/null
