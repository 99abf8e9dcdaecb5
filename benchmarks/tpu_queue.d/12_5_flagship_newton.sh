#!/bin/bash
# VERDICT r3 item 3+5: flagship newton recipe ON TPU, ALL 16 pairs
# (round 4 timed out after 5).
cd /root/repo
mkdir -p out/r5_material_sync_tpu
timeout 12000 python -m diffsound_tpu.experiments.material_sync \
  --config configs/material_sync_train.json --recipe newton \
  --out_dir out/r5_material_sync_tpu/ \
  > results/r5/material_sync_newton_tpu.txt 2>&1
cp out/r5_material_sync_tpu/result.txt results/r5/material_sync_tpu_result.txt 2>/dev/null
