#!/bin/bash
# VERDICT r3 item 3+5: flagship newton recipe ON TPU, 16 pairs, with
# automatic window arbitration (no manual kwargs).
cd /root/repo
mkdir -p out/r4_material_sync_tpu
timeout 2700 python -m diffsound_tpu.experiments.material_sync \
  --config configs/material_sync_train.json --recipe newton \
  --out_dir out/r4_material_sync_tpu/ \
  > results/r4/material_sync_newton_tpu.txt 2>&1
cp out/r4_material_sync_tpu/result.txt results/r4/material_sync_tpu_result.txt 2>/dev/null
