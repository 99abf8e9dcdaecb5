#!/bin/bash
# Safety net: the 16-pair flagship run is standalone (no watchdog).  If
# it wedged or timed out mid-pair, this resumes from result.txt (the
# experiment skips pairs already recorded); if it completed, this
# re-inits, finds 16 pairs done, and exits in minutes.
cd /root/repo
timeout 9000 python -m diffsound_tpu.experiments.material_sync \
  --config configs/material_sync_train.json --recipe newton \
  --out_dir out/r5_material_sync_tpu/ \
  >> results/r5/material_sync_newton_tpu.txt 2>&1
cp out/r5_material_sync_tpu/result.txt results/r5/material_sync_tpu_result.txt 2>/dev/null
