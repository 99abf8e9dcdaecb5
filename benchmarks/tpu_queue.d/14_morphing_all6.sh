#!/bin/bash
# Reference morphing_list has 6 coefs (configs/morphing_train.json:
# [0, 0.2, 0.4, 0.6, 0.8, 1.0]); round 4 ran 4 of them.  Full sweep,
# newton recipe, grid 64.
cd /root/repo
cat > /tmp/morphing_r5.json <<'JSON'
{
    "iter": 25,
    "learning_rate": 2e-2,
    "out_dir": "out/r5_morphing_newton/",
    "target_mesh_dir": "data/morphing/",
    "init_mesh_dir": "/root/reference/data/mesh/",
    "mesh_name1": "frog",
    "mesh_name2": "turtle",
    "mesh_scale": 1.5,
    "morphing_list": [0.0, 0.2, 0.4, 0.6, 0.8, 1.0],
    "dmtet_grid": 64,
    "mat": "Steel"
}
JSON
mkdir -p out/r5_morphing_newton
timeout 5400 python -m diffsound_tpu.experiments.morphing \
  --config /tmp/morphing_r5.json --optimizer newton \
  > results/r5/morphing_newton_all6.txt 2>&1
cp out/r5_morphing_newton/result_frog_turtle.txt results/r5/morphing_newton_all6_result.txt 2>/dev/null
