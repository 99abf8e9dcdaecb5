#!/bin/bash
# VERDICT r3 item 4: real morphing recovery at grid 64 — endpoints 0.0
# and 1.0 (plus 0.2/0.8 if time allows via the 25-iter newton budget).
cd /root/repo
cat > /tmp/morphing_r4.json <<'EOF'
{
    "iter": 25,
    "learning_rate": 2e-2,
    "out_dir": "out/r4_morphing_newton/",
    "target_mesh_dir": "data/morphing/",
    "init_mesh_dir": "/root/reference/data/mesh/",
    "mesh_name1": "frog",
    "mesh_name2": "turtle",
    "mesh_scale": 1.5,
    "morphing_list": [0.0, 1.0, 0.2, 0.8],
    "dmtet_grid": 64,
    "mat": "Steel"
}
EOF
mkdir -p out/r4_morphing_newton
timeout 2400 python -m diffsound_tpu.experiments.morphing \
  --config /tmp/morphing_r4.json --optimizer newton \
  > results/r4/morphing_newton_grid64.txt 2>&1
cp out/r4_morphing_newton/result_frog_turtle.txt results/r4/morphing_newton_result.txt 2>/dev/null
