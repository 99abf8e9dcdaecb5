"""Geometric shape estimation experiment CLI.

Parity with /root/reference/experiments/geometry_train.py: for each shape
(bob/oloid/spot) and voxel resolution, compute GT eigenvalues from the
reference tet mesh, voxelize the surface mesh as a coarse constraint,
pretrain the SDF MLP (2000 iters) against the constraint, then run the
eigenvalue-driven optimization keeping the best mesh.

Run: python -m diffsound_tpu.experiments.geometry --config configs/geometry_train.json
"""

from __future__ import annotations

import os

import jax
import numpy as np

from ..fem.mesh import TetMesh, read_obj, write_obj
from ..geometry.geometry_task import GeometryTask
from ..geometry.sdf_host import mesh_signed_distance
from ..geometry.sdf_mlp import voxel_boundary_faces
from ..utils.logging import MetricLogger


def main(argv=None):
    from ..config import parse_flags

    flags = parse_flags("geometry (diffsound-tpu)", argv=argv)
    os.makedirs(flags.out_dir, exist_ok=True)

    for voxel_num in flags.voxel_num_list:
        out_dir = os.path.join(flags.out_dir, str(voxel_num))
        os.makedirs(out_dir, exist_ok=True)
        logger = MetricLogger(out_dir)
        for model_name in flags.mesh_name_list:
            # GT eigenvalues from the reference tet mesh
            gt_mesh = TetMesh.from_file(
                os.path.join(flags.init_mesh_dir, model_name + ".msh")
            )
            # surface mesh -> centered, voxel constraint
            sverts, sfaces = read_obj(
                os.path.join(flags.init_mesh_dir, model_name + "_surf.obj")
            )
            lo, hi = sverts.min(0), sverts.max(0)
            center = (lo + hi) / 2
            size = float((hi - lo).max()) * 1.05
            sverts = sverts - center

            xs = np.linspace(-0.5, 0.5, voxel_num)
            Q = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1).reshape(-1, 3)
            sd = mesh_signed_distance(Q * size, sverts, sfaces)  # inside-positive
            occ_coords = np.argwhere(
                sd.reshape(voxel_num, voxel_num, voxel_num) > 0
            )
            vverts, vtris = voxel_boundary_faces(occ_coords, voxel_num)
            write_obj(
                os.path.join(out_dir, f"{model_name}_voxel.obj"),
                vverts / voxel_num * size - size / 2, vtris,
            )

            for mode_num in flags.mode_num_list:
                task = GeometryTask(
                    grid_res=flags.grid_res, scale=size,
                    freq_num=flags.freq_num, mode_num=mode_num,
                    refresh_every=int(getattr(flags, "refresh_every", 1)),
                )
                gt_vals = task.gt_eigenvalues_from_mesh(
                    TetMesh(gt_mesh.vertices - center, gt_mesh.tets)
                )
                params = task.init_params(jax.random.PRNGKey(0))
                print(f"{model_name}/{voxel_num}/{mode_num}: pretraining SDF")
                params = task.pretrain_sdf(
                    params, Q * size, sd, iters=2000, lr=1e-4, verbose=True
                )
                print("optimizing against eigenvalues")
                # metrics streamed per iteration (a kill keeps the history)
                def _stream(rec, tag=f"{model_name}_{mode_num}"):
                    # eig scalar under the reference's tag (parity:
                    # geometry_train.py:241) + every numeric per-phase
                    # field (march_s/solve_s/loss_grad_s/solve_iters)
                    logger.scalar(tag, rec["eig"], rec["iter"])
                    logger.scalars(
                        {f"{tag}/{k}": v for k, v in rec.items()
                         if k not in ("iter", "eig")
                         and isinstance(v, (int, float))},
                        rec["iter"],
                    )

                export_path = os.path.join(
                    out_dir, f"{model_name}_{mode_num}.msh"
                )
                _last_export = [0.0]

                def _export_best(best, path=export_path, _t=_last_export):
                    # throttled checkpoint of the running best: a wedged
                    # relay RPC kills the process without returning from
                    # optimize() (lost the oloid run-1 mesh)
                    import time as _time
                    now = _time.monotonic()
                    if now - _t[0] < 120.0:
                        return
                    _t[0] = now
                    TetMesh(best["verts"], best["tets"]).export(path + ".part")
                    os.replace(path + ".part", path)

                params, best, hist = task.optimize(
                    params, gt_vals, Q * size, sd,
                    iters=flags.iter, lr=flags.learning_rate,
                    time_budget_s=getattr(flags, "time_budget_s", None),
                    on_iter=_stream, on_best=_export_best,
                )
                if best.get("verts") is not None:
                    TetMesh(best["verts"], best["tets"]).export(export_path)
                print(f"best eig loss: {best.get('eig_loss')}")


if __name__ == "__main__":
    main()
