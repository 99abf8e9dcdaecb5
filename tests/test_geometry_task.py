"""SDF-MLP geometry task: pretraining satisfies the voxel constraint,
marching produces a valid mesh, and the eigenvalue loss decreases when
optimizing toward the GT shape's modes."""

import numpy as np
import jax
import jax.numpy as jnp

from diffsound_tpu.geometry.geometry_task import GeometryTask
from diffsound_tpu.geometry.sdf_mlp import voxel_boundary_faces, voxelize_occupancy
from diffsound_tpu.geometry.dmtet import MarchingTets
from tests.test_geometry import icosphere


def test_voxel_boundary_faces():
    # a 3x3x3 solid block: boundary = 6 faces x 9 quads x 2 tris = 108
    coords = np.argwhere(np.ones((3, 3, 3), bool))
    verts, tris = voxel_boundary_faces(coords, resolution=3)
    assert len(tris) == 108
    assert len(verts) == 4 * 4 * 4 - 2 * 2 * 2  # surface lattice points

    # hollow block (center removed): interior cavity faces are NOT emitted
    occ = np.ones((3, 3, 3), bool)
    occ[1, 1, 1] = False
    coords2 = np.argwhere(occ)
    _, tris2 = voxel_boundary_faces(coords2, resolution=3)
    assert len(tris2) == 108  # same outer boundary only


def test_sdf_pretrain_and_march():
    task = GeometryTask(grid_res=12, scale=1.0, mode_num=8,
                        tets_dir="/nonexistent", freq_num=1)
    params = task.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    q = rng.uniform(-0.5, 0.5, (4000, 3))
    sd = 0.35 - np.linalg.norm(q, axis=1)  # sphere, inside-positive
    params = task.pretrain_sdf(params, q, sd, iters=400, lr=1e-3)

    loss = float(task.geo.mesh_template_loss(
        params, jnp.asarray(q), jnp.asarray(sd)))
    assert loss < 0.05

    out = task._march_params(params)
    comp = MarchingTets.compact(out)
    assert comp["num_tets"] > 100
    # marched shape roughly spherical: volume within 40% of the ball
    vc = np.asarray(out.all_verts)[comp["keep_idx"]]
    tc = comp["tets"][: comp["num_tets"]]
    a, b, c, d = (vc[tc[:, i]] for i in range(4))
    vol = (np.abs(np.einsum("ij,ij->i", a - d, np.cross(b - d, c - d))) / 6).sum()
    exact = 4 / 3 * np.pi * 0.35**3
    assert abs(vol - exact) < 0.4 * exact


def test_geometry_optimization_reduces_eig_loss():
    """Start from a slightly-too-large sphere; optimizing against the
    target sphere's eigenvalues should reduce the eigenvalue loss."""
    from diffsound_tpu.fem.mesh import TetMesh
    from diffsound_tpu.geometry.grid import generate_background_grid
    from diffsound_tpu.geometry.dmtet import MarchingTets as MT

    task = GeometryTask(grid_res=12, scale=1.0, mode_num=6,
                        tets_dir="/nonexistent", freq_num=1)

    # GT: marched mesh of a 0.30-radius sphere
    gverts, gtets = generate_background_grid(12)
    mt = MT(gverts, gtets)
    sdf_gt = 0.30 - np.linalg.norm(gverts, axis=1)
    out = mt(jnp.asarray(gverts, jnp.float64), jnp.asarray(sdf_gt))
    comp = MT.compact(out)
    gt_mesh = TetMesh(
        np.asarray(out.all_verts)[comp["keep_idx"]][: comp["num_verts"]],
        comp["tets"][: comp["num_tets"]],
    ).remove_unreferenced_vertices()
    gt_vals = task.gt_eigenvalues_from_mesh(gt_mesh)

    # init: SDF pretrained to a 0.36 sphere
    params = task.init_params(jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    q = rng.uniform(-0.5, 0.5, (4000, 3))
    sd_init = 0.36 - np.linalg.norm(q, axis=1)
    params = task.pretrain_sdf(params, q, sd_init, iters=250, lr=1e-3)

    # constraint from the *target* (as in the reference: coarse voxel of GT)
    sd_tgt = 0.30 - np.linalg.norm(q, axis=1)
    best_calls = []
    params, best, hist = task.optimize(
        params, gt_vals, q, sd_tgt, iters=8, lr=3e-4, verbose=False,
        on_best=lambda b: best_calls.append(np.asarray(b["verts"]).shape),
    )
    assert len(hist) >= 6
    assert hist[-1]["eig"] < hist[0]["eig"], hist
    # the improvement hook fired (iteration 0 always improves on inf)
    # with host-compacted vertex arrays
    assert best_calls and best_calls[0][1] == 3
