"""LOBPCG wall-clock benchmark: top-64 modes of the bowl mesh (ord 2),
warm-started refresh vs host ARPACK cold solve (BASELINE.md target:
"LOBPCG wall-clock, top-64 modes").

Run: python benchmarks/lobpcg_bench.py
Prints a JSON summary; safe to run on CPU or the TPU.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _log(msg):
    print(f"[lobpcg_bench {time.strftime('%H:%M:%S')}] {msg}",
          file=sys.stderr, flush=True)


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_diffsound")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp
    import numpy as np

    from diffsound_tpu.fem.mesh import TetMesh, cube_tet_mesh
    from diffsound_tpu.models.sound_obj import build_model

    bowl = "/root/reference/data/mesh/bowl/bowl.obj_.msh"
    mesh = TetMesh.from_file(bowl) if os.path.exists(bowl) else cube_tet_mesh(6, 0.3)
    mat = (2700, 7.2e10, 0.19, 6, 1e-7)
    model = build_model(
        mesh=mesh, mode_num=64, order=2, mat=mat, task="material",
        dtype=jnp.float32,
    )
    params = model.init_params(jax.random.PRNGKey(0), pretrain=False)
    _log(f"model built ({model.num_dof} DOF); running cold host ARPACK")

    t0 = time.perf_counter()
    eig = model.eigen_decomposition(params, method="arpack")
    t_arpack = time.perf_counter() - t0
    _log(f"cold ARPACK {t_arpack:.1f}s; compiling device warm refresh")

    # perturb material ~2% and refresh on device (compile excluded)
    params2 = jax.tree.map(lambda x: x + 0.02, params)
    eig_w = model.eigen_decomposition(params2, prev=eig)  # compile
    jax.block_until_ready(eig_w.eigenvalues)
    _log("warm refresh compiled; timing")
    t0 = time.perf_counter()
    eig_w = model.eigen_decomposition(params2, prev=eig)
    jax.block_until_ready(eig_w.eigenvalues)
    t_warm = time.perf_counter() - t0
    _log(f"warm refresh {t_warm:.2f}s ({int(eig_w.iterations)} iters); "
         "accuracy reference solve")

    # accuracy of the refreshed eigenvalues vs a fresh host solve
    eig_ref = model.eigen_decomposition(params2, method="arpack")
    f_ref = np.sqrt(np.asarray(eig_ref.eigenvalues)[6:]) / (2 * np.pi)
    f_new = np.sqrt(np.maximum(np.asarray(eig_w.eigenvalues)[6:], 0)) / (2 * np.pi)
    rel = float(np.max(np.abs(f_new - f_ref) / f_ref))

    print(
        json.dumps(
            {
                "dof": model.num_dof,
                "modes": 64,
                "arpack_cold_s": round(t_arpack, 3),
                "lobpcg_warm_refresh_s": round(t_warm, 4),
                "warm_iterations": int(eig_w.iterations),
                "refresh_freq_rel_err": rel,
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
