"""K matvec wall-clock on the bowl (ord 2) — the production element-path
operator (frozen pre-split blocks + gather-transpose scatter) inside the
warm LOBPCG.

A block-banded (RCM) alternative was benchmarked here and REMOVED after
measuring 14x slower on CPU and a 7 GB constant blow-up on the bowl's
RCM bandwidth on TPU (BENCH_NOTES.md round 2; the implementation is in
git history at fem/banded.py before its removal commit).

Run: python benchmarks/matvec_bench.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(fn, x, iters=20):
    import jax

    y = fn(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(y * 0.0 + x)  # defeat CSE without changing the work
    jax.block_until_ready(y)
    return (time.perf_counter() - t0) / iters


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_diffsound")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from diffsound_tpu.fem import assembly
    from diffsound_tpu.fem.material import lame_params
    from diffsound_tpu.fem.mesh import TetMesh, cube_tet_mesh

    bowl = "/root/reference/data/mesh/bowl/bowl.obj_.msh"
    mesh = TetMesh.from_file(bowl) if os.path.exists(bowl) else cube_tet_mesh(6, 0.3)
    mesh = mesh.to_high_order(2)
    mu, lam = lame_params(7.2e10 / 2700, 0.19)

    ops = assembly.build_element_ops_jit(
        jnp.asarray(mesh.vertices), jnp.asarray(mesh.tets), 2, dtype=jnp.float32
    )
    fz = assembly.freeze_stiffness(ops, mu, lam)
    k_elem = jax.jit(lambda x: assembly.k_matvec_frozen(ops, fz, x))

    n = 3 * mesh.num_vertices
    for m in (22, 70):
        x = jax.random.normal(jax.random.PRNGKey(0), (n, m), jnp.float32)
        t_elem = timed(k_elem, x)
        print(
            json.dumps(
                {
                    "metric": "k_matvec_ms",
                    "block_width": m,
                    "element_ms": t_elem * 1e3,
                    "dof": n,
                    "backend": jax.default_backend(),
                }
            )
        )


if __name__ == "__main__":
    main()
