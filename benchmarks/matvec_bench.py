"""Banded vs element-local K matvec on the bowl (ord 2) — the
integrate-or-remove measurement for fem/banded.py.

Run on the TPU: python benchmarks/matvec_bench.py
Prints one JSON line with per-matvec wall-clock for:
  * element path (frozen pre-split blocks + gather-transpose scatter) —
    the production operator inside the warm LOBPCG;
  * banded path (RCM-permuted 128-row dense blocks).
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
    import numpy as np

    from diffsound_tpu.fem import assembly
    from diffsound_tpu.fem.banded import build_banded_pencil
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

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        host_ops = assembly.build_element_ops(
            jax.device_put(jnp.asarray(mesh.vertices), cpu),
            jax.device_put(jnp.asarray(mesh.tets), cpu),
            2, dtype=jnp.float64,
        )
    pencil = build_banded_pencil(host_ops)
    k_band = jax.jit(
        lambda x: pencil.unpermute(pencil.k_matvec(pencil.permute(x), mu, lam))
    )

    n = 3 * mesh.num_vertices
    for m in (22, 70):
        x = jax.random.normal(jax.random.PRNGKey(0), (n, m), jnp.float32)
        t_elem = timed(k_elem, x)
        t_band = timed(k_band, x)
        # agreement
        ye = np.asarray(k_elem(x))
        yb = np.asarray(k_band(x))
        rel = float(
            np.linalg.norm(ye - yb) / max(np.linalg.norm(ye), 1e-30)
        )
        print(
            json.dumps(
                {
                    "metric": "k_matvec_ms",
                    "block_width": m,
                    "element_ms": t_elem * 1e3,
                    "banded_ms": t_band * 1e3,
                    "rel_diff": rel,
                    "backend": jax.default_backend(),
                }
            )
        )


if __name__ == "__main__":
    main()
