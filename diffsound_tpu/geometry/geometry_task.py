"""Geometric shape estimation: neural-SDF geometry optimized against modal
eigenvalues under a coarse voxel constraint.

Parity with /root/reference/experiments/geometry_train.py +
dmtet_geometry.py: an SDF MLP (+ bounded per-vertex deform) defines the
shape through solid marching tets; stage 1 pretrains the MLP to satisfy
the voxel sign constraint (2000 iters, lr 1e-4); stage 2 minimizes
  mesh_template_loss + 2e-4 * sqrt(mean((vals - gt)^2 / gt^2))
with Adam + StepLR(100, 0.8), eigensolve every iteration, keeping the
best-loss mesh.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..fem import assembly
from ..fem.material import Material, MatSet, lame_params
from ..solvers.arpack import eigsh_shift_invert
from ..solvers.diff_eigs import ritz_refined_eigenvalues
from .dmtet import MarchingTets
from .grid import load_background_grid
from .sdf_mlp import SDFGeometry


class GeometryTask:
    def __init__(
        self,
        grid_res: int = 32,
        scale: float = 1.0,
        freq_num: int = 1,
        mode_num: int = 64,
        mat=MatSet.Ceramic,
        dtype=None,
        sigma: float = 20000.0,
        extra_modes: int = 6,
        tets_dir: Optional[str] = None,
        eig_method: str = "warm",
        reanchor_every: int = 50,
        refresh_every: int = 1,
    ):
        """refresh_every: true eigensolve cadence; off-cadence steps map
        the detached basis across the remesh (tasks.py docstring).
        Default 1 (reference parity): ONE Adam(1e-5) step on the SDF MLP
        measurably moves the true eigenvalues by median 2.5% / max 9.5%
        (Adam's RMS-normalized steps are not small in function space), so
        the first-order mapped correction is not accurate enough here —
        use >1 only with step sizes whose per-step eigenvalue drift is
        well under 1%."""
        kw = {} if tets_dir is None else {"tets_dir": tets_dir}
        verts, tets = load_background_grid(grid_res, **kw)
        self.grid_verts = verts.astype(np.float64) * scale
        self.marching = MarchingTets(self.grid_verts, tets)
        self.geo = SDFGeometry(self.grid_verts, grid_res, scale, freq_num)
        self.mat = Material.of(mat)
        self.mode_num = mode_num
        if dtype is None:
            dtype = jnp.float64 if jax.default_backend() == "cpu" else jnp.float32
        self.dtype = dtype
        self.sigma = sigma
        self.extra_modes = extra_modes
        self._loss_cache = {}
        if eig_method == "warm":
            # the SDF/deform geometry moves faster per iteration than the
            # scalar shape tasks; a periodic host re-anchor bounds drift
            from .warm_eigs import WarmShapeEigensolver

            self.warm = WarmShapeEigensolver(
                self.marching.num_grid_verts + self.marching.num_edges,
                mode_num + extra_modes,
                dtype=jnp.float32 if jax.default_backend() != "cpu" else self.dtype,
                reanchor_every=reanchor_every,
            )
        else:
            self.warm = None
        self.refresh_every = refresh_every
        self._steps_since_refresh = 0

    def _lame(self):
        return lame_params(self.mat.youngs / self.mat.density, self.mat.poisson)

    def init_params(self, key):
        return self.geo.init_params(key)

    # -- stage 1: voxel-constraint pretraining ------------------------------

    def pretrain_sdf(self, params, query_points, signed_distance,
                     iters: int = 2000, lr: float = 1e-4, margin: float = 0.0,
                     verbose: bool = False):
        q = jnp.asarray(query_points)
        sd = jnp.asarray(signed_distance)
        opt = optax.adam(lr)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state):
            loss, g = jax.value_and_grad(
                lambda p: self.geo.mesh_template_loss(p, q, sd, margin)
            )(params)
            updates, opt_state = opt.update(g, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        for i in range(iters):
            params, opt_state, loss = step(params, opt_state)
            if verbose and i % 500 == 0:
                print(f"  sdf pretrain {i}: {float(loss):.6f}")
            if float(loss) == 0.0:
                break
        return params

    # -- marching + eigensolve ---------------------------------------------

    def _march_params(self, params):
        pos = self.geo.deformed_verts(params)
        sdf = self.geo.sdf(params)
        return self.marching(pos, sdf)

    def _eigensolve_host(self, out, comp, k):
        verts_c = np.asarray(out.all_verts)[comp["keep_idx"]]
        with jax.default_device(jax.devices("cpu")[0]):
            ops = assembly.build_element_ops(
                jnp.asarray(verts_c), jnp.asarray(comp["tets"]), 1,
                dtype=jnp.float64,
                tet_mask=jnp.asarray(comp["tet_mask"], jnp.float64),
            )
        mu, lam = self._lame()
        K, M = assembly.assemble_scipy(ops, mu, lam, 1.0)
        n = 3 * comp["num_verts"]
        vals, vecs = eigsh_shift_invert(K[:n, :n], M[:n, :n], k=k, sigma=self.sigma)
        U = np.zeros((3 * len(comp["keep_idx"]), k))
        U[:n] = vecs
        return vals, U

    def gt_eigenvalues_from_mesh(self, mesh) -> np.ndarray:
        """GT corrected eigenvalues of a reference tet mesh (64 modes)."""
        from ..models.sound_obj import DiffSoundObject

        obj = DiffSoundObject(
            mesh=mesh, mode_num=self.mode_num, order=1, mat=self.mat,
            task="gt", dtype=jnp.float64,
        )
        eig = obj.eigen_decomposition(method="arpack", sigma=self.sigma)
        return np.asarray(obj.get_vals({}, eig))

    # -- stage 2: eigenvalue-driven shape optimization ----------------------

    def _loss_core(self, params, keep_idx, tets_c, tet_mask, lam, U,
                   target, q, sd, margin):
        template = self.geo.mesh_template_loss(params, q, sd, margin)
        out = self._march_params(params)
        verts_c = out.all_verts[keep_idx]
        ops = assembly.build_element_ops(
            verts_c, tets_c, 1, dtype=self.dtype, tet_mask=tet_mask
        )
        mu, lame_l = self._lame()
        vals = ritz_refined_eigenvalues(
            lambda x: assembly.k_matvec(ops, x, mu, lame_l),
            lambda x: assembly.m_matvec(ops, x, 1.0),
            U,
        )[self.extra_modes :]
        eig_loss = jnp.sqrt(jnp.mean((vals - target) ** 2 / target**2))
        return template + 2e-4 * eig_loss, (template, eig_loss)

    def step_loss_grad(self, params, target, q, sd, margin=0.0):
        import time as _time

        timing = {}
        t0 = _time.perf_counter()
        # detached march runs host-side: pull the (small) params once and
        # keep all bulk outputs on the CPU for compaction
        cpu = jax.devices("cpu")[0]
        params_host = jax.device_put(
            jax.tree.map(lambda x: np.asarray(x), params), cpu
        )
        out = self._march_params(params_host)
        comp = MarchingTets.compact(out)
        timing["march_s"] = _time.perf_counter() - t0
        t0 = _time.perf_counter()
        k = len(target) + self.extra_modes
        host_path = self.warm is None or k != self.warm.k
        if host_path:
            # host path (also covers the experiment's mode-count sweep,
            # where k differs from the warm solver's fixed basis width)
            lam, U = self._eigensolve_host(out, comp, k)
        else:
            mapped = None
            if (
                self.refresh_every > 1
                and self._steps_since_refresh + 1 < self.refresh_every
            ):
                mapped = self.warm.map_only(out, comp)
            if mapped is not None:
                self._steps_since_refresh += 1
                lam, U = mapped
            else:
                self._steps_since_refresh = 0
                mu, lame_l = self._lame()
                lam, U = self.warm.solve(
                    out, comp, float(mu), float(lame_l),
                    host_solve=lambda: self._eigensolve_host(out, comp, k),
                )

        jax.block_until_ready(U)
        timing["solve_s"] = _time.perf_counter() - t0
        if host_path:
            timing["solve_mode"] = "host"
            timing["solve_iters"] = 0
        else:
            timing["solve_mode"] = self.warm.last_mode
            timing["solve_iters"] = self.warm.last_iterations
        t0 = _time.perf_counter()
        key = (len(comp["keep_idx"]), comp["tets"].shape[0])
        if key not in self._loss_cache:
            self._loss_cache[key] = jax.jit(
                jax.value_and_grad(self._loss_core, has_aux=True)
            )
        fn = self._loss_cache[key]
        (loss, aux), g = fn(
            params,
            jnp.asarray(comp["keep_idx"]),
            jnp.asarray(comp["tets"]),
            jnp.asarray(comp["tet_mask"], self.dtype),
            jnp.asarray(lam, self.dtype),
            jnp.asarray(U, self.dtype),
            jnp.asarray(target, self.dtype),
            q, sd, margin,
        )
        jax.block_until_ready(loss)
        timing["loss_grad_s"] = _time.perf_counter() - t0
        return loss, aux, g, comp, out, timing

    def optimize(self, params, target, query_points, signed_distance,
                 iters: int = 1000, lr: float = 1e-5, margin: float = 0.0,
                 verbose: bool = True, on_iter=None, time_budget_s=None,
                 on_best=None):
        """on_iter(rec): called per iteration with the metric record —
        stream metrics so a crash/kill keeps the history (same post-
        mortem as the joint task's round-2 empty evidence files).

        time_budget_s: optional wall-clock deadline — the loop exits
        cleanly when exceeded so the caller still gets the best mesh and
        full history (a hard kill would lose the export).

        on_best(best): called whenever the best mesh improves (after the
        compaction pull, so best["verts"]/["tets"] are host arrays) — a
        relay wedge mid-run kills the process without unwinding the
        loop, so callers that only export after optimize() returns lose
        the mesh (observed: round-5 oloid run 1)."""
        import time as _time

        t_start = _time.perf_counter()
        q = jnp.asarray(query_points)
        sd = jnp.asarray(signed_distance)
        tgt = np.asarray(target)
        sched = optax.exponential_decay(lr, 100, 0.8, staircase=True)
        opt = optax.adam(sched)
        opt_state = opt.init(params)
        best = {"loss": np.inf, "mesh": None}
        history = []
        for it in range(iters):
            try:
                loss, (tmpl, eig_l), g, comp, out, timing = self.step_loss_grad(
                    params, tgt, q, sd, margin
                )
            except Exception as e:  # degenerate meshes crash the solver
                print(f"iter {it}: eigensolve failed ({e}); skipping step")
                continue
            updates, opt_state = opt.update(g, opt_state)
            params = optax.apply_updates(params, updates)
            rec = {"iter": it, "loss": float(loss),
                   "template": float(tmpl), "eig": float(eig_l)}
            rec.update(timing)
            history.append(rec)
            if on_iter is not None:
                on_iter(rec)
            if float(loss) < best["loss"]:
                vc = np.asarray(out.all_verts)[comp["keep_idx"]][: comp["num_verts"]]
                tc = comp["tets"][: comp["num_tets"]]
                best = {"loss": float(loss), "verts": vc, "tets": tc,
                        "eig_loss": float(eig_l)}
                if on_best is not None:
                    on_best(best)
            if verbose and it % 10 == 0:
                print(f"iter {it}: loss {float(loss):.6f} "
                      f"(template {float(tmpl):.6f}, eig {float(eig_l):.6f}) "
                      f"[{timing.get('solve_mode', 'host')}/"
                      f"{timing.get('solve_iters', 0)} "
                      f"march {timing['march_s']:.2f}s solve "
                      f"{timing['solve_s']:.2f}s grad "
                      f"{timing['loss_grad_s']:.2f}s]",
                      flush=True)
            if (time_budget_s is not None
                    and _time.perf_counter() - t_start > time_budget_s):
                print(f"iter {it}: time budget {time_budget_s:.0f}s reached "
                      f"after {it + 1}/{iters} iters; stopping", flush=True)
                break
        return params, best, history
