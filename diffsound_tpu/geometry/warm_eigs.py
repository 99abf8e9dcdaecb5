"""Device-resident warm-started eigensolver for shape tasks.

The reference re-runs CPU ARPACK shift-invert from scratch every
iteration of the thickness / morphing / geometry loops
(/root/reference/experiments/thickness_train.py:42-90 ->
dmtet_thickness.py:287-292 -> diff_model.py:335-369) — the dominant cost
of every shape task.  This module removes both the host eigensolve AND
the host round trip of the basis from the steady state:

  * the eigenvector basis lives in GLOBAL background-grid slot
    coordinates ((V + Eg + 1) x 3 x k, last row = scatter dump) — the one
    indexing that is stable across remeshes.  Marching-tets compaction
    changes the vertex count every iteration, but old and new compact
    meshes index the same global slots, so the basis maps across the
    remesh by gather (new keep_idx) / scatter (keep_idx with pads
    redirected to the dump row);
  * gather -> diagonally-scaled LOBPCG over the bucket-padded element
    operators -> scatter-back are ONE jitted program per bucket
    signature; the (slots, 3, k) storage is donated through it and never
    crosses the host boundary (on a tunneled TPU the basis alone is
    ~20 MB/iteration of transfers at ~MB/s — measured 80 s/iteration on
    the grid-64 thickness task before this design);
  * pad rows need no spurious-eigenvalue shifting: the capacity-padded
    operators never read or write them, and `lobpcg(row_mask=...)` keeps
    the solver's internal random vectors zero there;
  * cold starts (first iteration, low slot overlap after a topology
    jump, a diverged-residual escalation, or an explicit re-anchor
    cadence) fall back to host ARPACK and push the basis once.

Budget calibration (grid-64 thickness, 67k DOF, 38 modes, measured on
the tunneled v5e): one device LOBPCG iteration ~170 ms in recompute
mode; a host ARPACK escalation 70-120 s.  Small optimizer steps warm in
10-25 iterations; remesh jumps need ~100+ — so the iteration cap is set
high (240 ~ 40 s worst case, converged early exit typical) and the
residual escalation only fires for genuinely diverged bases.

Eigenvalue accuracy: the Rayleigh correction downstream is first-order
exact in the material/geometry params and O(residual^2) in the basis
error, so the warm tolerance only needs to sit at the f32 matvec noise
floor (cf. models/sound_obj.py).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fem import assembly
from ..solvers.lobpcg import lobpcg


class WarmShapeEigensolver:
    def __init__(
        self,
        num_global_slots: int,
        k: int,
        dtype=jnp.float32,
        max_iters: int = 240,
        tol: Optional[float] = None,
        reanchor_every: int = 0,
        min_overlap: float = 0.6,
        reuse_products="auto",
        guards: int = 8,
        escalation_body: str = "recompute",
    ):
        """num_global_slots: V + Eg of the background grid (rows of
        MarchingOutput.all_verts).  k: modes incl. the rigid block.
        reanchor_every: force a host cold solve every N warm solves
        (0 = never).  min_overlap: minimum fraction of the new mesh's
        vertices already present in the stored basis."""
        self.num_global_slots = num_global_slots
        self.k = k
        # guard columns absorb the slowly-separating directions just above
        # the wanted block (remesh perturbations overlap them strongly);
        # they ride along in the stored basis and never gate convergence
        self.guards = guards
        self.kg = k + guards
        self.dtype = dtype
        self.max_iters = max_iters
        if tol is None:
            # Ritz-value error is O(residual^2): a 1e-2 residual basis
            # measures 1.5e-4 relative eigenvalue error on the grid-64
            # shell (vs fresh ARPACK) — far below what the eigenvalue
            # losses resolve.  Chasing 1e-3 instead stalls the f32 solver
            # ~1e-2 on remesh-perturbed thin-shell bases and burns the
            # whole iteration budget for nothing (measured: 240 iters /
            # 40 s per optimizer step at tol 1e-3 vs early exit at 1e-2).
            # f64 (CPU tests): comfortably converged.
            # f64: 1e-4 residual -> O(1e-8) relative Ritz error, far below
            # what the eigenvalue losses resolve; 1e-5 burned ~2x the
            # LOBPCG iterations per optimizer step for nothing
            tol = 3e-3 if dtype == jnp.float32 else 1e-4
        self.tol = tol
        self.reanchor_every = reanchor_every
        self.min_overlap = min_overlap
        # reuse_products caps the attainable residual after ~50+ carried
        # rotations (the products drift — see solvers/lobpcg.py).  "auto"
        # (default) runs the FIRST round with carried products (the steady
        # state converges in 10-25 iterations, well inside the drift
        # budget, at ~2.5x lower matvec cost: 2m vs 6m operator columns
        # per iteration) and lets the existing residual-escalation rounds
        # use the robust recompute body for remesh jumps.
        self.reuse_products = reuse_products
        # the body used by the in-solver escalation round when the first
        # (carried-products) round caps above the escalation bound:
        # "recompute" (default, robust) or "reuse" — re-entering the
        # solve rebuilds the carried products from the current basis, so
        # rotation drift resets each round while the body stays the
        # cheap 2m-column one (A/B data: benchmarks/diagnostics/
        # warm_policy_probe.py)
        self.escalation_body = escalation_body

        self.U_global = None  # device (slots + 1, 3, k); row slots = dump
        self.seen = np.zeros(num_global_slots, bool)
        # host copy of each seen slot's last position: nearest-neighbor
        # source for filling brand-new slots (newly crossing edges) whose
        # zero basis rows otherwise stall the refresh for 100s of
        # iterations (the displacement field is smooth, so the nearest
        # seen slot's row is an excellent local init)
        self.slot_pos = np.full((num_global_slots, 3), np.nan, np.float64)
        self.warm_count = 0  # consecutive warm solves since last anchor
        self.total_warm = 0
        self.total_cold = 0
        self.total_mapped = 0
        self.last_iterations = 0
        self.last_resid = 0.0  # max residual of the last warm solve
        self.last_mode = "none"
        self._anchor_requested = False
        self.last_vals = None  # (k,) numpy from the last true solve
        self._solve_cache = {}
        self._store_fn = None
        self._copy_fn = None
        self._gather_fn = None

    # -- host <-> device basis management -----------------------------------

    def _ensure_storage(self):
        if self.U_global is None:
            self.U_global = jnp.zeros(
                (self.num_global_slots + 1, 3, self.kg), jnp.float32
            )

    def _keep_store(self, comp) -> np.ndarray:
        """keep_idx with pad rows redirected to the dump slot (duplicate
        scatter targets on slot 0 would otherwise race)."""
        keep = np.asarray(comp["keep_idx"]).copy()
        keep[comp["num_verts"]:] = self.num_global_slots
        return keep

    def store_host(self, comp, U: np.ndarray):
        """Push a host basis (cold solves) into the device storage."""
        self._ensure_storage()
        if self._store_fn is None:
            donate = () if jax.default_backend() == "cpu" else (0,)
            self._store_fn = jax.jit(
                lambda Ug, keep, U3: Ug.at[keep].set(U3),
                donate_argnums=donate,
            )
        vpad = len(comp["keep_idx"])
        U = np.asarray(U, np.float32)
        if U.shape[1] < self.kg:  # host bases are k wide; zero-pad guards
            U = np.concatenate(
                [U, np.zeros((U.shape[0], self.kg - U.shape[1]), np.float32)],
                axis=1,
            )
        U3 = jnp.asarray(U.reshape(vpad, 3, self.kg))
        self.U_global = self._store_fn(
            self.U_global, jnp.asarray(self._keep_store(comp)), U3
        )
        keep_nv = np.asarray(comp["keep_idx"])[: comp["num_verts"]]
        self.seen[keep_nv] = True

    def mark_positions(self, out, comp):
        """Record the current positions of this mesh's slots (nearest-
        neighbor source data for `_fill_new_slots`)."""
        keep_nv = np.asarray(comp["keep_idx"])[: comp["num_verts"]]
        self.slot_pos[keep_nv] = np.asarray(out.all_verts)[keep_nv]

    def _fill_new_slots(self, out, comp):
        """Copy the nearest seen slot's basis row into each unseen slot of
        the new mesh (device-side row copy driven by a host KD query)."""
        nv = comp["num_verts"]
        keep = np.asarray(comp["keep_idx"])[:nv]
        new_mask = ~self.seen[keep]
        if not new_mask.any():
            return
        seen_ids = np.flatnonzero(self.seen)
        if len(seen_ids) == 0:
            return
        from scipy.spatial import cKDTree

        tree = cKDTree(self.slot_pos[seen_ids])
        pos_new = np.asarray(out.all_verts)[keep[new_mask]]
        _, nn = tree.query(pos_new, k=1)
        src = seen_ids[nn]
        dst = keep[new_mask]
        if self._copy_fn is None:
            self._copy_fn = jax.jit(
                lambda Ug, d, s: Ug.at[d].set(Ug[s]),
                donate_argnums=() if jax.default_backend() == "cpu" else (0,),
            )
        self.U_global = self._copy_fn(
            self.U_global, jnp.asarray(dst), jnp.asarray(src)
        )

    def overlap(self, comp) -> float:
        nv = comp["num_verts"]
        keep = np.asarray(comp["keep_idx"])[:nv]
        return float(self.seen[keep].mean()) if nv else 0.0

    # -- the fused jitted gather + solve + scatter-back ---------------------

    def _solve_fn(self, vpad: int, tpad: int, D: int, reuse: bool):
        key = (vpad, tpad, D, reuse)
        if key not in self._solve_cache:

            def core(U_global, keep_gather, keep_store, verts_c, tets_c,
                     tet_mask, gather_idx, dof_mask, mu, lam):
                x0 = U_global[keep_gather].reshape(3 * vpad, self.kg)
                x0 = x0 * dof_mask[:, None]
                # dead guard columns (zero after a host anchor) are
                # replaced inside lobpcg's orthonormalization only if
                # they stay dependent; seed them cheaply here
                key = jax.random.PRNGKey(1)
                noise = jax.random.normal(key, x0.shape, x0.dtype) * dof_mask[:, None]
                norms = jnp.linalg.norm(x0, axis=0)
                x0 = jnp.where(norms[None, :] > 0, x0, noise)
                ops = assembly.build_element_ops(
                    verts_c, tets_c, 1, dtype=self.dtype, tet_mask=tet_mask
                )
                # host-precomputed scatter->gather transpose (TPU scatter
                # is serialized; the gather runs at memory bandwidth)
                ops = ops._replace(gather_idx=gather_idx)
                d = assembly.k_diag(ops, mu, lam)
                d = jnp.where(dof_mask > 0, d, 1.0)
                dsc = jax.lax.rsqrt(jnp.maximum(d, jnp.finfo(self.dtype).tiny))
                fz = assembly.freeze_stiffness(ops, mu, lam)
                a_fn = lambda y: dsc[:, None] * assembly.k_matvec_frozen(
                    ops, fz, dsc[:, None] * y
                )
                b_fn = lambda y: dsc[:, None] * assembly.m_matvec(
                    ops, dsc[:, None] * y, 1.0
                )
                res = lobpcg(
                    a_fn,
                    b_fn,
                    x0 / dsc[:, None],
                    max_iters=self.max_iters,
                    tol=self.tol,
                    reuse_products=reuse,
                    row_mask=dof_mask,
                    num_wanted=self.k,
                )
                vecs = dsc[:, None] * res.eigenvectors  # (3vpad, kg)
                U3 = vecs.astype(jnp.float32).reshape(vpad, 3, self.kg)
                U_new = U_global.at[keep_store].set(U3)
                return (
                    res.eigenvalues[: self.k],
                    vecs[:, : self.k],
                    U_new,
                    res.iterations,
                    res.residual_norms[: self.k],
                )

            donate = () if jax.default_backend() == "cpu" else (0,)
            self._solve_cache[key] = jax.jit(core, donate_argnums=donate)
        return self._solve_cache[key]

    # -- refresh-free basis mapping ------------------------------------------

    def map_only(self, out, comp):
        """Map the stored basis onto the current (remeshed) geometry
        WITHOUT an eigensolve: (last_vals (k,), U (3*vpad, k) device).

        The Rayleigh correction downstream is exact to first order in the
        drift since the last true solve, so shape-task loops can refresh
        on a cadence (the reference's own every-15-epochs amortization,
        material_sync_train.py:134-140, applied to the shape tasks that
        re-solve every iteration) and merely map in between — measured
        262 s for ONE post-remesh refresh at geometry's 64-mode scale on
        CPU vs ~0.01 s for the map.  Returns None when no solved basis
        exists yet (caller must refresh)."""
        if self.U_global is None or self.last_vals is None:
            return None
        if self.overlap(comp) < self.min_overlap:
            return None
        self._fill_new_slots(out, comp)
        if self._gather_fn is None:
            self._gather_fn = jax.jit(
                lambda Ug, keep: Ug[keep]
            )
        vpad = len(comp["keep_idx"])
        U3 = self._gather_fn(
            self.U_global, jnp.asarray(np.asarray(comp["keep_idx"]))
        )
        U = U3.reshape(3 * vpad, self.kg)[:, : self.k]
        dof_mask = np.zeros(3 * vpad, np.float32)
        dof_mask[: 3 * comp["num_verts"]] = 1.0
        U = U * jnp.asarray(dof_mask)[:, None]
        self.total_mapped += 1
        self.last_mode = "mapped"
        return self.last_vals, U

    def _prep_args(self, out, comp, mu: float, lam: float):
        """Host-side argument prep shared by solve() and diagnostics:
        returns (args, (vpad, tpad, D)) where args are the device inputs
        of _solve_fn AFTER U_global."""
        vpad = len(comp["keep_idx"])
        verts_c = np.asarray(out.all_verts)[np.asarray(comp["keep_idx"])]
        dof_mask = np.zeros(3 * vpad, np.float32)
        dof_mask[: 3 * comp["num_verts"]] = 1.0
        # transpose indices from the REAL tets only (padded rows are
        # all-zero contributions and would inflate vertex 0's valence);
        # bucket the valence depth so jit specializations stay bounded
        gidx = assembly.build_gather_transpose(
            comp["tets"][: comp["num_tets"]], vpad
        )
        D = -(-gidx.shape[1] // 16) * 16
        gidx = np.pad(
            gidx, ((0, 0), (0, D - gidx.shape[1])),
            constant_values=4 * comp["num_tets"],
        )
        # dummy row index must point at the zero row appended by _scatter:
        # it is len(flat) = 4 * num_tets for the real-tet layout, but the
        # padded ye has 4 * tpad rows — remap the dummy to that
        tpad = comp["tets"].shape[0]
        gidx = np.where(gidx == 4 * comp["num_tets"], 4 * tpad, gidx)
        args = (
            jnp.asarray(np.asarray(comp["keep_idx"])),
            jnp.asarray(self._keep_store(comp)),
            jnp.asarray(verts_c, self.dtype),
            jnp.asarray(comp["tets"]),
            jnp.asarray(comp["tet_mask"], self.dtype),
            jnp.asarray(gidx),
            jnp.asarray(dof_mask, self.dtype),
            jnp.asarray(mu, self.dtype),
            jnp.asarray(lam, self.dtype),
        )
        return args, (vpad, tpad, D)

    # -- public entry --------------------------------------------------------

    def solve(
        self,
        out,
        comp,
        mu: float,
        lam: float,
        host_solve: Callable[[], Tuple[np.ndarray, np.ndarray]],
    ):
        """Eigensolve the compacted geometry; warm on-device when the
        stored basis covers it, host ARPACK otherwise.  Returns
        (vals (k,) numpy, U (3*vpad, k) DEVICE array) — U feeds the
        jitted loss program without leaving the device."""
        vpad = len(comp["keep_idx"])
        need_cold = self.U_global is None or self._anchor_requested
        if not need_cold and self.reanchor_every:
            need_cold = self.warm_count >= self.reanchor_every
        if not need_cold:
            need_cold = self.overlap(comp) < self.min_overlap
        if need_cold:
            vals, U = host_solve()
            self.store_host(comp, U)
            self.mark_positions(out, comp)
            self.warm_count = 0
            self.total_cold += 1
            self.last_mode = "cold"
            self.last_iterations = 0
            self.last_resid = 0.0
            self._anchor_requested = False
            self.last_vals = np.asarray(vals, np.float64)
            return vals, U

        self._fill_new_slots(out, comp)
        args, (vpad, tpad, D) = self._prep_args(out, comp, mu, lam)
        reuse1 = self.reuse_products is True or self.reuse_products == "auto"
        fn = self._solve_fn(vpad, tpad, D, reuse1)
        vals, U, self.U_global, iters, resid = fn(self.U_global, *args)
        resid = np.asarray(resid)
        # fixed escalation bound: at residual ~3e-2 the Ritz values are
        # still ~1e-3-accurate; beyond it they corrupt the loss landscape
        # (observed as a divergent thickness trajectory when the bound
        # scaled with a relaxed tol)
        esc = max(3e-2, 3.0 * self.tol)
        if np.isfinite(resid).all() and float(resid.max()) > esc:
            # geometry jumped past the budget: continue the SAME device
            # solve from its own output with the robust RECOMPUTE body
            # (a second device round costs max_iters * ~0.2 s, a host
            # ARPACK re-anchor 70-120 s); carried products can't converge
            # long remesh refreshes (rotation drift), recompute can
            fn = self._solve_fn(vpad, tpad, D, self.escalation_body == "reuse")
            vals, U, self.U_global, iters2, resid = fn(self.U_global, *args)
            iters = iters + iters2
            resid = np.asarray(resid)
        if not np.isfinite(resid).all() or float(resid.max()) > esc:
            # genuinely diverged — host re-anchor
            vals, U = host_solve()
            self.store_host(comp, U)
            self.mark_positions(out, comp)
            self.warm_count = 0
            self.total_cold += 1
            self.last_mode = "cold-escalated"
            self.last_iterations = int(iters)
            self.last_resid = 0.0
            self.last_vals = np.asarray(vals, np.float64)
            return vals, U
        keep_nv = np.asarray(comp["keep_idx"])[: comp["num_verts"]]
        self.seen[keep_nv] = True
        self.slot_pos[keep_nv] = np.asarray(out.all_verts)[keep_nv]
        self.warm_count += 1
        self.total_warm += 1
        self.last_mode = "warm"
        self.last_iterations = int(iters)
        self.last_resid = float(resid.max())
        self.last_vals = np.asarray(vals, np.float64)
        return self.last_vals, U

    def request_anchor(self):
        """Force the next solve() to re-anchor on the host — escape hatch
        for callers whose gradient-quality gate keeps tripping (a capped-
        but-not-escalated warm basis can stay subtly wrong for many
        steps; see ThicknessTask.optimize)."""
        self._anchor_requested = True
