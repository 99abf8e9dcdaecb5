"""Device-resident warm-started eigensolver for shape tasks.

The reference re-runs CPU ARPACK shift-invert from scratch every
iteration of the thickness / morphing / geometry loops
(/root/reference/experiments/thickness_train.py:42-90 ->
dmtet_thickness.py:287-292 -> diff_model.py:335-369) — the dominant cost
of every shape task.  This module removes the host round trip from the
steady state:

  * the eigenvector basis is stored in GLOBAL background-grid slot
    coordinates ((V + Eg) x 3 x k) — the one indexing that is stable
    across remeshes.  Marching-tets compaction changes the vertex count
    every iteration, but both the old and the new compact mesh index
    into the same global slot array, so the previous basis maps onto the
    new mesh by scatter (old keep_idx) + gather (new keep_idx);
  * the mapped basis warm-starts a diagonally-scaled on-device LOBPCG
    over the bucket-padded element operators — same bucket signature =>
    same cached jit program, geometry moves slowly => few iterations;
  * pad rows need no spurious-eigenvalue shifting: the capacity-padded
    operators never read or write them, and `lobpcg(row_mask=...)` keeps
    the solver's internal random vectors zero there, so the padded
    pencil IS the compact pencil;
  * cold starts (first iteration, low slot overlap after a topology
    jump, or an explicit re-anchor cadence) fall back to host ARPACK.

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
        max_iters: int = 80,
        tol: Optional[float] = None,
        reanchor_every: int = 0,
        min_overlap: float = 0.6,
    ):
        """num_global_slots: V + Eg of the background grid (rows of
        MarchingOutput.all_verts).  k: modes incl. the rigid block.
        reanchor_every: force a host cold solve every N warm solves
        (0 = never).  min_overlap: minimum fraction of the new mesh's
        vertices already present in the stored basis."""
        self.num_global_slots = num_global_slots
        self.k = k
        self.dtype = dtype
        self.max_iters = max_iters
        if tol is None:
            # f32: the matvec noise floor; f64: comfortably converged
            # (tighter f64 tols burn the whole iteration budget chasing
            # the last digits; Ritz error is O(resid^2) anyway)
            tol = 1e-3 if dtype == jnp.float32 else 1e-5
        self.tol = tol
        self.reanchor_every = reanchor_every
        self.min_overlap = min_overlap

        self.U_global: Optional[np.ndarray] = None  # (slots, 3, k)
        self.seen = np.zeros(num_global_slots, bool)
        self.warm_count = 0  # consecutive warm solves since last anchor
        self.total_warm = 0
        self.total_cold = 0
        self.last_iterations = 0
        self.last_mode = "none"
        self._solve_cache = {}

    # -- global-slot basis mapping ------------------------------------------

    def store(self, comp, U: np.ndarray):
        """Scatter a compact basis (3*vpad, k) into global slots."""
        nv = comp["num_verts"]
        keep = np.asarray(comp["keep_idx"])[:nv]
        U3 = np.asarray(U).reshape(-1, 3, self.k)[:nv]
        if self.U_global is None:
            self.U_global = np.zeros(
                (self.num_global_slots, 3, self.k), np.float32
            )
        self.U_global[keep] = U3
        self.seen[keep] = True

    def gather(self, comp) -> Tuple[np.ndarray, float]:
        """-> (x0 (3*vpad, k), overlap fraction) for the new mesh."""
        vpad = len(comp["keep_idx"])
        nv = comp["num_verts"]
        keep = np.asarray(comp["keep_idx"])
        x0 = self.U_global[keep]  # (vpad, 3, k)
        x0[nv:] = 0.0
        overlap = float(self.seen[keep[:nv]].mean()) if nv else 0.0
        return x0.reshape(3 * vpad, self.k), overlap

    # -- the jitted warm solve ----------------------------------------------

    def _solve_fn(self, vpad: int, tpad: int, D: int):
        key = (vpad, tpad, D)
        if key not in self._solve_cache:

            def core(verts_c, tets_c, tet_mask, gather_idx, dof_mask, x0, mu, lam):
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
                    reuse_products=self.dtype == jnp.float32,
                    row_mask=dof_mask,
                )
                return (
                    res.eigenvalues,
                    dsc[:, None] * res.eigenvectors,
                    res.iterations,
                    res.residual_norms,
                )

            self._solve_cache[key] = jax.jit(core)
        return self._solve_cache[key]

    # -- public entry --------------------------------------------------------

    def solve(
        self,
        out,
        comp,
        mu: float,
        lam: float,
        host_solve: Callable[[], Tuple[np.ndarray, np.ndarray]],
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Eigensolve the compacted geometry; warm on-device when the
        stored basis covers it, host ARPACK otherwise.  Returns
        (vals (k,), U (3*vpad, k)) like the host path."""
        vpad = len(comp["keep_idx"])
        need_cold = self.U_global is None
        if not need_cold and self.reanchor_every:
            need_cold = self.warm_count >= self.reanchor_every
        overlap = 0.0
        if not need_cold:
            x0, overlap = self.gather(comp)
            need_cold = overlap < self.min_overlap
        if need_cold:
            vals, U = host_solve()
            self.store(comp, U)
            self.warm_count = 0
            self.total_cold += 1
            self.last_mode = "cold"
            self.last_iterations = 0
            return vals, U

        verts_c = np.asarray(out.all_verts)[np.asarray(comp["keep_idx"])]
        dof_mask = np.zeros(3 * vpad, np.float32)
        dof_mask[: 3 * comp["num_verts"]] = 1.0
        # transpose indices from the REAL tets only (padded rows are
        # all-zero contributions and would inflate vertex 0's valence);
        # bucket the valence depth so jit specializations stay bounded
        gidx = assembly.build_gather_transpose(
            comp["tets"][: comp["num_tets"]], vpad
        )
        D = -(-gidx.shape[1] // 8) * 8
        gidx = np.pad(
            gidx, ((0, 0), (0, D - gidx.shape[1])),
            constant_values=4 * comp["num_tets"],
        )
        # dummy row index must point at the zero row appended by _scatter:
        # it is len(flat) = 4 * num_tets for the real-tet layout, but the
        # padded ye has 4 * tpad rows — remap the dummy to that
        tpad = comp["tets"].shape[0]
        gidx = np.where(gidx == 4 * comp["num_tets"], 4 * tpad, gidx)
        fn = self._solve_fn(vpad, tpad, D)
        vals, U, iters, resid = fn(
            jnp.asarray(verts_c, self.dtype),
            jnp.asarray(comp["tets"]),
            jnp.asarray(comp["tet_mask"], self.dtype),
            jnp.asarray(gidx),
            jnp.asarray(dof_mask, self.dtype),
            jnp.asarray(x0, self.dtype),
            jnp.asarray(mu, self.dtype),
            jnp.asarray(lam, self.dtype),
        )
        if not np.isfinite(np.asarray(resid)).all() or float(
            np.max(np.asarray(resid))
        ) > 30.0 * self.tol:
            # geometry jumped too far for the budgeted warm refresh —
            # self-correct with a host re-anchor instead of drifting
            vals, U = host_solve()
            self.store(comp, U)
            self.warm_count = 0
            self.total_cold += 1
            self.last_mode = "cold-escalated"
            self.last_iterations = int(iters)
            return vals, U
        vals = np.asarray(vals, np.float64)
        U = np.asarray(U, np.float64)
        self.store(comp, U)
        self.warm_count += 1
        self.total_warm += 1
        self.last_mode = "warm"
        self.last_iterations = int(iters)
        return vals, U
