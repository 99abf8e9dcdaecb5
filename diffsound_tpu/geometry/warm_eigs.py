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

        self.U_global = None  # device (slots + 1, 3, k); row slots = dump
        self.seen = np.zeros(num_global_slots, bool)
        self.warm_count = 0  # consecutive warm solves since last anchor
        self.total_warm = 0
        self.total_cold = 0
        self.last_iterations = 0
        self.last_mode = "none"
        self._solve_cache = {}
        self._store_fn = None

    # -- host <-> device basis management -----------------------------------

    def _ensure_storage(self):
        if self.U_global is None:
            self.U_global = jnp.zeros(
                (self.num_global_slots + 1, 3, self.k), jnp.float32
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
        U3 = jnp.asarray(
            np.asarray(U, np.float32).reshape(vpad, 3, self.k)
        )
        self.U_global = self._store_fn(
            self.U_global, jnp.asarray(self._keep_store(comp)), U3
        )
        self.seen[np.asarray(comp["keep_idx"])[: comp["num_verts"]]] = True

    def overlap(self, comp) -> float:
        nv = comp["num_verts"]
        keep = np.asarray(comp["keep_idx"])[:nv]
        return float(self.seen[keep].mean()) if nv else 0.0

    # -- the fused jitted gather + solve + scatter-back ---------------------

    def _solve_fn(self, vpad: int, tpad: int, D: int):
        key = (vpad, tpad, D)
        if key not in self._solve_cache:

            def core(U_global, keep_gather, keep_store, verts_c, tets_c,
                     tet_mask, gather_idx, dof_mask, mu, lam):
                x0 = U_global[keep_gather].reshape(3 * vpad, self.k)
                x0 = x0 * dof_mask[:, None]
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
                vecs = dsc[:, None] * res.eigenvectors
                U3 = vecs.astype(jnp.float32).reshape(vpad, 3, self.k)
                U_new = U_global.at[keep_store].set(U3)
                return res.eigenvalues, vecs, U_new, res.iterations, res.residual_norms

            donate = () if jax.default_backend() == "cpu" else (0,)
            self._solve_cache[key] = jax.jit(core, donate_argnums=donate)
        return self._solve_cache[key]

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
        need_cold = self.U_global is None
        if not need_cold and self.reanchor_every:
            need_cold = self.warm_count >= self.reanchor_every
        if not need_cold:
            need_cold = self.overlap(comp) < self.min_overlap
        if need_cold:
            vals, U = host_solve()
            self.store_host(comp, U)
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
        fn = self._solve_fn(vpad, tpad, D)
        vals, U, self.U_global, iters, resid = fn(
            self.U_global,
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
        resid = np.asarray(resid)
        if not np.isfinite(resid).all() or float(resid.max()) > 30.0 * self.tol:
            # geometry jumped too far for the budgeted warm refresh —
            # self-correct with a host re-anchor instead of drifting
            vals, U = host_solve()
            self.store_host(comp, U)
            self.warm_count = 0
            self.total_cold += 1
            self.last_mode = "cold-escalated"
            self.last_iterations = int(iters)
            return vals, U
        self.seen[np.asarray(comp["keep_idx"])[: comp["num_verts"]]] = True
        self.warm_count += 1
        self.total_warm += 1
        self.last_mode = "warm"
        self.last_iterations = int(iters)
        return np.asarray(vals, np.float64), U
