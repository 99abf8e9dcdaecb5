"""DiffSoundObject: the central differentiable modal model.

Capability parity with the reference `DiffSoundObj`
(/root/reference/src/diffelastic/diff_model.py:115-399) re-designed for
TPU: matrix-free element operators instead of sparse assembly, on-device
warm-started LOBPCG instead of the CPU ARPACK round trip, and all
per-step work inside one jit program.

The eigensolve operates on the diagonally-scaled pencil

    (D K D) y = lambda (D M D) y,   D = diag(K)^(-1/2),  x = D y

which leaves eigenvalues untouched, keeps f32 Gram matrices well-scaled,
and turns Jacobi preconditioning into the identity.  Material constants
are density-normalized (E/rho, unit density) throughout — the reference's
`LinearElastic` hints at this (material_model.py:64); eigenvalues are
invariant.

Frequencies are differentiable via the Rayleigh correction
(`solvers.diff_eigs`), identical in spirit to diff_model.py:371-399.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..fem import assembly
from ..fem.material import Material, lame_params
from ..fem.mesh import TetMesh
from ..solvers.arpack import eigsh_shift_invert
from ..solvers.diff_eigs import rayleigh_corrected_eigenvalues, undamped_frequencies
from ..solvers.lobpcg import lobpcg
from .material_model import MaterialBins


class EigenState(NamedTuple):
    """Detached eigensolver output (k = mode_num + 6, rigid modes first)."""

    eigenvalues: jax.Array  # (k,)
    eigenvectors: jax.Array  # (3V, k), M-orthonormal
    iterations: jax.Array  # ()
    residual: jax.Array  # (k,)


class ModalCache(NamedTuple):
    """Per-refresh quadratic forms for fixed-geometry material inference.

    K is linear in the Lame scalars (K = mu K_mu + lambda K_lam), so the
    Rayleigh correction diag(U^T K U) - lam diag(U^T M U) collapses to
        lam~ = lam + mu q_mu + lambda q_lam - lam q_m
    with (q_mu, q_lam, q_m) computed ONCE per eigensolve refresh.  The
    per-step corrected eigenvalues (and their exact material gradients)
    are then O(mode_num) elementwise work — the reference instead pushes
    every mode through its full per-gauss-point stress pipeline every
    epoch (diff_model.py:314-328, 381-386)."""

    eigenvalues: jax.Array  # (k,) detached
    q_mu: jax.Array  # (k,) diag(U^T K_mu U)
    q_lam: jax.Array  # (k,) diag(U^T K_lam U)
    q_m: jax.Array  # (k,) diag(U^T M U)


class DiffSoundObject:
    """Differentiable modal sound model bound to one tet mesh.

    task: "material" (trainable E + nu), "mat_baseline" (trainable E only),
    or "gt" (fixed table material) — mirrors build_model
    (diff_model.py:98-113).
    """

    def __init__(
        self,
        mesh: TetMesh = None,
        mode_num: int = 16,
        order: int = 1,
        mat=None,
        task: str = "gt",
        mesh_path: str = None,
        dtype=jnp.float32,
        extra_modes: int = 6,
    ):
        if mesh is None:
            if mesh_path is None:
                raise ValueError("need mesh or mesh_path")
            if mesh_path.endswith(".obj"):
                mesh = TetMesh.from_triangle_mesh(mesh_path)
            else:
                mesh = TetMesh.from_file(mesh_path)
        if mesh.order != order:
            if mesh.order != 1:
                raise ValueError("mesh order mismatch")
            mesh = mesh.to_high_order(order)
        self.mesh = mesh
        self.order = order
        self.mode_num = mode_num
        self.extra_modes = extra_modes  # rigid-body modes solved then dropped
        self.task = task
        self.dtype = dtype
        self.mat = Material.of(mat) if mat is not None else Material.of((2700, 7.2e10, 0.19, 6, 1e-7))
        self.bins = MaterialBins(self.mat, learn_poisson=(task == "material"))

        self.ops = assembly.build_element_ops_jit(
            jnp.asarray(mesh.vertices), jnp.asarray(mesh.tets), order, dtype=dtype
        )
        self.num_dof = 3 * self.ops.num_vertices
        self._host_ops = None

    def host_ops(self):
        """f64 element ops built and kept on the host CPU — the sparse
        ARPACK path must not pull the (possibly remote) device arrays:
        device->host bandwidth can be orders of magnitude below
        host->device on tunneled TPU setups."""
        if self._host_ops is None:
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                self._host_ops = assembly.build_element_ops(
                    jax.device_put(jnp.asarray(self.mesh.vertices), cpu),
                    jax.device_put(jnp.asarray(self.mesh.tets), cpu),
                    self.order,
                    dtype=jnp.float64,
                )
        return self._host_ops

    # -- parameters ---------------------------------------------------------

    def init_params(self, key, pretrain: bool = True):
        if self.task == "gt":
            return {}
        params = self.bins.init_params(key, dtype=jnp.float32)
        if pretrain:
            params = self.bins.pretrain(params)
        return params

    def material_lame(self, params):
        """Density-normalized (mu, lambda) from params (or the fixed table
        material for the gt task)."""
        if self.task == "gt" or not params:
            return lame_params(self.mat.youngs / self.mat.density, self.mat.poisson)
        mu, lam = self.bins.lame(params, density_normalized=True)
        return mu.astype(self.dtype), lam.astype(self.dtype)

    # -- eigensolve (detached) ---------------------------------------------

    def _k_fn(self, mu, lam):
        return lambda x: assembly.k_matvec(self.ops, x, mu, lam)

    def _m_fn(self):
        return lambda x: assembly.m_matvec(self.ops, x, 1.0)

    @functools.partial(jax.jit, static_argnums=0)
    def _lobpcg_solve(self, mu, lam, x0):
        d = assembly.k_diag(self.ops, mu, lam)
        dsc = jax.lax.rsqrt(jnp.maximum(d, jnp.finfo(self.dtype).tiny))
        # freeze the material into the element blocks once per solve —
        # everything below the while_loop then reuses the pre-split
        # operator (XLA does not hoist the recombine+split on its own)
        fz = assembly.freeze_stiffness(self.ops, mu, lam)
        kf = lambda y: assembly.k_matvec_frozen(self.ops, fz, y)
        mf = self._m_fn()
        a_fn = lambda y: dsc[:, None] * kf(dsc[:, None] * y)
        b_fn = lambda y: dsc[:, None] * mf(dsc[:, None] * y)
        # f32 tolerance sits just above the matvec noise floor (measured
        # ~6e-4 relative residual for a converged basis on the bowl) —
        # Ritz-value error is O(residual^2), measured ~4e-5 relative
        # frequencies at this floor.  A tighter tol burns the whole
        # iteration budget chasing roundoff; warm refreshes then exit in
        # a few iterations.
        # The f32 warm path also carries/rotates the A S, B S products
        # (reuse_products): short refreshes never accumulate enough
        # rotation roundoff to matter at the 1e-3 tolerance, and matvec
        # columns per iteration drop from 5m to 2m.
        res = lobpcg(
            a_fn,
            b_fn,
            x0 / dsc[:, None],
            max_iters=40 if self.dtype == jnp.float32 else 300,
            # f64 tol sits just above the pencil's residual noise floor
            # (measured ~2e-8 right after a warm start on the bowl; 1e-9
            # burns ~40 extra iterations hovering in roundoff).  Ritz
            # error is O(residual^2), so eigenvalues are ~1e-15 relative.
            tol=1e-3 if self.dtype == jnp.float32 else 1e-8,
            reuse_products=self.dtype == jnp.float32,
        )
        vecs = dsc[:, None] * res.eigenvectors
        return EigenState(
            res.eigenvalues, vecs, res.iterations, res.residual_norms
        )

    def eigen_decomposition(
        self,
        params=None,
        prev: Optional[EigenState] = None,
        method: str = "auto",
        key=None,
        sigma: float = 20000.0,
    ) -> EigenState:
        """Solve the generalized pencil for mode_num + extra_modes smallest
        eigenpairs.

        method="auto" (default): cold starts use the host ARPACK
        shift-invert (LOBPCG with simple Jacobi preconditioning converges
        too slowly from random vectors on ill-conditioned shell meshes),
        while refreshes warm-started from `prev` run entirely on device —
        measured on the reference bowl mesh (ord 2, 53k DOF): 7 LOBPCG
        iterations to 1e-13 residual after a 2% material change, vs 300+
        stalled iterations cold.  The training loop therefore pays the
        host round trip once per material pair, not once per refresh
        (the reference pays it every 15 epochs, diff_model.py:335-369)."""
        k = self.mode_num + self.extra_modes
        mu, lam = jax.lax.stop_gradient(self.material_lame(params))
        if method == "auto":
            method = "lobpcg" if prev is not None else "arpack"
        if method == "arpack":
            K, M = assembly.assemble_scipy(
                self.host_ops(), float(mu), float(lam), 1.0
            )
            vals, vecs = eigsh_shift_invert(K, M, k=k, sigma=sigma)
            return EigenState(
                jnp.asarray(vals, self.dtype),
                jnp.asarray(vecs, self.dtype),
                jnp.asarray(0),
                jnp.zeros((k,), self.dtype),
            )
        if prev is not None:
            x0 = prev.eigenvectors
        else:
            if key is None:
                key = jax.random.PRNGKey(0)
            x0 = jax.random.normal(key, (self.num_dof, k), self.dtype)
        return self._lobpcg_solve(mu, lam, x0)

    def eigen_decomposition_at_lame(
        self, mu: float, lam: float, prev: Optional[EigenState] = None,
        sigma: float = 20000.0,
    ) -> EigenState:
        """eigen_decomposition at EXPLICIT density-normalized Lame values
        (the modal-Newton fit iterates over materials without bin params;
        models/modal_fit.py).  Warm LOBPCG when prev is given, host ARPACK
        cold."""
        k = self.mode_num + self.extra_modes
        if prev is not None:
            return self._lobpcg_solve(
                jnp.asarray(mu, self.dtype), jnp.asarray(lam, self.dtype),
                prev.eigenvectors,
            )
        K, M = assembly.assemble_scipy(self.host_ops(), float(mu), float(lam), 1.0)
        vals, vecs = eigsh_shift_invert(K, M, k=k, sigma=sigma)
        return EigenState(
            jnp.asarray(vals, self.dtype), jnp.asarray(vecs, self.dtype),
            jnp.asarray(0), jnp.zeros((k,), self.dtype),
        )

    # -- per-refresh quadratic-form cache ----------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def _modal_cache(self, eig_eigenvalues, eig_eigenvectors) -> ModalCache:
        U = eig_eigenvectors
        ku_mu = assembly.k_matvec(self.ops, U, 1.0, 0.0)
        ku_lam = assembly.k_matvec(self.ops, U, 0.0, 1.0)
        mu_ = assembly.m_matvec(self.ops, U, 1.0)
        return ModalCache(
            eigenvalues=eig_eigenvalues,
            q_mu=jnp.sum(U * ku_mu, axis=0),
            q_lam=jnp.sum(U * ku_lam, axis=0),
            q_m=jnp.sum(U * mu_, axis=0),
        )

    @functools.partial(jax.jit, static_argnums=0)
    def _refresh_fused(self, params, x0):
        mu, lam = jax.lax.stop_gradient(self.material_lame(params))
        eig = self._lobpcg_solve(mu, lam, x0)
        cache = self._modal_cache(
            jax.lax.stop_gradient(eig.eigenvalues),
            jax.lax.stop_gradient(eig.eigenvectors),
        )
        return eig, cache

    def refresh(self, params, prev: EigenState):
        """Warm LOBPCG refresh + modal cache in ONE device dispatch.

        The training loop's hot refresh: the tunneled chip pays ~30 ms
        relay round trip per dispatch, and the eager
        eigen_decomposition -> modal_cache sequence costs several
        (material_lame small ops, solve, cache).  Fusing them leaves one."""
        return self._refresh_fused(params, prev.eigenvectors)

    def modal_cache(self, eig: EigenState) -> ModalCache:
        """Quadratic forms for the cached differentiable-eigenvalue path
        (fixed geometry only)."""
        return self._modal_cache(
            jax.lax.stop_gradient(eig.eigenvalues),
            jax.lax.stop_gradient(eig.eigenvectors),
        )

    def corrected_eigenvalues_cached(self, params, cache: ModalCache):
        """lam~ from the cache — exactly equal to the matvec path for
        isotropic material (K linear in mu, lambda), at O(k) cost."""
        mu, lam = self.material_lame(params)
        ev = jax.lax.stop_gradient(cache.eigenvalues)
        return ev + mu * cache.q_mu + lam * cache.q_lam - ev * cache.q_m

    def get_undamped_freqs_cached(self, params, cache: ModalCache):
        lams = self.corrected_eigenvalues_cached(params, cache)[self.extra_modes :]
        return undamped_frequencies(lams)

    # -- differentiable eigenvalues / frequencies --------------------------

    def corrected_eigenvalues(self, params, eig: EigenState):
        """All k corrected eigenvalues (rigid modes included), f32,
        differentiable w.r.t. params."""
        mu, lam = self.material_lame(params)
        return rayleigh_corrected_eigenvalues(
            self._k_fn(mu, lam), self._m_fn(), eig.eigenvalues, eig.eigenvectors
        )

    def get_vals(self, params, eig: EigenState):
        """Corrected non-rigid eigenvalues (mode_num,) — the shape-task
        target quantity (parity: get_vals, diff_model.py:390-399)."""
        return self.corrected_eigenvalues(params, eig)[self.extra_modes :]

    def get_undamped_freqs(self, params, eig: EigenState):
        """Non-rigid undamped frequencies (mode_num,) in Hz (parity:
        get_undamped_freqs, diff_model.py:371-388)."""
        return undamped_frequencies(self.get_vals(params, eig))


def build_model(
    mesh_path: str = None,
    mesh: TetMesh = None,
    mode_num: int = 16,
    order: int = 1,
    mat=None,
    task: str = "gt",
    dtype=jnp.float32,
) -> DiffSoundObject:
    """Reference-shaped constructor (diff_model.py:98-113)."""
    if task not in ("material", "mat_baseline", "gt"):
        raise ValueError(f"task {task} not defined")
    return DiffSoundObject(
        mesh=mesh,
        mesh_path=mesh_path,
        mode_num=mode_num,
        order=order,
        mat=mat,
        task=task,
        dtype=dtype,
    )
