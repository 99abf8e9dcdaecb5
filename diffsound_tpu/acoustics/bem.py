"""Helmholtz boundary-element acoustic transfer.

Self-contained replacement for the reference's bempp-cl wrapper
(/root/reference/src/diffelastic/bem.py:15-64): given a vibrating surface
mesh and the normal velocity of a mode (the Neumann data), solve the
exterior Helmholtz boundary equation for the surface pressure and
evaluate the radiated potential at far-field points.

Formulation: direct collocation with piecewise-constant (DP0) elements on
triangles — the same function space the reference uses.  With the
free-space Green's function G(x, y) = e^{ikr} / (4 pi r):

    (-1/2) phi_i + sum_j K_ij phi_j = sum_j V_ij psi_j      (boundary)
    p(x) = sum_j [ dG/dn_y (x, c_j) A_j phi_j - G(x, c_j) A_j psi_j ]

V (single layer) and K (double layer) use centroid quadrature with an
equivalent-disk regularization of the singular self term (the double-
layer self term vanishes on planar panels).  Matrices are dense (F x F)
batched jnp einsums — MXU-friendly — and the system is solved directly;
for large F swap in an iterative solve.

k = omega / c = 2 pi f / 343.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

SPEED_OF_SOUND = 343.0
AIR_DENSITY = 1.225


def _triangle_geometry(verts: np.ndarray, faces: np.ndarray):
    a = verts[faces[:, 0]]
    b = verts[faces[:, 1]]
    c = verts[faces[:, 2]]
    centers = (a + b + c) / 3.0
    n = np.cross(b - a, c - a)
    areas = 0.5 * np.linalg.norm(n, axis=1)
    normals = n / (2.0 * areas[:, None] + 1e-300)
    return centers, areas, normals


class BEMModel:
    """Exterior Helmholtz solve on a triangle surface mesh.

    Parity surface with the reference BEMModel (bem.py:15-64):
    `boundary_equation_solve(neumann)` -> surface pressure coefficients;
    `potential_solve(points)` -> radiated pressure at exterior points.
    """

    def __init__(self, vertices: np.ndarray, faces: np.ndarray, frequency: float):
        self.vertices = np.asarray(vertices, np.float64)
        self.faces = np.asarray(faces, np.int64)
        self.k = 2.0 * np.pi * float(frequency) / SPEED_OF_SOUND
        self.centers, self.areas, self.normals = _triangle_geometry(
            self.vertices, self.faces
        )
        self._phi = None

    # -- kernels ------------------------------------------------------------

    def _green(self, x, y):
        """G(x, y) for x (..., 3), y (F, 3) -> complex (..., F)."""
        r = jnp.linalg.norm(x[..., None, :] - y[None, :, :], axis=-1)
        r = jnp.maximum(r, 1e-12)
        return jnp.exp(1j * self.k * r) / (4.0 * jnp.pi * r)

    def _green_dn(self, x, y, n_y):
        """dG/dn_y (x, y) -> complex (..., F)."""
        d = x[..., None, :] - y[None, :, :]  # (..., F, 3)
        r = jnp.maximum(jnp.linalg.norm(d, axis=-1), 1e-12)
        # dG/dr * dr/dn_y ; dr/dn_y = -(d . n) / r
        dGdr = jnp.exp(1j * self.k * r) * (1j * self.k * r - 1.0) / (
            4.0 * jnp.pi * r**2
        )
        cos = -jnp.sum(d * n_y[None, :, :], axis=-1) / r
        return dGdr * cos

    def _matrices(self):
        c = jnp.asarray(self.centers)
        A = jnp.asarray(self.areas)
        n = jnp.asarray(self.normals)
        V = self._green(c, c) * A[None, :]
        Kd = self._green_dn(c, c, n) * A[None, :]
        # singular self terms: equivalent-disk single layer, zero double layer
        R = jnp.sqrt(A / jnp.pi)
        v_self = R / 2.0  # int_disk 1/(4 pi r) dA = R / 2
        F = len(self.areas)
        eye = jnp.eye(F, dtype=bool)
        V = jnp.where(eye, v_self.astype(V.dtype)[None, :], V)
        Kd = jnp.where(eye, 0.0, Kd)
        return V, Kd

    # -- API ----------------------------------------------------------------

    def boundary_equation_solve(self, neumann: np.ndarray):
        """neumann: per-face dp/dn (F,) (for a mode with normal surface
        acceleration a_n, dp/dn = -rho * a_n).  Returns surface pressure
        phi (F,) complex."""
        V, Kd = self._matrices()
        psi = jnp.asarray(neumann, jnp.complex64 if V.dtype == jnp.complex64 else jnp.complex128)
        F = V.shape[0]
        lhs = -0.5 * jnp.eye(F, dtype=V.dtype) + Kd
        rhs = V @ psi
        self._phi = jnp.linalg.solve(lhs, rhs)
        self._psi = psi
        return self._phi

    def potential_solve(self, points: np.ndarray):
        """Radiated potential at exterior points (P, 3) -> complex (P,)."""
        if self._phi is None:
            raise RuntimeError("call boundary_equation_solve first")
        x = jnp.asarray(points)
        A = jnp.asarray(self.areas)
        n = jnp.asarray(self.normals)
        c = jnp.asarray(self.centers)
        Kx = self._green_dn(x, c, n) * A[None, :]
        Vx = self._green(x, c) * A[None, :]
        return Kx @ self._phi - Vx @ self._psi

    def mode_neumann_from_displacement(self, vert_displacement: np.ndarray,
                                       omega: float):
        """Neumann data for a harmonic mode shape: per-face normal
        acceleration -> dp/dn = rho_air * omega^2 * (u . n)."""
        u_face = vert_displacement[self.faces].mean(axis=1)  # (F, 3)
        un = np.einsum("fd,fd->f", u_face, self.normals)
        return AIR_DENSITY * omega**2 * un
