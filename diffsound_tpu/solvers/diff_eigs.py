"""Differentiable eigenvalues via the detached-solve Rayleigh correction.

The eigensolve itself is never differentiated.  Given converged (but
detached) eigenpairs (lambda_i, u_i) of K u = lambda M u, the corrected

    lambda~_i = lambda_i + u_i^T K u_i - lambda_i u_i^T M u_i

is ~0-corrected in value but carries the exact first-order derivative
d lambda_i = u_i^T (dK - lambda_i dM) u_i with respect to anything the
differentiable operators K, M depend on (material scalars, vertices, SDF
parameters).  This mirrors /root/reference/src/diffelastic/diff_model.py:
371-399 (`get_undamped_freqs` / `get_vals`) and is solver-agnostic, so it
works identically above LOBPCG, ARPACK, or a dense eigh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rayleigh_corrected_eigenvalues(k_fn, m_fn, eigenvalues, eigenvectors):
    """lambda~ (m,) differentiable through k_fn / m_fn closures.

    k_fn/m_fn: (n, m) -> (n, m) differentiable operator applications.
    eigenvalues (m,), eigenvectors (n, m): detached solver output.
    """
    U = jax.lax.stop_gradient(eigenvectors)
    lam = jax.lax.stop_gradient(eigenvalues)
    ku = k_fn(U)
    mu_ = m_fn(U)
    add = jnp.sum(U * ku, axis=0) - lam * jnp.sum(U * mu_, axis=0)
    return lam + add


def undamped_frequencies(eigenvalues, floor: float = 1e-3):
    """f = sqrt(lambda) / 2 pi (Hz).

    The floor keeps the clamp differentiable: sqrt(max(x, 0)) has an
    infinite gradient at a clamped zero, which turns one spuriously
    negative corrected eigenvalue into NaN parameters after a single
    optimizer step.  Physical eigenvalues (>= (2 pi * 20 Hz)^2 ~ 1.6e4)
    are far above the floor."""
    return jnp.sqrt(jnp.maximum(eigenvalues, floor)) / (2.0 * jnp.pi)
