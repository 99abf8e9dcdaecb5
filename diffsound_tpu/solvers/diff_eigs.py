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


def ritz_refined_eigenvalues(k_fn, m_fn, eigenvectors, num_modes=None):
    """Subspace Rayleigh-Ritz eigenvalues, differentiable through
    k_fn/m_fn — the robust replacement for per-column Rayleigh
    correction when the detached basis comes from a warm/iterative
    solver.

    Why: `rayleigh_corrected_eigenvalues` is exact only when each COLUMN
    of U is an accurate eigenvector.  An iterative f32 solve converged to
    residual r leaves in-subspace rotation errors of order r / gap, and
    thin-shell spectra are clustered (tiny gaps), so a basis whose
    *values* are fine can carry O(1) per-column mixing — measured on the
    grid-64 thickness task as a SIGN-FLIPPED d(loss)/d(coef) (+2.33
    exact-basis vs -8.57 warm-basis, results/r4/thickness_warm_grad.txt)
    that walked the round-3 run uphill on a monotone landscape.

    Fix: project the pencil onto span(U) differentiably (A = U^T K U,
    B = U^T M U — k x k), solve the small generalized eigenproblem on
    the DETACHED (A0, B0) for a rotation Y, and return the Rayleigh
    quotients of the rotated basis:

        theta_i = (y_i^T A y_i) / (y_i^T B y_i),   y_i detached.

    At the evaluation point theta equals the Ritz values of span(U) at
    the CURRENT operators (2nd-order accurate in the subspace error,
    and in-subspace rotation error is resolved EXACTLY); the gradient is
    the subspace-projected derivative y_i^T (dK - theta_i dM) y_i, whose
    error is gap-protected by the distance to modes OUTSIDE the whole
    block, not between neighbors inside it.  With an exact basis this
    reduces to `rayleigh_corrected_eigenvalues` (Y = I).

    The detached rotation also sidesteps eigh's degenerate-pair
    derivative blowup (1/(theta_i - theta_j) terms): no gradient ever
    flows through the small eigh.

    k_fn/m_fn: (n, k) -> (n, k) differentiable operators.
    eigenvectors (n, k): detached solver output (approximately
    B-orthonormal; any full-rank basis of the subspace works).
    Returns theta (num_modes or k,) ascending.
    """
    from ..fem.precision import precise_matmul
    from .lobpcg import _chol_inv_t, _sym_eigh

    U = jax.lax.stop_gradient(eigenvectors)
    ku = k_fn(U)
    mu_ = m_fn(U)
    # Gram products MUST be precise on TPU: a plain `@` runs on the bf16
    # MXU, and its ~3e-3 relative error on these maximally-cancelling
    # quadratic forms both biases the VALUES ~3.5e-3 and buries the
    # scalar shape derivative (dvals/dc ~ 1e-2 of vals over an optimizer
    # step) in noise — measured as the sign-flipped thickness gradient
    # that walked the round-3 grid-64 run uphill (results/r4/
    # thickness_jvp_bisect.txt vs the exact landscape slope; eager f64
    # CPU agrees with ARPACK to 1e-12 with precise products).
    A = precise_matmul(U.T, ku)
    B = precise_matmul(U.T, mu_)
    A = 0.5 * (A + A.T)
    B = 0.5 * (B + B.T)

    B0 = jax.lax.stop_gradient(B)
    A0 = jax.lax.stop_gradient(A)
    # normalize the (≈ identity) B0 diagonal for a well-scaled Cholesky
    d = jax.lax.rsqrt(jnp.maximum(jnp.diagonal(B0), jnp.finfo(B0.dtype).tiny))
    k = B0.shape[0]
    eps = jnp.asarray(jnp.finfo(B0.dtype).eps, B0.dtype)
    Bn = d[:, None] * B0 * d[None, :] + (10.0 * k * eps) * jnp.eye(k, dtype=B0.dtype)
    Linv_t = _chol_inv_t(Bn)  # inv(chol(Bn)).T, upper triangular
    C0 = precise_matmul(
        precise_matmul(Linv_t.T, d[:, None] * A0 * d[None, :]), Linv_t
    )
    _, V = _sym_eigh(0.5 * (C0 + C0.T))
    Y = jax.lax.stop_gradient(d[:, None] * precise_matmul(Linv_t, V))  # (k, k)

    num = jnp.sum(Y * precise_matmul(A, Y), axis=0)
    den = jnp.sum(Y * precise_matmul(B, Y), axis=0)
    theta = num / den
    if num_modes is not None:
        theta = theta[:num_modes]
    return theta


def undamped_frequencies(eigenvalues, floor: float = 1e-3):
    """f = sqrt(lambda) / 2 pi (Hz).

    The floor keeps the clamp differentiable: sqrt(max(x, 0)) has an
    infinite gradient at a clamped zero, which turns one spuriously
    negative corrected eigenvalue into NaN parameters after a single
    optimizer step.  Physical eigenvalues (>= (2 pi * 20 Hz)^2 ~ 1.6e4)
    are far above the floor."""
    return jnp.sqrt(jnp.maximum(eigenvalues, floor)) / (2.0 * jnp.pi)
