"""Blocked generalized LOBPCG on device — the TPU replacement for the
reference's CPU ARPACK shift-invert round trip
(/root/reference/src/diffelastic/diff_model.py:335-369) and its GPU LOBPCG
fork (/root/reference/src/lobpcg/_lobpcg.py).

Written from scratch for XLA: fixed shapes, `lax.while_loop` with
convergence-based early exit, all dense work as blocked matmuls that map
onto the MXU.  The search space S = [X | W | P] is (n, 3m); per iteration:

  1. residual      R = A X - B X diag(theta)
  2. precondition  W = T(R)           (block-Jacobi by default, supplied)
  3. B-orthonormalize S = [X, W, P] by two-pass Cholesky-QR with jitter
     (Gram matrices promoted to `gram_dtype`, default f64 — they are only
     (3m, 3m) so the promotion is free even when emulated on TPU)
  4. Rayleigh-Ritz: eigh(S^T A S) -> m smallest; X' = S Z_m,
     P' = S (Z_m with the X-block rows zeroed)  (the "ortho" update)

P is seeded with random vectors instead of zeros so the first iteration
needs no special case and the basis never degenerates under jit.

The solver is *not* differentiated; gradients flow through the Rayleigh
correction in `solvers.diff_eigs` instead (same trick as the reference,
diff_model.py:381-388 — solver-agnostic and exact to first order).
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..fem.precision import precise_matmul


def default_gram_dtype():
    """f64 Gram/Rayleigh-Ritz on CPU; f32 on TPU, where f64 is emulated so
    slowly that even (3m, 3m) factorizations are impractical.  With the
    diagonally-scaled pencil the f32 Gram path loses ~1e-6 relative
    eigenvalue accuracy — well inside the refresh tolerance."""
    return jnp.float64 if jax.default_backend() == "cpu" else jnp.float32


def _needs_precise_refine():
    """On TPU, eigh lowers to matmul-based iterations (QDWH) that run at
    the default bf16 MXU precision — ~3e-3 eigenvector error, enough to
    stall LOBPCG at ~1e-2 residuals.  Host callbacks are unsupported by
    this PJRT backend, so the fix is on-device: refine the approximate
    eigenbasis with precise-matmul Rayleigh-Ritz + first-order Jacobi
    corrections (each pass squares the error: 3e-3 -> ~1e-5 -> ~f32)."""
    return jax.default_backend() not in ("cpu",)


def _sym_eigh(G, refine: int = 2):
    """eigh of a small symmetric matrix, accurate on TPU.

    Uses the backend eigh as an initial guess, then `refine` passes of
        H = V^T G V = D + E    (precise matmuls)
        C_ij = H_ij / (d_i - d_j)  (antisymmetric first-order rotation,
                                    zeroed for near-degenerate pairs)
        V <- (V + V C), column-normalized
    and returns (diag(H), V) sorted ascending."""
    w, V = jnp.linalg.eigh(G)
    if not _needs_precise_refine():
        return w, V

    for _ in range(refine):
        GV = precise_matmul(G, V)
        H = precise_matmul(V.T, GV)
        H = 0.5 * (H + H.T)
        d = jnp.diagonal(H)
        denom = d[:, None] - d[None, :]
        scale = jnp.mean(jnp.abs(d)) + jnp.finfo(G.dtype).tiny
        safe = jnp.abs(denom) > 1e-5 * scale
        C = jnp.where(safe, H / jnp.where(safe, denom, 1.0), 0.0)
        C = C - jnp.diag(jnp.diagonal(C))
        V = V + precise_matmul(V, C)
        V = V * jax.lax.rsqrt(jnp.sum(V * V, axis=0, keepdims=True))
    GV = precise_matmul(G, V)
    H = precise_matmul(V.T, GV)
    w = jnp.diagonal(H)
    order = jnp.argsort(w)
    return w[order], V[:, order]


def _chol_unblocked(G):
    """Right-looking unblocked Cholesky via fori_loop rank-1 updates —
    elementwise VPU arithmetic only, so f32-exact on TPU (the library
    cholesky goes blocked above 64 and its trailing updates run on the
    bf16 MXU)."""
    n = G.shape[0]
    idx = jnp.arange(n)

    def body(j, A):
        # mask-select updates only: dynamic .at scatters make the TPU
        # compiler grind
        Aj = jnp.sum(jnp.where(idx[None, :] == j, A, 0.0), axis=1)  # col j
        d = jnp.sqrt(jnp.maximum(jnp.sum(jnp.where(idx == j, Aj, 0.0)), jnp.finfo(A.dtype).tiny))
        col = jnp.where(idx > j, Aj / d, 0.0)
        A = A - col[:, None] * col[None, :]
        newcol = jnp.where(idx == j, d, col)
        colmask = (idx[None, :] == j).astype(A.dtype)
        A = A * (1.0 - colmask) + newcol[:, None] * colmask
        return A

    return jnp.tril(jax.lax.fori_loop(0, n, body, G))


def _tri_lower_inv(L):
    """L^-1 for lower-triangular L by forward substitution (rank-1
    updates, f32-exact on TPU)."""
    n = L.shape[0]
    idx = jnp.arange(n)

    def body(j, X):
        Lj = jnp.sum(jnp.where(idx[None, :] == j, L, 0.0), axis=1)  # col j of L
        ljj = jnp.sum(jnp.where(idx == j, Lj, 0.0))
        Xj = jnp.sum(jnp.where(idx[:, None] == j, X, 0.0), axis=0) / ljj  # row j
        rowmask = (idx[:, None] == j).astype(X.dtype)
        X = X * (1.0 - rowmask) + Xj[None, :] * rowmask
        colj = jnp.where(idx > j, Lj, 0.0)
        return X - colj[:, None] * Xj[None, :]

    # tie the carry to L's varying axes (exactly zero-valued): under
    # shard_map's vma checker a constant eye would enter the loop
    # axis-unvarying and exit dp-varying — a type error (cf. p0 in lobpcg)
    x0 = jnp.eye(n, dtype=L.dtype) + 0.0 * L
    return jax.lax.fori_loop(0, n, body, x0)


def _chol_inv_t(G):
    """inv(chol(G)).T of a small SPD matrix, accurate on every backend."""
    if not _needs_precise_refine():
        m = G.shape[0]
        L = jnp.linalg.cholesky(G)
        return jax.scipy.linalg.solve_triangular(
            L, jnp.eye(m, dtype=G.dtype), lower=True
        ).T
    L = _chol_unblocked(G)
    return _tri_lower_inv(L).T


class LobpcgResult(NamedTuple):
    eigenvalues: jax.Array  # (m,) ascending
    eigenvectors: jax.Array  # (n, m) B-orthonormal
    iterations: jax.Array  # ()
    residual_norms: jax.Array  # (m,) relative residuals at exit
    history: Optional[jax.Array] = None  # (max_iters,) max rel residual per iter (record_history)


def _b_orthonormalize(S, BS, gram_dtype):
    """Two-pass Cholesky-QR in the B inner product.

    Returns (S', BS', Q) with S' = S Q so callers can rotate any other
    cached operator products (e.g. A S) by the same right factor."""

    def one_pass(S, BS):
        G = precise_matmul(S.T, BS).astype(gram_dtype)
        g = jnp.diagonal(G)
        # Scale columns to unit B-norm first: improves conditioning of chol.
        d = jax.lax.rsqrt(jnp.maximum(g, jnp.finfo(gram_dtype).tiny))
        G = G * d[:, None] * d[None, :]
        eps = jnp.asarray(jnp.finfo(S.dtype).eps, gram_dtype)
        m = G.shape[0]
        Linv_t = _chol_inv_t(
            G + (10.0 * m * eps) * jnp.eye(m, dtype=gram_dtype)
        ).astype(S.dtype)
        dc = d.astype(S.dtype)
        Q = dc[:, None] * Linv_t
        Sd = S * dc[None, :]
        BSd = BS * dc[None, :]
        return precise_matmul(Sd, Linv_t), precise_matmul(BSd, Linv_t), Q

    S, BS, Q1 = one_pass(S, BS)
    S, BS, Q2 = one_pass(S, BS)
    return S, BS, precise_matmul(Q1, Q2)


def lobpcg(
    a_fn: Callable[[jax.Array], jax.Array],
    b_fn: Callable[[jax.Array], jax.Array],
    x0: jax.Array,
    precond_fn: Optional[Callable[[jax.Array], jax.Array]] = None,
    max_iters: int = 200,
    tol: float = 1e-6,
    gram_dtype=None,
    seed: int = 0,
    reuse_products: bool = False,
    record_history: bool = False,
    profiler: Optional[str] = None,
    row_mask: Optional[jax.Array] = None,
    num_wanted: Optional[int] = None,
) -> LobpcgResult:
    """Compute the m smallest eigenpairs of A x = lambda B x.

    a_fn/b_fn: symmetric positive (semi)definite operators, (n, k) -> (n, k).
    x0: (n, m) initial block (warm starts dramatically reduce iterations in
        training loops where the operator changes slowly between solves).
    precond_fn: approximate inverse of A (e.g. inverse diagonal).
    reuse_products: carry A S / B S across iterations and rotate them with
        the basis instead of re-applying the operators (the products are
        linear in S), cutting matvec columns from 5m to 2m per iteration.
        Rotation roundoff accumulates, so this is for SHORT warm-start
        refreshes (tol >= ~1e-4, <~50 iterations) — the training-loop hot
        path.  Cold high-accuracy solves must use the default recompute
        body: near convergence the normalized residual directions become
        linearly dependent with span(X, P), the CholQR right factor blows
        up (~1e15 after ~100 iterations), and the carried products lose
        all significance (NaN well before a 1e-9 tolerance is reached).
    record_history: return the per-iteration max relative residual in
        `result.history` (NaN past the exit iteration).
    profiler: trace directory; when set the solve runs OUTSIDE
        lax.while_loop, one profiled device dispatch per iteration with
        per-step annotations + host wall-clock prints — the counterpart
        of the reference's in-solver torch.profiler hook
        (/root/reference/src/lobpcg/_lobpcg.py:357-369).  Eager contexts
        only (must not be used under an outer jit).
    row_mask: (n,) 0/1 — restrict the solve to the masked row subspace.
        For capacity-padded operators (shape tasks) whose pad rows are
        never read or written by a_fn/b_fn, masking the solver's two
        internal random-vector sources (P seed + dead-residual refresh)
        keeps every basis vector exactly zero on pad rows, so the padded
        pencil needs no spurious-eigenvalue shifting at all.
    num_wanted: converge on the first `num_wanted` columns only; the
        remaining columns are GUARD vectors that absorb the slowly
        separating directions just above the wanted block (their
        residuals never gate the early exit).  Default: all m columns.
    """
    n, m = x0.shape
    dtype = x0.dtype
    if gram_dtype is None:
        gram_dtype = default_gram_dtype()
    if precond_fn is None:
        precond_fn = lambda r: r

    key = jax.random.PRNGKey(seed)
    p0 = jax.random.normal(key, (n, m), dtype=dtype)
    if row_mask is not None:
        p0 = p0 * row_mask[:, None]
    # tie the device-axis-unvarying random seed block to x0's varying
    # type (exactly zero-valued): under shard_map's vma checker the
    # while_loop carry must enter with the same varying axes it acquires
    # inside the body, and this solver cannot know the caller's axis names
    p0 = p0 + 0.0 * x0

    def body(state):
        X, AX, BX, P, AP, BP, theta, _, it, hist = state
        if not reuse_products:
            AX = a_fn(X)
            BX = b_fn(X)
        R = AX - BX * theta[None, :]

        # Relative residuals (computed before the step, reported at exit).
        # The scale includes the block's largest Ritz value so that
        # near-null (rigid-body) modes, where ||A x|| itself is roundoff,
        # still register as converged.
        rn = jnp.linalg.norm(R, axis=0)
        scale = (jnp.abs(theta) + jnp.max(jnp.abs(theta))) * jnp.linalg.norm(
            BX, axis=0
        ) + jnp.linalg.norm(AX, axis=0)
        rel = rn / jnp.maximum(scale, jnp.finfo(dtype).tiny)
        if record_history:
            # per-iteration convergence trace (the in-solver profiler hook
            # of the reference, _lobpcg.py:357-369, reduced to what is
            # observable from inside a lax.while_loop)
            hist = hist.at[it].set(jnp.max(rel[:nw]))

        W = precond_fn(R)
        if reuse_products:
            # Column-normalize; replace (near-)dead residual directions
            # with fresh random vectors — after convergence W -> 0 and a
            # degenerate basis otherwise corrupts the carried products
            # within ~20 more iterations.
            wn = jnp.linalg.norm(W, axis=0)
            fresh = jax.random.normal(
                jax.random.fold_in(key, it), W.shape, dtype
            )
            if row_mask is not None:
                fresh = fresh * row_mask[:, None]
            fresh = fresh * jax.lax.rsqrt(jnp.sum(fresh * fresh, axis=0))
            alive = wn > jnp.asarray(jnp.finfo(dtype).tiny, dtype) ** 0.5
            W = jnp.where(
                alive[None, :], W / jnp.maximum(wn, jnp.finfo(dtype).tiny)[None, :], fresh
            )
            # The ONLY operator applications this iteration: A W and B W.
            AW = a_fn(W)
            BW = b_fn(W)
            S = jnp.concatenate([X, W, P], axis=1)  # (n, 3m)
            AS = jnp.concatenate([AX, AW, AP], axis=1)
            BS = jnp.concatenate([BX, BW, BP], axis=1)
            S, BS, Q = _b_orthonormalize(S, BS, gram_dtype)
            AS = precise_matmul(AS, Q)
        else:
            S = jnp.concatenate([X, W, P], axis=1)  # (n, 3m)
            BS = b_fn(S)
            S, BS, _ = _b_orthonormalize(S, BS, gram_dtype)
            AS = a_fn(S)

        G = precise_matmul(S.T, AS).astype(gram_dtype)
        G = 0.5 * (G + G.T)
        ritz, Z = _sym_eigh(G)
        ritz = ritz.astype(dtype)
        Z = Z.astype(dtype)

        Zm = Z[:, :m]
        # "ortho" conjugate-direction update: drop the X-block component.
        Zp = Zm.at[:m, :].set(0.0)
        Xn = precise_matmul(S, Zm)
        Pn = precise_matmul(S, Zp)
        if reuse_products:
            AXn = precise_matmul(AS, Zm)
            BXn = precise_matmul(BS, Zm)
            APn = precise_matmul(AS, Zp)
            BPn = precise_matmul(BS, Zp)
            # periodic re-anchoring (rotation roundoff otherwise
            # accumulates over long solves)
            AXn, BXn = jax.lax.cond(
                (it + 1) % 16 == 0,
                lambda: (a_fn(Xn), b_fn(Xn)),
                lambda: (AXn, BXn),
            )
        else:
            # recompute mode: AX/BX are rebuilt from Xn at the top of the
            # next iteration; carry placeholders through unchanged.
            AXn, BXn, APn, BPn = AX, BX, AP, BP
        return Xn, AXn, BXn, Pn, APn, BPn, ritz[:m], rel, it + 1, hist

    nw = m if num_wanted is None else int(num_wanted)

    def cond(state):
        rel, it = state[-3], state[-2]
        return jnp.logical_and(it < max_iters, jnp.max(rel[:nw]) > tol)

    # Initialize: B-orthonormalize X0 and take its Ritz approximation.
    BX0 = b_fn(x0)
    X, BX, _ = _b_orthonormalize(x0, BX0, gram_dtype)
    AX = a_fn(X)
    G0 = precise_matmul(X.T, AX).astype(gram_dtype)
    G0 = 0.5 * (G0 + G0.T)
    th0, Z0 = _sym_eigh(G0)
    Z0 = Z0.astype(dtype)
    X = precise_matmul(X, Z0)
    AX = precise_matmul(AX, Z0)
    BX = precise_matmul(BX, Z0)
    theta0 = th0.astype(dtype)
    AP0 = a_fn(p0)
    BP0 = b_fn(p0)

    hist0 = jnp.full((max_iters if record_history else 1,), jnp.nan, dtype=dtype)
    rel0 = jnp.full((m,), jnp.inf, dtype=dtype) + 0.0 * theta0  # varying tie
    if record_history:
        hist0 = hist0 + 0.0 * theta0[0]
    init = (X, AX, BX, p0, AP0, BP0, theta0, rel0, jnp.array(0), hist0)
    if profiler is None:
        X, AX, BX, P, AP, BP, theta, rel, it, hist = jax.lax.while_loop(
            cond, body, init
        )
    else:
        # Host-driven profiled loop — the analog of the reference's
        # torch.profiler hook inside the solver (_lobpcg.py:357-369): one
        # device dispatch per iteration under a jax.profiler trace with
        # per-step annotations, host wall-clock included.
        import time as _time

        jbody = jax.jit(body)
        state = init
        with jax.profiler.trace(profiler):
            while bool(cond(state)):
                t0 = _time.perf_counter()
                with jax.profiler.StepTraceAnnotation(
                    "lobpcg_iter", step_num=int(state[-2])
                ):
                    state = jbody(state)
                    jax.block_until_ready(state[0])
                print(
                    f"  lobpcg iter {int(state[-2])}: max rel resid "
                    f"{float(jnp.max(state[-3])):.3e} "
                    f"({(_time.perf_counter() - t0) * 1e3:.1f} ms)"
                )
        X, AX, BX, P, AP, BP, theta, rel, it, hist = state

    return LobpcgResult(
        eigenvalues=theta, eigenvectors=X, iterations=it, residual_norms=rel,
        history=hist if record_history else None,
    )


def lobpcg_solver_freq(
    a_fn,
    b_fn,
    x0,
    freq_limit: Optional[float] = None,
    rigid_modes: int = 6,
    **kwargs,
):
    """Solve, drop the rigid-body block, and apply an optional frequency
    cutoff (parity: LOBPCG_solver_freq,
    /root/reference/src/utils/utils.py:80-90).

    x0 (n, k + rigid_modes).  Host-facing (the cutoff mask is a dynamic
    shape): returns (vals (<=k,), vecs (n, <=k)) as numpy arrays with
    eigenvalues above (2 pi freq_limit)^2 removed."""
    import numpy as np

    res = lobpcg(a_fn, b_fn, x0, **kwargs)
    vals = np.asarray(res.eigenvalues)
    vecs = np.asarray(res.eigenvectors)
    if freq_limit is not None:
        keep = vals < (2.0 * np.pi * freq_limit) ** 2
        vals, vecs = vals[keep], vecs[:, keep]
    return vals[rigid_modes:], vecs[:, rigid_modes:]


def jacobi_preconditioner(diag: jax.Array):
    """Inverse-diagonal preconditioner from diag(A) (n,)."""
    inv = jnp.where(diag > 0, 1.0 / diag, 1.0)

    def pc(r):
        return r * inv[:, None]

    return pc
