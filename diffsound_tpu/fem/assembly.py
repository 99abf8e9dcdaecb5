"""Matrix-free high-order tet FEM operators, batched for the MXU.

The reference assembles sparse COO stiffness/mass matrices on GPU
(/root/reference/src/diffelastic/diff_model.py:184-312) and applies K
either as sparse matmul or through a per-gauss-point stress pipeline
(`stiff_func`, diff_model.py:314-328).  On TPU we do neither.  Isotropic
linear elasticity factors the element stiffness exactly as

    K_e = mu * K_e^mu + lambda * K_e^lam,

with material-independent dense blocks (num_tets, 3N, 3N) precomputed once
from the geometry:

    T[a,i,b,j]      = sum_g w_g B[g,a,i] B[g,b,j]
    K^lam[(a,i),(b,j)] = T[a,i,b,j]
    K^mu [(a,i),(b,j)] = delta_ij * sum_p T[a,p,b,p]  +  T[a,j,b,i]

where B (gauss, nodes, 3) are shape-function world-space gradients and w
the per-(tet, gauss) integration weights (gauss weight x |det A|).  K @ X
is then two batched dense matmuls plus a `segment_sum` scatter over shared
nodes — all MXU work, no sparsity, no dynamic shapes.  The mass operator
uses the reference-element mass matrix Mref (nodes, nodes) scaled by
rho |det A| per tet (parity: diff_model.py:222-312, mass_matrix.py:9-31).

Everything is a jnp function of `vertices`, so vertex gradients (geometry /
thickness / morphing tasks) flow through A^-1, |det A| and the element
blocks automatically.  A `tet_mask` turns padded/invalid elements into
zero contributions for the static-shape marching-tets pipeline.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .precision import precise_einsum, precise_einsum_presplit, presplit
from .quadrature import gauss_tet_quadrature
from .shape_func import (
    CORNER_NODES,
    num_nodes_for_order,
    shape_function,
    shape_function_grad,
)

# dL/dx maps reference-coordinate gradients to barycentric: x = A [L1 L2 L3]^T + v4.
_DL_DX = np.array(
    [[1.0, 0, 0], [0, 1, 0], [0, 0, 1], [-1, -1, -1]], dtype=np.float64
)


def inv3x3(A: jax.Array, safe: bool = False):
    """Batched closed-form 3x3 (det, inverse) via the adjugate.
    safe=True replaces (near-)zero determinants by 1 in the division so
    masked-out degenerate elements produce finite garbage that the zeroed
    integration weights then annihilate."""
    a = A[..., 0, 0]
    b = A[..., 0, 1]
    c = A[..., 0, 2]
    d = A[..., 1, 0]
    e = A[..., 1, 1]
    f = A[..., 1, 2]
    g = A[..., 2, 0]
    h = A[..., 2, 1]
    i = A[..., 2, 2]
    co_a = e * i - f * h
    co_b = f * g - d * i
    co_c = d * h - e * g
    det = a * co_a + b * co_b + c * co_c
    adj = jnp.stack(
        [
            jnp.stack([co_a, c * h - b * i, b * f - c * e], axis=-1),
            jnp.stack([co_b, a * i - c * g, c * d - a * f], axis=-1),
            jnp.stack([co_c, b * g - a * h, a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    if safe:
        # Guard threshold is 1e-25, NOT finfo(dtype).tiny: the TPU backend
        # emulates f64 with f32-pair arithmetic, so f64 constants below
        # the f32 range flush to zero there and a `|det| < 2.2e-305`
        # comparison silently evaluates False (measured: `0.0 < 1e-100`
        # -> False on the axon backend, True on real CPU).  With the old
        # finfo(f64).tiny*1e3 threshold, f64-on-TPU programs never fired
        # the guard, exactly-degenerate padded tets divided 0/0, and the
        # NaN scattered into real vertex rows (benchmarks/diagnostics/
        # thickness_sign_probe.py).  1e-25 is ~10 orders below any real
        # element determinant and exactly representable in f32, so the
        # comparison is correct on every backend and dtype.
        tiny = jnp.asarray(1e-25, A.dtype)
        den = jnp.where(jnp.abs(det) < tiny, jnp.ones((), A.dtype), det)
        return det, adj / den[..., None, None]
    return det, adj / det[..., None, None]


class ElementOps(NamedTuple):
    """Pytree of precomputed per-element operator data."""

    tets: jax.Array  # (E, N) int32 node indices
    k_mu: jax.Array  # (E, 3N, 3N)
    k_lam: jax.Array  # (E, 3N, 3N)
    mass_scale: jax.Array  # (E,) = |det A| (mass rho applied at matvec time)
    mref: jax.Array  # (N, N) reference element mass matrix
    num_vertices: int  # static
    # optional scatter->gather transpose: (V, D) indices into the flattened
    # (E*N + 1) element-node rows (last row is a zero dummy).  TPU scatter-
    # add is serialized and dominates the matvec (~35 ms on the bowl);
    # the precomputed gather runs at memory bandwidth.
    gather_idx: Optional[jax.Array] = None

    @property
    def num_tets(self):
        return self.tets.shape[0]

    @property
    def nodes_per_tet(self):
        return self.tets.shape[1]


def reference_mass_matrix(order: int, dtype=np.float64) -> np.ndarray:
    """Mref_ab = int_ref N_a N_b  (nodes, nodes); quadrature order+2 for
    parity with /root/reference/src/diffelastic/mass_matrix.py:25-31."""
    pts, wts = gauss_tet_quadrature(order + 2)
    N = shape_function(pts, order)  # (G, nodes)
    return (N.T * wts) @ N


def shape_grad_table(order: int) -> np.ndarray:
    """dN/dL @ dL/dx at the quadrature points: (G, nodes, 3) constant."""
    pts, _ = gauss_tet_quadrature(order + 2)
    dNdL = shape_function_grad(pts, order)  # (G, nodes, 4)
    return dNdL @ _DL_DX  # (G, nodes, 3)


def build_element_ops_jit(vertices, tets, order, dtype=jnp.float32, tet_mask=None):
    """One-compile wrapper around `build_element_ops` — eager construction
    issues dozens of separate XLA programs, which is painful under remote
    TPU compilation; a single jit specializes once per (shape, order)."""
    fn = _jitted_builders.get((int(order), dtype, tet_mask is not None))
    if fn is None:
        if tet_mask is None:
            fn = jax.jit(
                lambda v, t: build_element_ops(v, t, order, dtype=dtype)
            )
        else:
            fn = jax.jit(
                lambda v, t, m: build_element_ops(v, t, order, dtype=dtype, tet_mask=m)
            )
        _jitted_builders[(int(order), dtype, tet_mask is not None)] = fn
    res = fn(vertices, tets) if tet_mask is None else fn(vertices, tets, tet_mask)
    # num_vertices is static metadata: jit returns it as a traced scalar,
    # restore the python int so segment_sum sees a static segment count.
    # Also attach the host-built scatter->gather transpose (tets concrete
    # here) so single-chip matvecs avoid the serialized TPU scatter.
    gidx = build_gather_transpose(np.asarray(tets), int(vertices.shape[0]))
    return res._replace(
        num_vertices=int(vertices.shape[0]),
        gather_idx=jnp.asarray(gidx),
    )


_jitted_builders = {}


def build_element_ops(
    vertices: jax.Array,
    tets: jax.Array,
    order: int,
    dtype=jnp.float32,
    tet_mask: Optional[jax.Array] = None,
) -> ElementOps:
    """Differentiable element-operator construction (jit-safe).

    vertices: (V, 3); tets: (E, N) int; tet_mask: optional (E,) bool/float —
    masked-out tets contribute exactly zero to both K and M.
    """
    order = int(order)
    n_nodes = num_nodes_for_order(order)
    if tets.shape[1] != n_nodes:
        raise ValueError(f"tets has {tets.shape[1]} nodes, order {order} needs {n_nodes}")

    vertices = vertices.astype(dtype)
    _, wts = gauss_tet_quadrature(order + 2)
    wts = jnp.asarray(wts, dtype=dtype)  # (G,)
    dndx_ref = jnp.asarray(shape_grad_table(order), dtype=dtype)  # (G, N, 3)

    corners = tuple(CORNER_NODES[order])
    c = tets[:, list(corners)]  # (E, 4)
    v1, v2, v3, v4 = (vertices[c[:, i]] for i in range(4))
    A = jnp.stack([v1 - v4, v2 - v4, v3 - v4], axis=-1)  # (E, 3, 3)
    # Closed-form 3x3 det/inverse: batched LU is unsupported for f64 on TPU
    # and the adjugate form is faster and fully fused anyway.  The det is
    # guarded so degenerate/masked (padded) tets yield zeros rather than
    # NaN*0 = NaN contamination.
    detA, A_inv = inv3x3(A, safe=True)
    absdet = jnp.abs(detA)

    # World-space shape gradients per (tet, gauss): B[e,g,a,:] = dndx_ref[g,a,:] @ A_inv[e]
    # Exact f32 via a 3-term broadcast-sum — a plain einsum runs at bf16
    # MXU precision on TPU and its 3e-3 error poisons every element matrix.
    B = jnp.sum(
        dndx_ref[None, :, :, :, None] * A_inv[:, None, None, :, :], axis=3
    )  # (E, G, N, 3)
    w = wts[None, :] * absdet[:, None]  # (E, G)
    if tet_mask is not None:
        w = w * tet_mask.astype(dtype)[:, None]

    # fold weights into one factor, then a precise 2-operand contraction
    # over the gauss axis (cancellation-sensitive: element matrices feed
    # every downstream quotient)
    E_, G_, N_ = B.shape[0], B.shape[1], B.shape[2]
    Bw = (B * w[:, :, None, None]).reshape(E_, G_, N_ * 3)
    Bf = B.reshape(E_, G_, N_ * 3)
    T = precise_einsum("egx,egy->exy", Bw, Bf).reshape(E_, N_, 3, N_, 3)
    G = jnp.einsum("eapbp->eab", T)  # (E, N, N) — a diagonal-sum, no matmul
    eye3 = jnp.eye(3, dtype=dtype)
    # outer-with-identity and transpose expressed elementwise (exact)
    k_mu = G[:, :, None, :, None] * eye3[None, None, :, None, :] + jnp.transpose(
        T, (0, 1, 4, 3, 2)
    )
    k_lam = T

    E, N = tets.shape
    mass_scale = absdet if tet_mask is None else absdet * tet_mask.astype(dtype)
    return ElementOps(
        tets=tets.astype(jnp.int32),
        k_mu=k_mu.reshape(E, 3 * N, 3 * N),
        k_lam=k_lam.reshape(E, 3 * N, 3 * N),
        mass_scale=mass_scale,
        mref=jnp.asarray(reference_mass_matrix(order), dtype=dtype),
        num_vertices=int(vertices.shape[0]),
    )


# ---------------------------------------------------------------------------
# Matrix-free matvecs (the LOBPCG / Rayleigh-correction hot path)
# ---------------------------------------------------------------------------


def _gather(ops: ElementOps, x: jax.Array):
    """(3V, k) -> per-element (E, 3N, k)."""
    k = x.shape[1]
    xv = x.reshape(ops.num_vertices, 3, k)
    xe = xv[ops.tets]  # (E, N, 3, k)
    E, N = ops.tets.shape
    return xe.reshape(E, 3 * N, k)


def build_gather_transpose(tets: np.ndarray, num_vertices: int) -> np.ndarray:
    """Host-side scatter->gather transposition: for each vertex, the list of
    flattened (element, node-slot) rows that accumulate into it, padded with
    a dummy index pointing at an all-zero row."""
    tets = np.asarray(tets)
    flat = tets.reshape(-1).astype(np.int64)
    counts = np.bincount(flat, minlength=num_vertices)
    D = max(int(counts.max()), 1)
    starts = np.zeros(num_vertices + 1, np.int64)
    starts[1:] = np.cumsum(counts)
    order = np.argsort(flat, kind="stable")
    sorted_v = flat[order]
    pos = np.arange(len(flat)) - starts[sorted_v]
    idx = np.full((num_vertices, D), len(flat), np.int32)  # dummy row
    idx[sorted_v, pos] = order.astype(np.int32)
    return idx


def _scatter(ops: ElementOps, ye: jax.Array):
    """per-element (E, 3N, k) -> (3V, k) reduction over shared nodes."""
    E, threeN, k = ye.shape
    N = threeN // 3
    flat = ye.reshape(E * N, 3 * k)
    if ops.gather_idx is not None:
        rows = jnp.concatenate(
            [flat, jnp.zeros((1, 3 * k), flat.dtype)], axis=0
        )
        out = jnp.sum(rows[ops.gather_idx], axis=1)  # (V, 3k)
    else:
        out = jax.ops.segment_sum(
            flat, ops.tets.reshape(-1), num_segments=ops.num_vertices
        )
    return out.reshape(ops.num_vertices * 3, k)


def k_matvec(ops: ElementOps, x: jax.Array, mu, lam) -> jax.Array:
    """K @ X for X (3V, k): two batched MXU matmuls + segment_sum."""
    xe = _gather(ops, x)
    ye = mu * precise_einsum("eij,ejk->eik", ops.k_mu, xe) + lam * precise_einsum(
        "eij,ejk->eik", ops.k_lam, xe
    )
    return _scatter(ops, ye)


class FrozenStiffness(NamedTuple):
    """Material-combined element stiffness, pre-split for the bf16 MXU.

    K is linear in (mu, lambda); inside an eigensolve the material is
    fixed, so `mu * k_mu_e + lam * k_lam_e` and its split-precision parts
    (see fem.precision.presplit) are loop-invariant.  Recombining AND
    re-splitting the (E, 3N, 3N) blocks every matvec costs ~6x the actual
    MXU work; freezing once per solve cuts the bowl warm-refresh LOBPCG
    iteration from ~15 ms to ~2.6 ms."""

    parts: tuple  # presplit(mu*k_mu + lam*k_lam)


def freeze_stiffness(ops: ElementOps, mu, lam, terms: int = 3) -> FrozenStiffness:
    ke = mu * ops.k_mu + lam * ops.k_lam
    return FrozenStiffness(parts=presplit(ke, terms))


def k_matvec_frozen(ops: ElementOps, fz: FrozenStiffness, x: jax.Array) -> jax.Array:
    """K @ X with a pre-frozen material (see FrozenStiffness)."""
    xe = _gather(ops, x)
    ye = precise_einsum_presplit("eij,ejk->eik", fz.parts, xe)
    return _scatter(ops, ye)


def m_matvec(ops: ElementOps, x: jax.Array, density) -> jax.Array:
    """M @ X for X (3V, k)."""
    k = x.shape[1]
    xv = x.reshape(ops.num_vertices, 3, k)
    xe = xv[ops.tets]  # (E, N, 3, k)
    E_, N_ = ops.tets.shape
    k_ = xe.shape[-1]
    ye = precise_einsum(
        "ab,ebk->eak", ops.mref, xe.reshape(E_, N_, 3 * k_)
    ).reshape(E_, N_, 3, k_)
    ye = ye * (density * ops.mass_scale)[:, None, None, None]
    E, N = ops.tets.shape
    return _scatter(ops, ye.reshape(E, 3 * N, k))


def k_diag(ops: ElementOps, mu, lam) -> jax.Array:
    """diag(K) (3V,) — block-Jacobi preconditioner source."""
    ke_diag = mu * jnp.diagonal(ops.k_mu, axis1=1, axis2=2) + lam * jnp.diagonal(
        ops.k_lam, axis1=1, axis2=2
    )  # (E, 3N)
    return _scatter(ops, ke_diag[:, :, None])[:, 0]


def m_diag(ops: ElementOps, density) -> jax.Array:
    """diag(M) (3V,)."""
    d = jnp.diagonal(ops.mref)  # (N,)
    de = d[None, :] * (density * ops.mass_scale)[:, None]  # (E, N)
    de3 = jnp.repeat(de[:, :, None], 3, axis=2)  # (E, N, 3)
    E, N = ops.tets.shape
    return _scatter(ops, de3.reshape(E, 3 * N, 1))[:, 0]


def m_lumped(ops: ElementOps, density) -> jax.Array:
    """Row-sum lumped mass (3V,) — positive, useful for scaling."""
    rs = ops.mref.sum(axis=1)  # (N,)
    de = rs[None, :] * (density * ops.mass_scale)[:, None]
    de3 = jnp.repeat(de[:, :, None], 3, axis=2)
    E, N = ops.tets.shape
    return _scatter(ops, de3.reshape(E, 3 * N, 1))[:, 0]


# ---------------------------------------------------------------------------
# Host-side sparse assembly (tests + scipy/ARPACK fallback)
# ---------------------------------------------------------------------------


def assemble_scipy(ops: ElementOps, mu: float, lam: float, density: float):
    """Assemble (K, M) as scipy CSR from the element blocks (host only)."""
    import scipy.sparse as sp

    tets = np.asarray(ops.tets)
    E, N = tets.shape
    ke = mu * np.asarray(ops.k_mu, dtype=np.float64) + lam * np.asarray(
        ops.k_lam, dtype=np.float64
    )
    dof = (tets[:, :, None] * 3 + np.arange(3)[None, None, :]).reshape(E, 3 * N)
    rows = np.repeat(dof, 3 * N, axis=1).reshape(-1)
    cols = np.tile(dof, (1, 3 * N)).reshape(-1)
    nv = ops.num_vertices
    K = sp.coo_matrix((ke.reshape(-1), (rows, cols)), shape=(3 * nv, 3 * nv)).tocsr()

    mref = np.asarray(ops.mref, dtype=np.float64)
    scale = density * np.asarray(ops.mass_scale, dtype=np.float64)
    me = np.einsum("ab,ij->aibj", mref, np.eye(3)).reshape(3 * N, 3 * N)
    me_all = scale[:, None, None] * me[None]
    M = sp.coo_matrix(
        (me_all.reshape(-1), (rows, cols)), shape=(3 * nv, 3 * nv)
    ).tocsr()
    K.sum_duplicates()
    M.sum_duplicates()
    return K, M


class FEMOperators:
    """Convenience wrapper binding a TetMesh to its element operators."""

    def __init__(self, mesh, dtype=jnp.float32):
        self.mesh = mesh
        self.order = mesh.order
        self.dtype = dtype
        self.ops = build_element_ops(
            jnp.asarray(mesh.vertices),
            jnp.asarray(mesh.tets),
            mesh.order,
            dtype=dtype,
        )

    def k_matvec(self, x, mu, lam):
        return k_matvec(self.ops, x, mu, lam)

    def m_matvec(self, x, density):
        return m_matvec(self.ops, x, density)

    @property
    def num_dof(self):
        return 3 * self.ops.num_vertices


# ---------------------------------------------------------------------------
# General stress path (arbitrary / learned materials)
# ---------------------------------------------------------------------------


class DeformOps(NamedTuple):
    """Per-(element, gauss) B-matrices + integration weights — the
    matrix-free K action through an arbitrary stress function sigma(F)
    (counterpart of the reference's Deform.gradient_batch +
    stress_to_force_batch pipeline, /root/reference/src/diffelastic/
    deform.py:70-166, which `stiff_func` drives per mode,
    diff_model.py:314-328).

    The factored (k_mu, k_lam) fast path hard-codes isotropic linear
    elasticity; this path supports ANY differentiable stress model —
    `material.TinyNN` in particular — at per-gauss-point cost."""

    tets: jax.Array  # (E, N) int32
    B: jax.Array  # (E, G, N, 3) world-space shape gradients
    w: jax.Array  # (E, G) gauss weight x |det A| (masked tets: 0)
    num_vertices: int
    gather_idx: Optional[jax.Array] = None


def build_deform_ops(
    vertices: jax.Array,
    tets: jax.Array,
    order: int,
    dtype=jnp.float32,
    tet_mask: Optional[jax.Array] = None,
) -> DeformOps:
    order = int(order)
    vertices = vertices.astype(dtype)
    _, wts = gauss_tet_quadrature(order + 2)
    wts = jnp.asarray(wts, dtype=dtype)
    dndx_ref = jnp.asarray(shape_grad_table(order), dtype=dtype)  # (G, N, 3)
    corners = tuple(CORNER_NODES[order])
    c = tets[:, list(corners)]
    v1, v2, v3, v4 = (vertices[c[:, i]] for i in range(4))
    A = jnp.stack([v1 - v4, v2 - v4, v3 - v4], axis=-1)
    detA, A_inv = inv3x3(A, safe=True)
    B = jnp.sum(
        dndx_ref[None, :, :, :, None] * A_inv[:, None, None, :, :], axis=3
    )  # (E, G, N, 3)
    w = wts[None, :] * jnp.abs(detA)[:, None]
    if tet_mask is not None:
        w = w * tet_mask.astype(dtype)[:, None]
    return DeformOps(
        tets=tets.astype(jnp.int32), B=B, w=w,
        num_vertices=int(vertices.shape[0]),
    )


def deformation_gradients(dops: DeformOps, x: jax.Array) -> jax.Array:
    """x (3V, k) modal displacements -> F (E, G, k, 3, 3) per gauss point:
    F_ij = sum_a u[a, i] B[a, j]."""
    k = x.shape[-1]
    xv = x.reshape(dops.num_vertices, 3, k)
    xe = xv[dops.tets]  # (E, N, 3, k)
    return precise_einsum("eaik,egaj->egkij", xe, dops.B)


def k_matvec_stress(dops: DeformOps, stress_fn, x: jax.Array) -> jax.Array:
    """K @ X through an arbitrary stress function (reference stiff_func,
    diff_model.py:314-328): F -> sigma(F) -> nodal forces.

    stress_fn: (..., 3, 3) -> (..., 3, 3); exactly equals the factored
    path when stress_fn is isotropic linear elasticity (tested)."""
    F = deformation_gradients(dops, x)  # (E, G, k, 3, 3)
    sigma = stress_fn(F)
    sw = sigma * dops.w[:, :, None, None, None]
    ye = precise_einsum("egkij,egaj->eaik", sw, dops.B)  # (E, N, 3, k)
    E_, N_ = dops.tets.shape
    k = x.shape[-1]
    flat = ye.reshape(E_ * N_, 3 * k)
    if dops.gather_idx is not None:
        rows = jnp.concatenate([flat, jnp.zeros((1, 3 * k), flat.dtype)], axis=0)
        out = jnp.sum(rows[dops.gather_idx], axis=1)
    else:
        out = jax.ops.segment_sum(
            flat, dops.tets.reshape(-1), num_segments=dops.num_vertices
        )
    return out.reshape(dops.num_vertices * 3, k)
