"""Split-precision matmuls: f32 accuracy at MXU (bf16) speed.

On this TPU generation XLA's non-default matmul precisions fall off the
MXU fast path entirely (measured: (8840, 30, 30) x (8840, 30, 22) batched
einsum — bf16 0.07 ms / 3e-3 error, "high"/"highest" ~28 ms).  FEM
matvecs cannot run in raw bf16: nodal forces are ~100x-cancelling sums of
element contributions, so 3e-3 input rounding becomes >100% error on
Rayleigh quotients.

`precise_einsum` reconstructs f32-grade accuracy from bf16 MXU passes by
splitting each operand into `terms` bf16 components (8 mantissa bits
each; 3 terms capture the full f32 mantissa) and summing the significant
cross products with f32 accumulation:

    A = A0 + A1 + A2 (+ eps),  B likewise
    A @ B = sum_{i+j < terms} Ai @ Bj  + O(2^-24)

6 MXU products for terms=3 — ~6x bf16 cost, ~400/6x faster than the
XLA "highest" path at comparable accuracy.  On CPU (or for f64 inputs)
it falls through to a plain einsum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=1)
def _use_split() -> bool:
    return jax.default_backend() not in ("cpu",)


def _truncate_to_bf16_grid(x):
    """Zero the low 16 bits of the f32 representation — the result is
    exactly bf16-representable.  Done with integer bit ops rather than a
    cast round trip: under --xla_allow_excess_precision (forced by this
    environment's TPU runtime) XLA elides f32->bf16->f32 casts, which
    silently destroys cast-based splitting (residuals fold to zero)."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jax.lax.bitcast_convert_type(
        u & jnp.uint32(0xFFFF0000), jnp.float32
    )


def _bf16_parts(x, terms: int):
    """Split x (f32) into `terms` f32 arrays whose values lie exactly on
    the bf16 grid (except the last, whose truncation error is O(2^-8) of
    an O(2^-16) term).  Parts stay f32: feeding actual bf16 arrays into
    einsum falls off the fast MXU lowering here, whereas f32 inputs at
    default precision are truncated to bf16 internally — exactly our
    values, on the fast path."""
    parts = []
    r = x
    for i in range(terms):
        if i + 1 < terms:
            hi = _truncate_to_bf16_grid(r)
            parts.append(hi)
            r = r - hi  # exact f32 subtraction
        else:
            parts.append(r)
    return parts


def _split_einsum_raw(eq: str, A: jax.Array, B: jax.Array, terms: int = 3):
    As = _bf16_parts(A, terms)
    Bs = _bf16_parts(B, terms)
    out = None
    for i in range(terms):
        for j in range(terms):
            if i + j >= terms:
                continue
            p = jnp.einsum(eq, As[i], Bs[j])
            out = p if out is None else out + p
    return out


def _adjoint_eqs(eq: str):
    """(eq_dA, eq_dB) einsum equations for the VJP of einsum(eq, A, B).

    Valid for equations without repeated indices within one operand
    (every contraction in this codebase).  dA = einsum(eq_dA, g, B),
    dB = einsum(eq_dB, A, g)."""
    lhs, out = eq.split("->")
    a, b = lhs.split(",")
    return f"{out},{b}->{a}", f"{a},{out}->{b}"


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 3))
def _split_einsum(eq: str, A: jax.Array, B: jax.Array, terms: int = 3):
    return _split_einsum_raw(eq, A, B, terms)


def _split_einsum_fwd(eq, A, B, terms):
    return _split_einsum_raw(eq, A, B, terms), (A, B)


def _split_einsum_bwd(eq, terms, res, g):
    # The adjoints are exactly as cancellation-sensitive as the forward
    # product: a plain bf16 MXU adjoint puts ~3e-3 relative noise on the
    # very gradients the split forward was built to protect (shape-task
    # vertex gradients, material-bin gradients).  Split both directions.
    A, B = res
    eq_dA, eq_dB = _adjoint_eqs(eq)
    return (
        _split_einsum_raw(eq_dA, g, B, terms),
        _split_einsum_raw(eq_dB, A, g, terms),
    )


_split_einsum.defvjp(_split_einsum_fwd, _split_einsum_bwd)


def precise_einsum(eq: str, A: jax.Array, B: jax.Array, terms: int = 3):
    """einsum(eq, A, B) with f32-grade accuracy on TPU MXUs — in both the
    forward product and its autodiff adjoints (custom VJP)."""
    if A.dtype != jnp.float32 or B.dtype != jnp.float32 or not _use_split():
        return jnp.einsum(eq, A, B)
    return _split_einsum(eq, A, B, terms)


def presplit(x: jax.Array, terms: int = 3):
    """Split an operand ONCE for repeated `precise_einsum_presplit` calls.

    Splitting is elementwise over the full array — for the (E, 3N, 3N)
    element blocks that's ~2x the einsum's own HBM traffic, so re-splitting
    a loop-invariant operand every solver iteration dominates the matvec
    (measured 15 ms -> 2.6 ms/iteration on the bowl once hoisted).  XLA
    does NOT hoist it out of `while_loop` bodies on its own; callers that
    apply an operator inside a loop should presplit outside.

    Returns a 1-tuple (the array unchanged) when the split path is off
    (CPU / non-f32), mirroring precise_einsum's fall-through."""
    if x.dtype != jnp.float32 or not _use_split():
        return (x,)
    return tuple(_bf16_parts(x, terms))


def precise_einsum_presplit(eq: str, A_parts, B: jax.Array):
    """einsum(eq, A, B) where A was pre-split with `presplit`."""
    if len(A_parts) == 1:
        return jnp.einsum(eq, A_parts[0], B)
    terms = len(A_parts)
    Bs = _bf16_parts(B.astype(jnp.float32), terms)
    out = None
    for i in range(terms):
        for j in range(terms):
            if i + j >= terms:
                continue
            p = jnp.einsum(eq, A_parts[i], Bs[j])
            out = p if out is None else out + p
    return out


def precise_matmul(A: jax.Array, B: jax.Array, terms: int = 3):
    """A @ B (2D) with f32-grade accuracy on TPU MXUs."""
    if A.dtype != jnp.float32 or B.dtype != jnp.float32 or not _use_split():
        return A @ B
    return precise_einsum("ij,jk->ik", A, B, terms)
