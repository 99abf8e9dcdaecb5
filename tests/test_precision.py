"""Split-precision einsum: f32-grade accuracy reconstructed from bf16
parts (on CPU it must be the identity fallback)."""

import numpy as np
import jax
import jax.numpy as jnp

from diffsound_tpu.fem.precision import _bf16_parts, precise_einsum, precise_matmul


def test_bf16_parts_reconstruct():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 64)).astype(np.float32))
    parts = _bf16_parts(x, 3)
    recon = sum(p.astype(jnp.float32) for p in parts)
    err = float(jnp.max(jnp.abs(recon - x)) / jnp.max(jnp.abs(x)))
    assert err < 1e-6


def test_precise_einsum_matches_f64():
    rng = np.random.default_rng(1)
    A = jnp.asarray(rng.standard_normal((100, 30, 30)).astype(np.float32))
    X = jnp.asarray(rng.standard_normal((100, 30, 7)).astype(np.float32))
    out = np.asarray(precise_einsum("eij,ejk->eik", A, X))
    ref = np.einsum(
        "eij,ejk->eik", np.asarray(A, np.float64), np.asarray(X, np.float64)
    )
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert rel < 1e-6


def test_precise_matmul_f64_passthrough():
    rng = np.random.default_rng(2)
    A = jnp.asarray(rng.standard_normal((32, 32)))
    B = jnp.asarray(rng.standard_normal((32, 8)))
    assert A.dtype == jnp.float64  # x64 on CPU
    np.testing.assert_allclose(
        np.asarray(precise_matmul(A, B)), np.asarray(A) @ np.asarray(B), rtol=1e-12
    )


def test_split_path_values_and_vjp(monkeypatch):
    """Force the TPU split path on CPU and check BOTH the forward product
    and the autodiff adjoints against f64.

    Regression: precise_einsum used to rely on JAX's derived adjoints,
    which on TPU run as plain bf16 MXU matmuls — the gradient side then
    carries the very ~3e-3 cancellation noise the split forward removes
    (the round-3 thickness-gradient corruption; the custom VJP splits
    both directions)."""
    from diffsound_tpu.fem import precision

    monkeypatch.setattr(precision, "_use_split", lambda: True)
    rng = np.random.default_rng(3)
    A = jnp.asarray(rng.standard_normal((40, 12, 12)).astype(np.float32))
    X = jnp.asarray(rng.standard_normal((40, 12, 5)).astype(np.float32))
    C = jnp.asarray(rng.standard_normal((40, 12, 5)).astype(np.float32))

    def f(a, x):
        return jnp.sum(precision.precise_einsum("eij,ejk->eik", a, x) * C)

    val, (gA, gX) = jax.value_and_grad(f, argnums=(0, 1))(A, X)

    A64, X64, C64 = (np.asarray(v, np.float64) for v in (A, X, C))
    ref = np.sum(np.einsum("eij,ejk->eik", A64, X64) * C64)
    gA_ref = np.einsum("eik,ejk->eij", C64, X64)
    gX_ref = np.einsum("eij,eik->ejk", A64, C64)
    assert abs(float(val) - ref) / abs(ref) < 1e-5
    assert np.abs(np.asarray(gA) - gA_ref).max() / np.abs(gA_ref).max() < 1e-6
    assert np.abs(np.asarray(gX) - gX_ref).max() / np.abs(gX_ref).max() < 1e-6
