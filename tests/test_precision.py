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
