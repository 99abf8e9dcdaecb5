"""diffsound-tpu: a TPU-native differentiable modal sound rendering framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
TechnetiumMan/DiffSound (differentiable modal sound rendering and inverse
rendering): high-order tetrahedral FEM, generalized LOBPCG eigensolving with
differentiable eigenvalues, damped modal oscillator audio synthesis, DDSP-style
losses (multi-scale STFT L1 / RMSE / Sinkhorn-OT), and DMTet marching-tets
shape parameterization for material / geometry / thickness / morphing
inference tasks -- sharded over TPU device meshes with pjit/shard_map.

Design notes (TPU-first, not a port):
  * FEM operators are *matrix-free*: per-element dense stiffness blocks
    (E, 3N, 3N) split into mu/lambda parts, applied as batched MXU matmuls
    and reduced with segment_sum -- no sparse matrices on device.
  * The generalized eigenproblem K U = M U Lambda is solved by a blocked
    LOBPCG entirely on device (see `solvers.lobpcg`); the non-differentiable
    eigenpairs feed a Rayleigh-quotient correction that carries exact
    first-order gradients (see `solvers.diff_eigs`).
  * All hot paths are static-shape and jit-compiled once; dynamic meshing
    (marching tets) uses capacity-padded buffers with validity masks.

Precision: x64 is enabled globally so that CPU validation paths can run in
float64; TPU production paths explicitly use float32 with nondimensionalized
material constants (E/rho) and unit-scaled meshes.
"""

import jax

jax.config.update("jax_enable_x64", True)

# NOTE on matmul precision: the TPU default (bf16 MXU inputs) is NOT
# acceptable for FEM matvecs — nodal forces are ~100x-cancelling sums, so
# 3e-3 input rounding becomes >100% Rayleigh-quotient error — but XLA's
# "high"/"highest" modes fall off the MXU fast path (~400x slower here).
# All cancellation-sensitive contractions therefore go through
# fem.precision.precise_einsum (multi-term bf16 splitting, f32-grade
# accuracy at ~6x bf16 cost); the global default stays untouched.

__version__ = "0.1.0"


def default_dtype():
    """f64 on CPU (validation), f32 on TPU/GPU (production)."""
    import jax.numpy as jnp

    if jax.default_backend() == "cpu":
        return jnp.float64
    return jnp.float32
