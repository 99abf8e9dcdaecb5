"""Debiased Sinkhorn divergence for spectrogram point clouds.

JAX replacement for geomloss `SamplesLoss("sinkhorn", p=2, blur=0.01)` as
used by the reference's early-phase spectral loss
(/root/reference/src/ddsp/mss_loss.py:83,104-117): log-domain symmetric
Sinkhorn with epsilon-scaling annealing, debiased

    S_eps(a, b) = OT_eps(a, b) - 1/2 OT_eps(a, a) - 1/2 OT_eps(b, b).

Point clouds here are tiny (freq-bins x 4 features), so the quadratic cost
matrices are cheap; everything is lax.scan'd and jit/vmap friendly.  The
role of this loss is to give useful gradients across large frequency
mismatches — exact numeric agreement with geomloss is not required, the
transport geometry is.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _cost(x, y):
    """Halved squared euclidean cost C_ij = |x_i - y_j|^2 / 2 (geomloss p=2
    convention)."""
    d2 = jnp.sum((x[:, None, :] - y[None, :, :]) ** 2, axis=-1)
    return 0.5 * d2


def _softmin(eps, C, f):
    """(softmin over j of C_ij - f_j) with temperature eps."""
    return -eps * jax.scipy.special.logsumexp((f[None, :] - C) / eps, axis=1)


def _sinkhorn_potentials(Cxy, Cyx, loga, logb, eps_schedule):
    """Symmetric log-domain Sinkhorn with annealed epsilon.  Returns the
    final potentials (f on x, g on y)."""

    n, m = Cxy.shape
    # zero potentials tied (exactly zero-valued) to the cost matrices'
    # varying type: under shard_map's vma checker the scan carry must
    # enter with the varying axes it acquires inside the body
    f = 0.0 * Cxy[:, 0]
    g = 0.0 * Cyx[:, 0]

    def step(carry, eps):
        f, g = carry
        # include the log-weights in the softmin: softmin of C - g - eps*logb
        ft = -eps * jax.scipy.special.logsumexp(
            (g[None, :] + eps * logb[None, :] - Cxy) / eps, axis=1
        )
        gt = -eps * jax.scipy.special.logsumexp(
            (f[None, :] + eps * loga[None, :] - Cyx) / eps, axis=1
        )
        # symmetric (averaged) update for stability
        f = 0.5 * (f + ft)
        g = 0.5 * (g + gt)
        return (f, g), None

    (f, g), _ = jax.lax.scan(step, (f, g), eps_schedule)
    # one final pair of full updates at the target epsilon
    eps = eps_schedule[-1]
    f = -eps * jax.scipy.special.logsumexp(
        (g[None, :] + eps * logb[None, :] - Cxy) / eps, axis=1
    )
    g = -eps * jax.scipy.special.logsumexp(
        (f[None, :] + eps * loga[None, :] - Cyx) / eps, axis=1
    )
    return f, g


def _eps_schedule(diameter2, blur, scaling, dtype, steps: int = 32):
    """Annealed epsilon ladder from the (traced) squared diameter down to
    blur^2, with a static number of steps: extra steps clamp at the target
    epsilon and are harmless no-ops, so the ladder adapts to the data
    scale (geomloss computes its diameter from the data too — a fixed
    guess explodes in f32 when spectrogram features span 1e5)."""
    eps_end = jnp.asarray(float(blur) ** 2, dtype)
    eps_start = jnp.maximum(jnp.asarray(diameter2, dtype), eps_end)
    t = jnp.arange(steps, dtype=dtype)
    return jnp.maximum(eps_end, eps_start * (scaling**2) ** t)


def _diameter2(x, y):
    """Squared-diameter upper bound of the joint cloud (sum of per-dim
    squared ranges)."""
    lo = jnp.minimum(jnp.min(x, axis=0), jnp.min(y, axis=0))
    hi = jnp.maximum(jnp.max(x, axis=0), jnp.max(y, axis=0))
    return jnp.sum((hi - lo) ** 2)


def sinkhorn_divergence(
    x: jnp.ndarray,
    y: jnp.ndarray,
    blur: float = 0.01,
    scaling: float = 0.5,
) -> jnp.ndarray:
    """Debiased Sinkhorn divergence between uniform point clouds x (n, d)
    and y (m, d); the epsilon ladder adapts to the cloud diameter."""
    dtype = x.dtype
    n, m = x.shape[0], y.shape[0]
    loga = jnp.full((n,), -jnp.log(n), dtype)
    logb = jnp.full((m,), -jnp.log(m), dtype)
    sched = _eps_schedule(jax.lax.stop_gradient(_diameter2(x, y)), blur, scaling, dtype)

    Cxy = _cost(x, y)
    f_ab, g_ab = _sinkhorn_potentials(Cxy, Cxy.T, loga, logb, sched)

    Cxx = _cost(x, x)
    f_aa, _ = _sinkhorn_potentials(Cxx, Cxx.T, loga, loga, sched)
    Cyy = _cost(y, y)
    f_bb, _ = _sinkhorn_potentials(Cyy, Cyy.T, logb, logb, sched)

    a = jnp.exp(loga)
    b = jnp.exp(logb)
    return jnp.sum(a * (f_ab - f_aa)) + jnp.sum(b * (g_ab - f_bb))
