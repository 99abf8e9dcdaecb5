"""Element-sharded FEM operators and batched multi-pair training.

Sharding design (new — the reference has no distributed code, SURVEY.md
section 2.8):

  * element arrays (tets, k_mu, k_lam, mass_scale) are sharded over the
    "ep" mesh axis on their leading (element) dimension, padded with
    zero-volume masked tets to a multiple of the axis size;
  * K@X gathers the *replicated* node vector, does the local batched
    element matmuls, segment-sums into a full-size node accumulator, and
    `psum`s over "ep" — boundary nodes shared between shards are reduced
    by the collective, no halo bookkeeping needed;
  * the "dp" axis carries independent inference problems (material pairs,
    audio channels): everything is vmapped per pair and sharded with
    PartitionSpec("dp") on the batch dimension.  Per-pair parameters mean
    no gradient all-reduce is required across dp — the axes compose as a
    2D (dp, ep) layout.

Everything works under jit on a CPU-emulated mesh
(--xla_force_host_platform_device_count) exactly as on real chips.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fem.assembly import ElementOps
from ..fem.precision import precise_einsum


def pad_element_ops(ops: ElementOps, multiple: int) -> ElementOps:
    """Pad the element dimension to a multiple with masked (zero) tets."""
    E = ops.num_tets
    pad = (-E) % multiple
    if pad == 0:
        return ops
    pz = lambda a: jnp.concatenate(
        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0
    )
    return ElementOps(
        tets=pz(ops.tets),  # index 0 is fine: k/m blocks are zero
        k_mu=pz(ops.k_mu),
        k_lam=pz(ops.k_lam),
        mass_scale=pz(ops.mass_scale),
        mref=ops.mref,
        num_vertices=ops.num_vertices,
    )


def shard_element_ops(ops: ElementOps, mesh: Mesh, axis: str = "ep") -> ElementOps:
    """Device-put element arrays sharded over `axis` (leading dim)."""
    ops = pad_element_ops(ops, mesh.shape[axis])
    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    return ElementOps(
        tets=jax.device_put(ops.tets, shard),
        k_mu=jax.device_put(ops.k_mu, shard),
        k_lam=jax.device_put(ops.k_lam, shard),
        mass_scale=jax.device_put(ops.mass_scale, shard),
        mref=jax.device_put(ops.mref, repl),
        num_vertices=ops.num_vertices,
    )


class ShardedFEM:
    """Matrix-free K@X / M@X with elements sharded over a mesh axis.

    Built on shard_map + psum: each shard computes its local element
    contributions into a full node vector; the psum over `axis` performs
    the cross-shard node reduction (shared/boundary nodes).
    """

    def __init__(self, ops: ElementOps, mesh: Mesh, axis: str = "ep"):
        self.mesh = mesh
        self.axis = axis
        self.ops = shard_element_ops(ops, mesh, axis)
        self.num_vertices = ops.num_vertices

    def _local_k(self, tets, k_mu, k_lam, x, mu, lam):
        V = self.num_vertices
        k = x.shape[-1]
        xe = x.reshape(V, 3, k)[tets]  # (El, N, 3, k)
        El, N = tets.shape
        xe = xe.reshape(El, 3 * N, k)
        ye = mu * precise_einsum("eij,ejk->eik", k_mu, xe) + lam * precise_einsum(
            "eij,ejk->eik", k_lam, xe
        )
        out = jax.ops.segment_sum(
            ye.reshape(El * N, 3 * k), tets.reshape(-1), num_segments=V
        )
        return jax.lax.psum(out.reshape(V * 3, k), self.axis)

    def _local_m(self, tets, mref, mass_scale, x, density):
        V = self.num_vertices
        k = x.shape[-1]
        xe = x.reshape(V, 3, k)[tets]  # (El, N, 3, k)
        El0, N0 = tets.shape
        ye = precise_einsum(
            "ab,ebk->eak", mref, xe.reshape(El0, N0, 3 * k)
        ).reshape(El0, N0, 3, k)
        ye = ye * (density * mass_scale)[:, None, None, None]
        El, N = tets.shape
        out = jax.ops.segment_sum(
            ye.reshape(El * N, 3 * k), tets.reshape(-1), num_segments=V
        )
        return jax.lax.psum(out.reshape(V * 3, k), self.axis)

    def k_matvec(self, x, mu, lam):
        ax = self.axis
        f = jax.shard_map(
            lambda t, km, kl, xx: self._local_k(t, km, kl, xx, mu, lam),
            mesh=self.mesh,
            in_specs=(P(ax), P(ax), P(ax), P()),
            out_specs=P(),
        )
        return f(self.ops.tets, self.ops.k_mu, self.ops.k_lam, x)

    def m_matvec(self, x, density=1.0):
        ax = self.axis
        f = jax.shard_map(
            lambda t, ms, xx: self._local_m(t, self.ops.mref, ms, xx, density),
            mesh=self.mesh,
            in_specs=(P(ax), P(ax), P()),
            out_specs=P(),
        )
        return f(self.ops.tets, self.ops.mass_scale, x)

    def k_diag(self, mu, lam):
        ax = self.axis

        def local(t, km, kl):
            V = self.num_vertices
            d = mu * jnp.diagonal(km, axis1=1, axis2=2) + lam * jnp.diagonal(
                kl, axis1=1, axis2=2
            )
            El, N = t.shape
            out = jax.ops.segment_sum(
                d.reshape(El * N, 3), t.reshape(-1), num_segments=V
            )
            return jax.lax.psum(out.reshape(-1), ax)

        f = jax.shard_map(
            local, mesh=self.mesh, in_specs=(P(ax), P(ax), P(ax)), out_specs=P()
        )
        return f(self.ops.tets, self.ops.k_mu, self.ops.k_lam)
