"""Fully-sharded multi-pair training step: dp (material pairs) x ep
(elements) on one device mesh.

The reference trains its 16 random material pairs *serially*
(/root/reference/experiments/material_sync_train.py:95); here all pairs
train simultaneously: the pair axis is sharded over "dp", the element
arrays over "ep", and one shard_map program performs — per local pair —
the warm LOBPCG eigensolve refresh, the Rayleigh-corrected frequencies,
oscillator synthesis, the multi-scale L1 loss, and the Adam update, with
the only cross-device communication being the psum over "ep" inside the
matrix-free K/M matvecs.  Per-pair parameters mean no gradient all-reduce
across "dp" at all.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..audio.mss_loss import MSSLoss
from ..audio.oscillator import TraditionalOscillatorParams
from ..fem.assembly import ElementOps
from ..fem.precision import precise_einsum
from ..models.material_model import MaterialBins
from ..solvers.diff_eigs import rayleigh_corrected_eigenvalues, undamped_frequencies
from ..solvers.lobpcg import lobpcg
from .ops import pad_element_ops


class MultipairTrainer:
    """Builds the jitted (dp, ep)-sharded step for material_sync-style
    multi-pair inference on a shared mesh."""

    def __init__(
        self,
        bins: MaterialBins,
        ops: ElementOps,
        osc: TraditionalOscillatorParams,
        mesh: Mesh,
        forces=None,
        n_ffts=(1024, 512, 256, 128, 64),
        sample_rate: float = 32000.0,
        extra_modes: int = 6,
        lr: float = 2e-3,
        refresh_iters: int = 40,
        refresh_tol: float = 1e-3,
    ):
        """refresh_iters/refresh_tol: warm-LOBPCG budget for refresh steps
        (same semantics as the serial trainer's _lobpcg_solve — tol at the
        f32 matvec noise floor with convergence-based early exit, NOT a
        fixed tiny budget every step).  The driver calls step(...,
        refresh=True) on the serial path's EIGEN_DECOMPOSE_CYCLE cadence
        and refresh=False in between."""
        self.bins = bins
        self.mesh = mesh
        self.osc = osc
        self.forces = forces
        self.loss = MSSLoss(list(n_ffts), sample_rate, loss_type="l1_loss")
        # early-phase Sinkhorn loss (serial parity: the L1 gradient is
        # uninformative across large frequency mismatches,
        # material_sync_train.py:143-146)
        early_ffts = [n for n in (2048, 1024) if n <= osc.sample_num] or [
            max(n_ffts)
        ]
        self.loss_early = MSSLoss(early_ffts, sample_rate, loss_type="geomloss")
        self.extra_modes = extra_modes
        self.opt = optax.adam(lr)
        self.refresh_iters = refresh_iters
        self.refresh_tol = refresh_tol
        ep = mesh.shape["ep"]
        self.ops = pad_element_ops(ops, ep)
        self.num_vertices = ops.num_vertices

        # per-shard scatter->gather transposes (TPU scatter-add is
        # serialized and would dominate the sharded matvec exactly as it
        # did the single-chip path — BENCH_NOTES round 1 finding #6)
        import numpy as np

        from ..fem.assembly import build_gather_transpose

        tets_np = np.asarray(self.ops.tets)
        Epad = tets_np.shape[0]
        chunk = Epad // ep
        N = tets_np.shape[1]
        gs = [
            build_gather_transpose(tets_np[s * chunk : (s + 1) * chunk], ops.num_vertices)
            for s in range(ep)
        ]
        D = max(g.shape[1] for g in gs)
        gs = [
            np.pad(g, ((0, 0), (0, D - g.shape[1])), constant_values=chunk * N)
            for g in gs
        ]
        gidx = np.stack(gs)  # (ep, V, D); dummy = chunk*N = local zero row

        # place element arrays on the ep axis once
        eshard = NamedSharding(mesh, P("ep"))
        repl = NamedSharding(mesh, P())
        self.e_tets = jax.device_put(self.ops.tets, eshard)
        self.e_kmu = jax.device_put(self.ops.k_mu, eshard)
        self.e_klam = jax.device_put(self.ops.k_lam, eshard)
        self.e_mscale = jax.device_put(self.ops.mass_scale, eshard)
        self.e_gidx = jax.device_put(jnp.asarray(gidx), eshard)
        self.mref = jax.device_put(self.ops.mref, repl)

        self._step = {}

    # -- local (per ep-shard) matvecs; psum over "ep" -----------------------

    def _reduce_local(self, ye_flat, gidx, k):
        """(El*N, 3k) local element-node rows -> (3V, k) via the per-shard
        gather transpose, then psum over 'ep' for the cross-shard nodes."""
        V = self.num_vertices
        rows = jnp.concatenate(
            [ye_flat, jnp.zeros((1, ye_flat.shape[1]), ye_flat.dtype)], axis=0
        )
        out = jnp.sum(rows[gidx], axis=1)  # (V, 3k)
        return jax.lax.psum(out.reshape(V * 3, k), "ep")

    def _k_diag(self, tets, kmu, klam, gidx, mu, lam):
        d = mu * jnp.diagonal(kmu, axis1=1, axis2=2) + lam * jnp.diagonal(
            klam, axis1=1, axis2=2
        )  # (El, 3N)
        El, N = tets.shape
        return self._reduce_local(d.reshape(El * N, 3), gidx, 1)[:, 0]

    def _k_mv(self, tets, kmu, klam, gidx, x, mu, lam):
        V = self.num_vertices
        k = x.shape[-1]
        xe = x.reshape(V, 3, k)[tets]
        El, N = tets.shape
        ye = mu * precise_einsum("eij,ejk->eik", kmu, xe.reshape(El, 3 * N, k)) + (
            lam * precise_einsum("eij,ejk->eik", klam, xe.reshape(El, 3 * N, k))
        )
        return self._reduce_local(ye.reshape(El * N, 3 * k), gidx, k)

    def _m_mv(self, tets, mscale, gidx, x):
        V = self.num_vertices
        k = x.shape[-1]
        xe = x.reshape(V, 3, k)[tets]
        El0, N0 = tets.shape
        k0 = xe.shape[-1]
        ye = precise_einsum(
            "ab,ebk->eak", self.mref, xe.reshape(El0, N0, 3 * k0)
        ).reshape(El0, N0, 3, k0) * mscale[:, None, None, None]
        El, N = tets.shape
        return self._reduce_local(ye.reshape(El * N, 3 * k), gidx, k)

    def _build_step(self, refresh: bool, early: bool):
        mesh = self.mesh
        dp_spec = P("dp")
        ep_spec = P("ep")

        def local_step(params_b, opt_b, eigval_b, eigvec_b, gt_b, tets, kmu, klam, mscale, gidx):
            # closure-captured constants are unvarying under the vma type
            # system; anything whose backward cotangent is dp-varying (the
            # force spectrum in the FFT convolution) must be explicitly
            # promoted or grad raises a cotangent-type mismatch
            if self.forces is None:
                forces = None
            elif hasattr(jax.lax, "pcast"):
                forces = jax.lax.pcast(self.forces, "dp", to="varying")
            else:
                forces = jax.lax.pvary(self.forces, ("dp",))
            gidx_l = gidx[0]  # (1, V, D) shard -> local (V, D)
            k_mv = lambda x, mu, lam: self._k_mv(tets, kmu, klam, gidx_l, x, mu, lam)
            m_mv = lambda x: self._m_mv(tets, mscale, gidx_l, x)

            def one_pair(params, eigval, eigvec, gt):
                mu0, lam0 = jax.lax.stop_gradient(self.bins.lame(params))
                if refresh:
                    # warm eigensolve refresh on the diagonally-scaled
                    # pencil with the serial trainer's semantics
                    # (convergence tol at the f32 noise floor, early
                    # exit) — called on the refresh cadence, not every step
                    d = self._k_diag(tets, kmu, klam, gidx_l, mu0, lam0)
                    dsc = jax.lax.rsqrt(
                        jnp.maximum(d, jnp.finfo(eigvec.dtype).tiny)
                    )
                    res = lobpcg(
                        lambda y: dsc[:, None] * k_mv(dsc[:, None] * y, mu0, lam0),
                        lambda y: dsc[:, None] * m_mv(dsc[:, None] * y),
                        eigvec / dsc[:, None],
                        max_iters=self.refresh_iters,
                        tol=self.refresh_tol,
                    )
                    eigval, eigvec = res.eigenvalues, dsc[:, None] * res.eigenvectors
                eigval = jax.lax.stop_gradient(eigval)
                eigvec = jax.lax.stop_gradient(eigvec)

                def loss_fn(p):
                    mu, lam = self.bins.lame(p)
                    lams = rayleigh_corrected_eigenvalues(
                        lambda x: k_mv(x, mu, lam), m_mv, eigval, eigvec
                    )[self.extra_modes :]
                    freqs = undamped_frequencies(lams)
                    sig, damped = self.osc(freqs, forces, dtype=gt.dtype)
                    loss_obj = self.loss_early if early else self.loss
                    return loss_obj(sig, jax.lax.stop_gradient(gt), damped, 1.0)

                loss, g = jax.value_and_grad(loss_fn)(params)
                return loss, self.bins.mask_grads(g), eigval, eigvec

            losses, grads, eigval_b, eigvec_b = jax.vmap(one_pair)(
                params_b, eigval_b, eigvec_b, gt_b
            )
            updates, opt_b = jax.vmap(self.opt.update)(grads, opt_b)
            params_b = jax.vmap(optax.apply_updates)(params_b, updates)
            return params_b, opt_b, losses, eigval_b, eigvec_b

        shmapped = jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(
                dp_spec, dp_spec, dp_spec, dp_spec, dp_spec,
                ep_spec, ep_spec, ep_spec, ep_spec, ep_spec,
            ),
            out_specs=(dp_spec, dp_spec, dp_spec, dp_spec, dp_spec),
        )

        @jax.jit
        def step(params_b, opt_b, eigval_b, eigvec_b, gt_b):
            return shmapped(
                params_b, opt_b, eigval_b, eigvec_b, gt_b,
                self.e_tets, self.e_kmu, self.e_klam, self.e_mscale,
                self.e_gidx,
            )

        return step

    def init(self, key, num_pairs: int, pretrain: bool = True):
        """Per-pair bin logits, pretrained to the init material's table
        values (the reference's init_material_coeffs) then broadcast."""
        params0 = self.bins.init_params(key)
        if pretrain:
            params0 = self.bins.pretrain(params0)
        params_b = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (num_pairs,) + x.shape), params0
        )
        opt_b = jax.vmap(self.opt.init)(params_b)
        shard = NamedSharding(self.mesh, P("dp"))
        params_b = jax.device_put(params_b, jax.tree.map(lambda _: shard, params_b))
        return params_b, opt_b

    def step(self, params_b, opt_b, eigval_b, eigvec_b, gt_b,
             refresh: bool = False, early: bool = False):
        """One sharded training step over all pairs; refresh=True also
        runs the warm eigensolve (call on the serial trainer's
        EIGEN_DECOMPOSE_CYCLE cadence); early=True uses the Sinkhorn
        early-phase loss (serial parity: switch at early_loss_epoch).
        Returns (params, opt_state, losses (B,), eigval, eigvec)."""
        key = (bool(refresh), bool(early))
        if key not in self._step:
            self._step[key] = self._build_step(*key)
        return self._step[key](params_b, opt_b, eigval_b, eigvec_b, gt_b)
