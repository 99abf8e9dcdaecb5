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
        refresh_iters: int = 4,
    ):
        self.bins = bins
        self.mesh = mesh
        self.osc = osc
        self.forces = forces
        self.loss = MSSLoss(list(n_ffts), sample_rate, loss_type="l1_loss")
        self.extra_modes = extra_modes
        self.opt = optax.adam(lr)
        self.refresh_iters = refresh_iters
        self.ops = pad_element_ops(ops, mesh.shape["ep"])
        self.num_vertices = ops.num_vertices

        # place element arrays on the ep axis once
        eshard = NamedSharding(mesh, P("ep"))
        repl = NamedSharding(mesh, P())
        self.e_tets = jax.device_put(self.ops.tets, eshard)
        self.e_kmu = jax.device_put(self.ops.k_mu, eshard)
        self.e_klam = jax.device_put(self.ops.k_lam, eshard)
        self.e_mscale = jax.device_put(self.ops.mass_scale, eshard)
        self.mref = jax.device_put(self.ops.mref, repl)

        self._step = self._build_step()

    # -- local (per ep-shard) matvecs; psum over "ep" -----------------------

    def _k_mv(self, tets, kmu, klam, x, mu, lam):
        V = self.num_vertices
        k = x.shape[-1]
        xe = x.reshape(V, 3, k)[tets]
        El, N = tets.shape
        ye = mu * precise_einsum("eij,ejk->eik", kmu, xe.reshape(El, 3 * N, k)) + (
            lam * precise_einsum("eij,ejk->eik", klam, xe.reshape(El, 3 * N, k))
        )
        out = jax.ops.segment_sum(
            ye.reshape(El * N, 3 * k), tets.reshape(-1), num_segments=V
        )
        return jax.lax.psum(out.reshape(V * 3, k), "ep")

    def _m_mv(self, tets, mscale, x):
        V = self.num_vertices
        k = x.shape[-1]
        xe = x.reshape(V, 3, k)[tets]
        El0, N0 = tets.shape
        k0 = xe.shape[-1]
        ye = precise_einsum(
            "ab,ebk->eak", self.mref, xe.reshape(El0, N0, 3 * k0)
        ).reshape(El0, N0, 3, k0) * mscale[:, None, None, None]
        El, N = tets.shape
        out = jax.ops.segment_sum(
            ye.reshape(El * N, 3 * k), tets.reshape(-1), num_segments=V
        )
        return jax.lax.psum(out.reshape(V * 3, k), "ep")

    def _build_step(self):
        mesh = self.mesh
        dp_spec = P("dp")
        ep_spec = P("ep")

        def local_step(params_b, opt_b, eigval_b, eigvec_b, gt_b, tets, kmu, klam, mscale):
            k_mv = lambda x, mu, lam: self._k_mv(tets, kmu, klam, x, mu, lam)
            m_mv = lambda x: self._m_mv(tets, mscale, x)

            def one_pair(params, eigval, eigvec, gt):
                mu0, lam0 = jax.lax.stop_gradient(self.bins.lame(params))
                # warm eigensolve refresh (detached, fixed iteration budget)
                if self.refresh_iters > 0:
                    res = lobpcg(
                        lambda x: k_mv(x, mu0, lam0),
                        m_mv,
                        eigvec,
                        max_iters=self.refresh_iters,
                        tol=1e-30,  # run the full fixed budget
                    )
                    eigval, eigvec = res.eigenvalues, res.eigenvectors
                eigval = jax.lax.stop_gradient(eigval)
                eigvec = jax.lax.stop_gradient(eigvec)

                def loss_fn(p):
                    mu, lam = self.bins.lame(p)
                    lams = rayleigh_corrected_eigenvalues(
                        lambda x: k_mv(x, mu, lam), m_mv, eigval, eigvec
                    )[self.extra_modes :]
                    freqs = undamped_frequencies(lams)
                    sig, damped = self.osc(freqs, self.forces, dtype=gt.dtype)
                    return self.loss(sig, gt, damped, 1.0)

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
                ep_spec, ep_spec, ep_spec, ep_spec,
            ),
            out_specs=(dp_spec, dp_spec, dp_spec, dp_spec, dp_spec),
            check_vma=False,
        )

        @jax.jit
        def step(params_b, opt_b, eigval_b, eigvec_b, gt_b):
            return shmapped(
                params_b, opt_b, eigval_b, eigvec_b, gt_b,
                self.e_tets, self.e_kmu, self.e_klam, self.e_mscale,
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

    def step(self, params_b, opt_b, eigval_b, eigvec_b, gt_b):
        """One sharded training step over all pairs.  Returns
        (params, opt_state, losses (B,), eigval, eigvec)."""
        return self._step(params_b, opt_b, eigval_b, eigvec_b, gt_b)
