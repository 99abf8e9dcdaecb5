"""Batched modal-Newton material fit over a (dp, ep) device mesh.

The sharded-fleet version of models/modal_fit.py: all material pairs fit
simultaneously.  Each Newton round is ONE device dispatch — a shard_map
program that, per dp-local pair, runs the warm LOBPCG refresh at that
pair's current (mu, lambda) and computes the modal quadratic forms
(q_mu, q_lam, q_m), with elements ep-sharded and psum'd inside the
matvecs (exactly the MultipairTrainer's communication pattern,
parallel/train.py) — followed by a tiny host step: per-pair peak
assignment + the closed-form 2-parameter LSQ.

The reference runs its 16 pairs serially at 3000 Adam epochs each
(/root/reference/experiments/material_sync_train.py:95); this fits all
of them in ~rounds x one-warm-solve wall-clock total.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models.modal_fit import (
    assign_targets, lambda_from_damped_freq, lame_to_E_nu, modal_lsq_fit,
    scale_align,
)
from ..solvers.lobpcg import lobpcg


class BatchedModalNewton:
    """trainer: a parallel.train.MultipairTrainer (reuses its sharded
    element arrays and matvecs).  peaks_list/pw_list: per-pair spectral
    peaks from audio.freq_loss.extract_spectral_peaks."""

    def __init__(self, trainer, peaks_list, pw_list, sr, alpha, beta,
                 match_sigma: float = 0.06, refresh_iters: int = 60,
                 refresh_tol: float = 1e-3):
        self.tr = trainer
        self.peaks_list = [np.asarray(p, np.float64) for p in peaks_list]
        self.pw_list = [np.asarray(w, np.float64) for w in pw_list]
        self.sr = float(sr)
        self.alpha = float(alpha)
        self.beta = float(beta)
        self.match_sigma = match_sigma
        self.refresh_iters = refresh_iters
        self.refresh_tol = refresh_tol
        self._refresh = None

    # -- one sharded refresh + quadratic forms round -------------------------

    def _build_refresh(self):
        tr = self.tr

        def local(mu_b, lam_b, eigvec_b, tets, kmu, klam, mscale, gidx):
            gidx_l = gidx[0]

            def one_pair(mu, lam, eigvec):
                d = tr._k_diag(tets, kmu, klam, gidx_l, mu, lam)
                dsc = jax.lax.rsqrt(
                    jnp.maximum(d, jnp.finfo(eigvec.dtype).tiny)
                )
                res = lobpcg(
                    lambda y: dsc[:, None] * tr._k_mv(
                        tets, kmu, klam, gidx_l, dsc[:, None] * y, mu, lam
                    ),
                    lambda y: dsc[:, None] * tr._m_mv(
                        tets, mscale, gidx_l, dsc[:, None] * y
                    ),
                    eigvec / dsc[:, None],
                    max_iters=self.refresh_iters,
                    tol=self.refresh_tol,
                )
                U = dsc[:, None] * res.eigenvectors
                q_mu = jnp.sum(
                    U * tr._k_mv(tets, kmu, klam, gidx_l, U, 1.0, 0.0), axis=0
                )
                q_lam = jnp.sum(
                    U * tr._k_mv(tets, kmu, klam, gidx_l, U, 0.0, 1.0), axis=0
                )
                q_m = jnp.sum(U * tr._m_mv(tets, mscale, gidx_l, U), axis=0)
                return res.eigenvalues, U, q_mu, q_lam, q_m

            return jax.vmap(one_pair)(mu_b, lam_b, eigvec_b)

        dp, ep = P("dp"), P("ep")
        shm = jax.shard_map(
            local, mesh=self.tr.mesh,
            in_specs=(dp, dp, dp, ep, ep, ep, ep, ep),
            out_specs=(dp, dp, dp, dp, dp),
        )

        @jax.jit
        def refresh(mu_b, lam_b, eigvec_b):
            return shm(
                mu_b, lam_b, eigvec_b, tr.e_tets, tr.e_kmu, tr.e_klam,
                tr.e_mscale, tr.e_gidx,
            )

        return refresh

    # -- the host assignment + LSQ step --------------------------------------

    def _lam_from_fd(self, fd):
        return lambda_from_damped_freq(fd, self.alpha, self.beta)

    def _fd_of(self, lam_el):
        d = 0.5 * (self.alpha + self.beta * lam_el)
        return np.sqrt(np.maximum(lam_el - d * d, 1e-12)) / (2 * np.pi)

    def fit(self, mu0_b, lam0_b, eigvec0_b, rounds: int = 12,
            verbose: bool = False):
        """mu0_b/lam0_b (B,) density-normalized Lame inits; eigvec0_b
        (B, n, k) initial bases (a single cold solve broadcast is fine —
        the first warm refresh adapts each pair).  Returns dict of
        per-pair E (B,), nu (B,), history."""
        if self._refresh is None:
            self._refresh = self._build_refresh()
        B = len(self.peaks_list)
        mu_b = jnp.asarray(mu0_b, jnp.float32)
        lam_b = jnp.asarray(lam0_b, jnp.float32)
        eigvec_b = eigvec0_b
        nr = self.tr.extra_modes
        hist = []
        for r in range(rounds):
            eigval_b, eigvec_b, qmu_b, qlam_b, qm_b = self._refresh(
                mu_b, lam_b, eigvec_b
            )
            lam0 = np.asarray(eigval_b, np.float64)
            qmu = np.asarray(qmu_b, np.float64)
            qlam = np.asarray(qlam_b, np.float64)
            qm = np.asarray(qm_b, np.float64)
            mu_h = np.asarray(mu_b, np.float64)
            lam_h = np.asarray(lam_b, np.float64)
            mu_new = np.zeros(B)
            lam_new = np.zeros(B)
            for b in range(B):
                lam_now = (lam0[b] + mu_h[b] * qmu[b] + lam_h[b] * qlam[b]
                           - lam0[b] * qm[b])[nr:]
                fd = self._fd_of(lam_now)
                if r == 0:
                    c = scale_align(fd, self.peaks_list[b], self.pw_list[b],
                                    self.sr, self.match_sigma)
                    mu_h[b] *= c
                    lam_h[b] *= c
                    fd = self._fd_of(lam_now * c)
                lam_tgt, w = assign_targets(
                    fd, self.peaks_list[b], self.pw_list[b], self.sr,
                    self.match_sigma, self._lam_from_fd,
                )
                mu_new[b], lam_new[b] = modal_lsq_fit(
                    lam0[b][nr:], qmu[b][nr:], qlam[b][nr:], qm[b][nr:],
                    lam_tgt, w,
                )
            hist.append(np.stack([mu_new, lam_new], axis=1))
            mu_b = jnp.asarray(mu_new, jnp.float32)
            lam_b = jnp.asarray(lam_new, jnp.float32)
            if verbose:
                E = [lame_to_E_nu(m, l)[0] for m, l in zip(mu_new, lam_new)]
                print(f"  batched fit round {r}: E[:4] "
                      f"{[f'{e:.3g}' for e in E[:4]]}")
        # settle on the median of the tail (f32 refresh jitter)
        tail = np.stack(hist[-min(4, len(hist)):], axis=0)  # (T, B, 2)
        mu_f = np.median(tail[..., 0], axis=0)
        lam_f = np.median(tail[..., 1], axis=0)
        E = np.zeros(B)
        nu = np.zeros(B)
        for b in range(B):
            e, n = lame_to_E_nu(float(mu_f[b]), float(lam_f[b]))
            E[b] = e * self.tr.bins.mat.density
            nu[b] = n
        return {"E": E, "nu": nu, "mu": mu_f, "lam": lam_f, "history": hist,
                "eigvec": eigvec_b}
