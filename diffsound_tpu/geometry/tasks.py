"""Shape inference tasks over marching tets: thickness and morphing.

Parity targets:
  * thickness (/root/reference/src/dmtet/geometry/dmtet_thickness.py +
    experiments/thickness_train.py): infer a shell-thickness scalar
    (WeightedParam over 32 linear bins scaled by max(sdf)) so that the
    hollow mesh's corrected modal eigenvalues match a target; eigensolve
    inside the optimization loop every iteration.
  * morphing (dmtet_interpolate.py + experiments/morphing_train.py):
    infer the interpolation coefficient c of sdf = c sdf1 + (1-c) sdf2.

TPU structure: per iteration the current (detached) geometry is marched +
compacted on the host into bucket-padded static shapes, the eigenpairs
come from the host shift-invert solver (parity with the reference's
every-iteration ARPACK), and one jitted program computes the
Rayleigh-corrected eigenvalue loss and its gradient w.r.t. the shape
scalar through the marching-tets vertex interpolation and the element
operators.  Bucketing bounds the number of jit specializations.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..audio.oscillator import weighted_value
from ..fem import assembly
from ..fem.material import Material, lame_params
from ..solvers.arpack import eigsh_shift_invert
from ..solvers.diff_eigs import ritz_refined_eigenvalues
from .dmtet import MarchingTets
from .grid import load_background_grid
from .sdf_host import mesh_signed_distance


class ShapeTaskBase:
    """Shared marching/compaction/eigensolve machinery."""

    def __init__(
        self,
        grid_res: int,
        scale: float,
        mat,
        mode_num: int = 32,
        order: int = 1,
        dtype=None,
        sigma: float = 20000.0,
        extra_modes: int = 6,
        tets_dir: Optional[str] = None,
        eig_method: str = "warm",
        reanchor_every: int = 0,
        refresh_every: int = 1,
    ):
        """refresh_every: true eigensolve cadence.  1 = solve every step
        (the reference re-solves every iteration, thickness_train.py:
        42-90); N > 1 maps the detached basis across remeshes in between
        (Rayleigh-correction exactness is first order in the drift —
        the reference's own material_sync amortization applied here)."""
        kw = {} if tets_dir is None else {"tets_dir": tets_dir}
        verts, tets = load_background_grid(grid_res, **kw)
        self.grid_verts = verts.astype(np.float64) * scale
        self.marching = MarchingTets(self.grid_verts, tets)
        # numpy -> CPU directly (jnp.asarray would hop via the TPU;
        # see geometry/dmtet.py MarchingTets.__init__)
        self.pos = jax.device_put(self.grid_verts, jax.devices("cpu")[0])
        self.mat = Material.of(mat)
        self.mode_num = mode_num
        self.order = order
        if dtype is None:
            # f64 differentiable pass on CPU; f32 on TPU (f64 emulation
            # there is unusably slow)
            dtype = jnp.float64 if jax.default_backend() == "cpu" else jnp.float32
        self.dtype = dtype
        self.sigma = sigma
        self.extra_modes = extra_modes
        self._loss_cache = {}
        if order != 1:
            raise NotImplementedError("shape tasks run order-1 (parity: thickness_train.py:106)")
        if eig_method == "warm":
            from .warm_eigs import WarmShapeEigensolver

            self.warm = WarmShapeEigensolver(
                self.marching.num_grid_verts + self.marching.num_edges,
                mode_num + extra_modes,
                dtype=jnp.float32 if jax.default_backend() != "cpu" else self.dtype,
                reanchor_every=reanchor_every,
            )
        else:
            self.warm = None
        self.refresh_every = refresh_every
        self._steps_since_refresh = 0

    # material (density-normalized)
    def _lame(self):
        return lame_params(self.mat.youngs / self.mat.density, self.mat.poisson)

    def _march(self, sdf, thickness):
        return self.marching(self.pos, sdf, thickness)

    def _eigensolve_host(self, out, comp):
        """ARPACK on the compacted geometry; returns padded (lam, U).
        Pinned to the host CPU device: this is f64 preprocessing for the
        sparse solver and must never hit TPU f64 emulation."""
        verts_c = np.asarray(out.all_verts)[comp["keep_idx"]]
        with jax.default_device(jax.devices("cpu")[0]):
            ops = assembly.build_element_ops(
                jnp.asarray(verts_c),
                jnp.asarray(comp["tets"]),
                1,
                dtype=jnp.float64,
                tet_mask=jnp.asarray(comp["tet_mask"], jnp.float64),
            )
        mu, lam = self._lame()
        K, M = assembly.assemble_scipy(ops, mu, lam, 1.0)
        n_real = 3 * comp["num_verts"]
        K = K[:n_real, :n_real]
        M = M[:n_real, :n_real]
        k = self.mode_num + self.extra_modes
        vals, vecs = eigsh_shift_invert(K, M, k=k, sigma=self.sigma)
        U = np.zeros((3 * len(comp["keep_idx"]), k))
        U[:n_real] = vecs
        return vals, U

    def _eigensolve(self, out, comp):
        """Training-loop eigensolve: device warm path when enabled (cold
        falls back to host ARPACK inside the warm solver); on the
        refresh_every cadence, off-cadence steps only MAP the stored
        basis across the remesh (see WarmShapeEigensolver.map_only)."""
        if self.warm is None:
            return self._eigensolve_host(out, comp)
        if (
            self.refresh_every > 1
            and self._steps_since_refresh + 1 < self.refresh_every
        ):
            mapped = self.warm.map_only(out, comp)
            if mapped is not None:
                self._steps_since_refresh += 1
                return mapped
        self._steps_since_refresh = 0
        mu, lam = self._lame()
        return self.warm.solve(
            out, comp, float(mu), float(lam),
            host_solve=lambda: self._eigensolve_host(out, comp),
        )

    def _loss_fn_for_shapes(self, vpad, tpad, loss_core):
        key = (vpad, tpad)
        if key not in self._loss_cache:
            self._loss_cache[key] = jax.jit(loss_core)
        return self._loss_cache[key]

    # -- scalar-coefficient Gauss-Newton ------------------------------------

    def _march_coef(self, c):
        """Marching output as a differentiable function of the task's
        scalar coefficient (thickness coef / morphing coef)."""
        raise NotImplementedError

    def _vals_of_coef(self, c, keep_idx, tets_c, tet_mask, U):
        """Ritz-refined eigenvalues as a differentiable function of the
        scalar coefficient (shared body of the jitted programs)."""
        out = self._march_coef(c)
        verts_c = out.all_verts[keep_idx]
        ops = assembly.build_element_ops(
            verts_c, tets_c, 1, dtype=self.dtype, tet_mask=tet_mask
        )
        mu, lame_l = self._lame()
        return ritz_refined_eigenvalues(
            lambda x: assembly.k_matvec(ops, x, mu, lame_l),
            lambda x: assembly.m_matvec(ops, x, 1.0),
            U,
        )[self.extra_modes :]

    def _coef_vals(self, c: float, comp, U):
        """Values only — one jitted program per shape bucket (landscape
        diagnostics and loss evaluation)."""
        key = ("vals", len(comp["keep_idx"]), comp["tets"].shape[0])
        if key not in self._loss_cache:
            self._loss_cache[key] = jax.jit(self._vals_of_coef)
        vals = self._loss_cache[key](
            jnp.asarray(c, self.dtype),
            jnp.asarray(comp["keep_idx"]),
            jnp.asarray(comp["tets"]),
            jnp.asarray(comp["tet_mask"], self.dtype),
            jnp.asarray(U, self.dtype),
        )
        return np.asarray(vals, np.float64)

    def _coef_vals_jac(self, c: float, comp, U):
        """(vals(c), dvals/dc) by REVERSE-MODE autodiff of the Ritz-value
        program — batched VJP with a one-hot cotangent per mode.

        At the evaluation point the analytic derivative of the frozen-
        basis Ritz program IS the exact eigenvalue derivative
        (Hellmann-Feynman: dtheta_i = y_i^T (dK - theta_i dM) y_i), so
        autodiff matches the true frozen-topology slope to solver
        precision.  Central DIFFERENCES of the same program do NOT: the
        frozen basis carries an O((h dU/dc)^2) curvature error (measured
        5e-3 relative at h = 2e-4 against re-solved eigenvalues, with
        |dvert/dc| ~ 16 on the grid-32 shell), which contaminated the FD
        slope ~1.6x high — benchmarks/diagnostics/thickness_sign_probe
        .py.  Round 3's autodiff-is-noise diagnosis was itself an
        artifact of two real bugs since fixed: the degenerate-padded-tet
        NaN guard (fem.assembly.inv3x3) and bf16 MXU Gram products in
        ritz_refined_eigenvalues (now precise_matmul, with split-
        precision custom-VJP adjoints in fem.precision)."""
        key = ("jac", len(comp["keep_idx"]), comp["tets"].shape[0])
        if key not in self._loss_cache:

            def core(c, keep_idx, tets_c, tet_mask, U):
                vals, vjp = jax.vjp(
                    lambda cc: self._vals_of_coef(
                        cc, keep_idx, tets_c, tet_mask, U
                    ),
                    c,
                )
                eye = jnp.eye(vals.shape[0], dtype=vals.dtype)
                # chunked cotangent batch: a full vmap over all k modes
                # materializes the per-element VJP residuals k-fold —
                # f32[32, 86016, 12, 38] tiled to 22.5 GB on the grid-64
                # frog, over the v5e's 16 GB HBM.  lax.map(batch_size=4)
                # keeps the same program 8x smaller at ~zero cost (the
                # backward pass is bandwidth-bound either way).
                dvals = jax.lax.map(
                    lambda ct: vjp(ct)[0], eye, batch_size=4
                )
                return vals, dvals

            self._loss_cache[key] = jax.jit(core)
        vals, dvals = self._loss_cache[key](
            jnp.asarray(c, self.dtype),
            jnp.asarray(comp["keep_idx"]),
            jnp.asarray(comp["tets"]),
            jnp.asarray(comp["tet_mask"], self.dtype),
            jnp.asarray(U, self.dtype),
        )
        return np.asarray(vals, np.float64), np.asarray(dvals, np.float64)

    def _true_loss(self, c: float, target) -> float:
        """Full march + eigensolve + Ritz values at c — the trustworthy
        loss used by newton_optimize's stall probes.  Forces a TRUE
        eigensolve even under a refresh_every>1 cadence: a map_only probe
        would carry exactly the frozen-basis blindness the probe exists
        to bypass."""
        out = self._march_coef(jnp.asarray(float(c)))
        comp = MarchingTets.compact(out)
        self._steps_since_refresh = self.refresh_every
        lam, U = self._eigensolve(out, comp)
        vals = self._coef_vals(c, comp, U)
        r = (vals - target) / target
        return float(np.mean(r**2))

    def newton_optimize(self, target, iters: int = 40, c0: float = 0.5,
                        max_step: float = 0.08, c_bounds=(0.02, 0.98),
                        tol_dc: float = 5e-4, verbose: bool = True,
                        callback=None, loss_floor: float = 1e-4,
                        probe_step: float = 0.02):
        """Scalar Gauss-Newton on the eigenvalue-matching loss.

        The loss is mean(((vals(c) - target)/target)^2) — exactly a
        nonlinear least-squares in ONE variable, the same shape as the
        material problem that models/modal_fit.py solves in closed form.
        Each iteration: true eigensolve at c (warm device refresh), the
        exact reverse-mode Jacobian dvals/dc of the Ritz-value program
        (Hellmann-Feynman-exact with the refreshed basis, see
        _coef_vals_jac), and the exact 1-D Gauss-Newton step
        dc = -(J.r)/(J.J).  Converges in a handful of iterations where
        the reference's Adam-on-32-bins walk takes hundreds
        (thickness_train.py:42-90) — and, because every step re-solves,
        the loss sequence is trustworthy, so simple backtracking guards
        against corrupted steps.

        Stall rescue (round-4 morphing target 0.2 stopped at 0.26 with
        loss 0.048 right after a cap-hitting warm refresh,
        results/r4/morphing_newton_grid64.txt): a near-zero PROPOSED step
        at loss > loss_floor is not accepted as convergence outright —
        first, if the backing refresh left a suspect residual
        (_grad_suspect), the next solve is host re-anchored and the
        iteration retried; then the TRUE loss is probed at c +- probe_step
        (frozen-topology autodiff cannot see across marching-tets
        topology flips, so a Newton-stationary point can sit on a
        staircase tread while a neighboring tread is strictly better) and
        the walk continues from an improving probe.  Only when neither
        rescue finds descent does the stall count as converged.
        """
        import time as _time

        target = np.asarray(target, np.float64)
        c = float(c0)
        history = []
        best_loss, best_c = np.inf, c
        rescues = 0
        visited = set()
        for it in range(iters):
            visited.add(round(c, 9))
            t0 = _time.perf_counter()
            out = self._march_coef(jnp.asarray(float(c)))
            comp = MarchingTets.compact(out)
            lam, U = self._eigensolve(out, comp)
            vals, dvals = self._coef_vals_jac(c, comp, U)
            r = (vals - target) / target
            loss = float(np.mean(r**2))
            rec = {"iter": it, "loss": loss, "coef": c,
                   "dt": _time.perf_counter() - t0}
            if self.warm is not None:
                rec["eig_mode"] = self.warm.last_mode
                rec["eig_iters"] = self.warm.last_iterations
            if loss > 4.0 * best_loss + 1e-12:
                # a demonstrably bad step (noisy Jacobian / remesh jump):
                # retreat halfway toward the best-known point
                c_new = 0.5 * (c + best_c)
                rec["retreat"] = True
            else:
                if loss < best_loss:
                    best_loss, best_c = loss, c
                J = dvals / target
                dc = -float(J @ r) / max(float(J @ J), 1e-30)
                dc = float(np.clip(dc, -max_step, max_step))
                c_new = float(np.clip(c + dc, *c_bounds))
                rec["dc"] = dc
                if (round(c_new, 9) in visited
                        and abs(c_new - c) >= tol_dc):
                    # cycle break: a clipped step re-proposing a visited
                    # point oscillates across the minimum when the
                    # frozen-topology Jacobian under-reads the staircase
                    # slope (coarse grids) — bisect the hop instead
                    c_new = 0.5 * (c + c_new)
                    rec["bisect"] = True
            history.append(rec)
            if verbose:
                print(f"newton iter {it}: loss {loss:.6f} coef {c:.4f} "
                      f"-> {c_new:.4f} "
                      f"[{rec.get('eig_mode', '-')}/{rec.get('eig_iters', 0)} "
                      f"{rec['dt']:.1f}s]", flush=True)
            if callback:
                callback(it, loss, c)
            # converged: a tiny PROPOSED step from a point that is (or
            # ties) the best seen — a stalled/garbage step must not exit
            if (abs(c_new - c) < tol_dc and not rec.get("retreat")
                    and loss <= best_loss * 1.02):
                if loss > loss_floor and rescues < 3:
                    rescues += 1
                    if self._grad_suspect():
                        # the Jacobian behind this "stationary" verdict
                        # rode an unconverged refresh — re-anchor and redo
                        self.warm.request_anchor()
                        if verbose:
                            print(f"newton iter {it}: stalled at loss "
                                  f"{loss:.6f} on a suspect refresh "
                                  f"(resid {self.warm.last_resid:.2e}); "
                                  f"re-anchoring", flush=True)
                        continue
                    cand = [float(np.clip(c + s, *c_bounds))
                            for s in (probe_step, -probe_step)]
                    # a probe clipped onto c itself would re-solve the
                    # current point for nothing (bound-hugging walks)
                    probes = sorted({p for p in cand if abs(p - c) > 1e-9})
                    if not probes:
                        c = c_new
                        break
                    probe_losses = [self._true_loss(p, target) for p in probes]
                    j = int(np.argmin(probe_losses))
                    if verbose:
                        desc = " ".join(
                            f"{p:.4f}:{pl:.6f}"
                            for p, pl in zip(probes, probe_losses)
                        )
                        print(f"newton iter {it}: stationary at loss "
                              f"{loss:.6f}; probes {desc}", flush=True)
                    if probe_losses[j] < 0.98 * loss:
                        c = probes[j]
                        continue
                c = c_new
                break
            c = c_new
        else:
            # budget exhausted mid-walk: the final c is an UNEVALUATED
            # proposal (up to max_step away) and rugged coarse-grid
            # landscapes oscillate — return the argmin over the points
            # that were actually eigensolved
            if best_loss < np.inf:
                c = best_c
        return c, history

    def _grad_suspect(self):
        """True when the eigensolve refresh backing the current gradient
        did not actually converge (residual above the solver tolerance,
        but below the absolute-residual escalation bound that would have
        triggered a host re-solve).

        Measured on the grid-64 thickness run
        (results/r3/thickness_grid64_target0.3_run.txt + _landscape.txt):
        unconverged refreshes produce gradients that point UPHILL on an
        exactly-monotone landscape; one such step at iter ~10 reversed
        the trajectory and Adam's momentum then froze the bins at a
        stationary point of the parameterization.  Callers skip the
        optimizer update for these steps instead of consuming the
        gradient.  Gates on the measured residual, not the iteration
        count: a solve that converges exactly at the cap is fine, and an
        escalation round that recovers reports iterations >= cap while
        being perfectly converged (ADVICE round 3)."""
        return (
            self.warm is not None
            and self.warm.last_mode == "warm"
            and self.warm.last_resid > self.warm.tol
        )


@dataclass(frozen=True)
class CoefBins:
    """WeightedParam over linspace(0, 1, 32) — thickness / morphing coef."""

    num: int = 32

    def init_params(self, key, dtype=jnp.float64):
        return {
            "coef_logits": jax.random.uniform(key, (self.num,), dtype, -1.0, 1.0)
        }

    def value(self, params):
        vals = jnp.linspace(0.0, 1.0, self.num, dtype=params["coef_logits"].dtype)
        return weighted_value(params["coef_logits"], vals)

    def pretrain(self, params, target: float, steps: int = 3000, lr: float = 1e-1):
        """init_coef (dmtet_interpolate.py:366-375)."""
        opt = optax.adam(lr)

        @jax.jit
        def run(p):
            s = opt.init(p)

            def step(carry, _):
                p, s = carry
                g = jax.grad(lambda q: (self.value(q) - target) ** 2)(p)
                u, s = opt.update(g, s)
                return (optax.apply_updates(p, u), s), None

            (p, _), _ = jax.lax.scan(step, (p, s), None, length=steps)
            return p

        return run(params)


class ThicknessTask(ShapeTaskBase):
    """Shell-thickness inference from modal eigenvalues."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.bins = CoefBins(32)
        self.sdf = None
        self.max_thickness = None

    def apply_sdf(self, mesh_verts, mesh_faces):
        sd = mesh_signed_distance(self.grid_verts, mesh_verts, mesh_faces)
        self.sdf = jax.device_put(np.asarray(sd), jax.devices("cpu")[0])
        self.max_thickness = float(sd.max())

    def thickness_value(self, params):
        return self.bins.value(params) * self.max_thickness

    def _march_coef(self, c):
        return self._march(self.sdf, c * self.max_thickness)

    def eigenvalues(self, thickness_coef: float):
        """No-grad target eigenvalues at a given coefficient
        (dmtet_thickness.py:319-324)."""
        th = jnp.asarray(thickness_coef * self.max_thickness)
        out = self._march(self.sdf, th)
        comp = MarchingTets.compact(out)
        vals, _ = self._eigensolve_host(out, comp)
        return vals[self.extra_modes :]

    def step_loss_grad(self, params, target):
        """One iteration's (loss, grad w.r.t. bin logits): host march/
        compact/eigensolve at the current thickness, exact reverse-mode
        scalar derivative of the Ritz values (_coef_vals_jac), chained
        into the 32 bin logits by autodiff of the tiny bins.value."""
        c = float(self.bins.value(params))
        out = self._march_coef(jnp.asarray(c))
        comp = MarchingTets.compact(out)
        lam, U = self._eigensolve(out, comp)

        tgt = np.asarray(target, np.float64)
        vals, dvals = self._coef_vals_jac(c, comp, U)
        r = (vals - tgt) / tgt
        loss = float(np.mean(r**2))
        dldc = float(2.0 * np.mean(r * dvals / tgt))
        gc = jax.grad(self.bins.value)(params)
        g = jax.tree.map(lambda x: dldc * x, gc)
        return jnp.asarray(loss), g

    def optimize(self, target, iters: int = 500, lr: float = 2e-2, verbose=True,
                 callback=None):
        """Adam loop (thickness_train.py:42-90)."""
        import time as _time

        params = self.bins.init_params(jax.random.PRNGKey(0))
        opt = optax.adam(lr)
        opt_state = opt.init(params)
        history = []
        consec_skips = 0
        for it in range(iters):
            t0 = _time.perf_counter()
            loss, g = self.step_loss_grad(params, target)
            skipped = self._grad_suspect()
            if skipped:
                # bound consecutive skipped steps: a basis that stays in
                # the suspect band would otherwise burn the whole budget
                # paying full refreshes with zero updates (ADVICE r3) —
                # force a host re-anchor after 3 in a row
                consec_skips += 1
                if consec_skips >= 3 and self.warm is not None:
                    print(f"iter {it}: {consec_skips} consecutive suspect "
                          "refreshes - forcing host re-anchor", flush=True)
                    self.warm.request_anchor()
                    consec_skips = 0
            else:
                consec_skips = 0
                updates, opt_state = opt.update(g, opt_state)
                params = optax.apply_updates(params, updates)
            coef = float(self.bins.value(params))
            dt = _time.perf_counter() - t0
            rec = {"iter": it, "loss": float(loss), "coef": coef, "dt": dt,
                   "skipped": skipped}
            if self.warm is not None:
                rec["eig_mode"] = self.warm.last_mode
                rec["eig_iters"] = self.warm.last_iterations
            history.append(rec)
            if verbose and it % 10 == 0:
                extra = (
                    f" [{rec.get('eig_mode', '-')}/{rec.get('eig_iters', 0)} "
                    f"{dt:.1f}s]"
                )
                print(f"iter {it}: loss {float(loss):.6f} coef {coef:.4f}{extra}",
                      flush=True)
            if callback:
                callback(it, float(loss), coef)
        return params, history


class MorphingTask(ShapeTaskBase):
    """Morphing-coefficient inference: sdf = c sdf1 + (1-c) sdf2."""

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.bins = CoefBins(32)
        self.sdf1 = None
        self.sdf2 = None

    def apply_sdf2(self, verts1, faces1, verts2, faces2):
        cpu = jax.devices("cpu")[0]
        self.sdf1 = jax.device_put(
            jnp.asarray(mesh_signed_distance(self.grid_verts, verts1, faces1)), cpu
        )
        self.sdf2 = jax.device_put(
            jnp.asarray(mesh_signed_distance(self.grid_verts, verts2, faces2)), cpu
        )

    def blended_sdf(self, coef):
        return coef * self.sdf1 + (1.0 - coef) * self.sdf2

    def _march_coef(self, c):
        return self._march(self.blended_sdf(c), None)

    def eigenvalues(self, coef: float):
        out = self._march(self.blended_sdf(jnp.asarray(coef)), None)
        comp = MarchingTets.compact(out)
        vals, _ = self._eigensolve_host(out, comp)
        return vals[self.extra_modes :]

    def step_loss_grad(self, params, target):
        """Autodiff-chained (loss, grad) — see ThicknessTask.step_loss_grad."""
        c = float(self.bins.value(params))
        out = self._march_coef(jnp.asarray(c))
        comp = MarchingTets.compact(out)
        lam, U = self._eigensolve(out, comp)

        tgt = np.asarray(target, np.float64)
        vals, dvals = self._coef_vals_jac(c, comp, U)
        r = (vals - tgt) / tgt
        loss = float(np.mean(r**2))
        dldc = float(2.0 * np.mean(r * dvals / tgt))
        gc = jax.grad(self.bins.value)(params)
        g = jax.tree.map(lambda x: dldc * x, gc)
        return jnp.asarray(loss), g

    def optimize(self, target, iters: int = 10, lr: float = 2e-2, verbose=True,
                 init_coef: Optional[float] = None):
        params = self.bins.init_params(jax.random.PRNGKey(0))
        if init_coef is not None:
            params = self.bins.pretrain(params, init_coef)
        opt = optax.adam(lr)
        opt_state = opt.init(params)
        history = []
        for it in range(iters):
            loss, g = self.step_loss_grad(params, target)
            skipped = self._grad_suspect()
            if not skipped:
                updates, opt_state = opt.update(g, opt_state)
                params = optax.apply_updates(params, updates)
            coef = float(self.bins.value(params))
            history.append({"iter": it, "loss": float(loss), "coef": coef,
                            "skipped": skipped})
            if verbose:
                print(f"iter {it}: loss {float(loss):.6f} coef {coef:.4f}")
        return params, history
