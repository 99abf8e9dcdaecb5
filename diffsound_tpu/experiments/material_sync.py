"""Synthetic-material inference: recover (E, nu) from modal audio.

Behavioral parity with /root/reference/experiments/material_sync_train.py:
16 random (init, target) material pairs; ground-truth audio synthesized by
an order-2 fixed-material model + fixed-table oscillator; the trainable
model optimizes its material bins so its synthesized audio matches, with
an early Sinkhorn-OT loss phase (epochs < early_loss_epoch) switching to
multi-scale L1, Adam + step-decayed LR (reset at the switch), and an
eigensolve refresh every 15 epochs (warm-started LOBPCG here instead of
the reference's CPU ARPACK round trip).

exp_mode: 0 ord1/frozen-nu (baseline), 1 ord2/frozen-nu, 2 ord1/learn-nu,
3 ord2/learn-nu (full DiffSound).

Run: python -m diffsound_tpu.experiments.material_sync --config configs/material_sync_train.json
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..audio.mss_loss import MSSLoss
from ..audio.oscillator import TraditionalOscillatorParams
from ..fem.material import Material, MatSet
from ..fem.mesh import TetMesh
from ..models.sound_obj import DiffSoundObject, build_model
from ..utils.logging import MetricLogger

EIGEN_DECOMPOSE_CYCLE = 15


def impulse_forces(audio_num: int, force_frame_num: int, dtype=jnp.float32):
    f = jnp.zeros((audio_num, force_frame_num), dtype)
    return f.at[:, 0].set(1.0)


@dataclass
class MaterialSyncTask:
    mesh: TetMesh
    mode_num: int = 16
    sample_rate: float = 32000.0
    frame_num: int = 8000
    force_frame_num: int = 150
    exp_mode: int = 3
    dtype: object = jnp.float32
    solver: str = "auto"

    def __post_init__(self):
        self.mesh_order = 2 if self.exp_mode in (1, 3) else 1
        self.task = "material" if self.exp_mode in (2, 3) else "mat_baseline"

    # -- ground truth -------------------------------------------------------

    def _dump_media(self, media_dir, epoch, model, osc, params, cache,
                    gt_audio, forces, logger=None, n_fft: int = 512):
        """Per-log-cycle observability: side-by-side log-spectrogram
        figure + predicted/gt wav files (parity:
        /root/reference/experiments/material_sync_train.py:187-202)."""
        import os

        import numpy as np

        from ..audio.stft import spectrogram
        from ..audio.io import write_wav
        from ..utils.visualize import save_spec_figure

        os.makedirs(media_dir, exist_ok=True)
        freqs = model.get_undamped_freqs_cached(params, cache)
        sig, _ = osc(freqs, forces, dtype=self.dtype)
        pred = np.asarray(sig[0])
        gt = np.asarray(gt_audio[0])
        sp = np.log(np.asarray(spectrogram(jnp.asarray(pred), n_fft, n_fft // 4)) + 1e-7)
        sg = np.log(np.asarray(spectrogram(jnp.asarray(gt), n_fft, n_fft // 4)) + 1e-7)
        fig_path = os.path.join(media_dir, f"spec_{epoch:06d}.png")
        save_spec_figure(fig_path, sg, sp)
        scale = max(np.abs(pred).max(), np.abs(gt).max(), 1e-9)
        write_wav(os.path.join(media_dir, f"pred_{epoch:06d}.wav"),
                  pred / scale, int(self.sample_rate))
        if epoch == 0:
            write_wav(os.path.join(media_dir, "gt.wav"), gt / scale,
                      int(self.sample_rate))
        if logger is not None and hasattr(logger, "figure"):
            logger.figure("spec", fig_path, epoch)

    def make_gt(self, gt_mat) -> tuple:
        """Ground-truth audio from an order-2 fixed-material model
        (material_sync_train.py:103-115)."""
        gt_model = build_model(
            mesh=self.mesh, mode_num=self.mode_num, order=2, mat=gt_mat,
            task="gt", dtype=self.dtype,
        )
        eig = gt_model.eigen_decomposition(method=self.solver)
        freqs = gt_model.get_undamped_freqs({}, eig)
        gt_osc = TraditionalOscillatorParams(
            1, self.mode_num, self.frame_num, self.sample_rate, Material.of(gt_mat)
        )
        forces = impulse_forces(1, self.force_frame_num, self.dtype)
        gt_audio, _ = gt_osc(freqs, forces, dtype=self.dtype)
        return gt_audio, np.asarray(freqs)

    # -- training -----------------------------------------------------------

    def train(
        self,
        init_mat,
        gt_audio,
        max_epoch: int = 3000,
        early_loss_epoch: int = 1000,
        logger: MetricLogger = None,
        log_every: int = EIGEN_DECOMPOSE_CYCLE,
        seed: int = 0,
        pretrain: bool = True,
        verbose: bool = True,
        lr_early: float = 5e-3,
        lr_late: float = 2e-3,
        checkpoint_dir: str = None,
        checkpoint_every: int = 1500,
        media_dir: str = None,
        media_every: int = 300,
        early_loss_type: str = "freq_chamfer",
        late_freq_weight: float = 300.0,
        init_values=None,
    ) -> dict:
        """early_loss_type: 'freq_chamfer' (default; alias-aware spectral-
        peak matching — ripple-free, see audio/freq_loss.py) or 'geomloss'
        (the reference's Sinkhorn recipe, kept for behavioral parity).
        late_freq_weight: weight of the freq-chamfer auxiliary kept in the
        late L1 phase (freq_chamfer mode only; 0 disables) — it holds the
        modes pinned where the L1 landscape's leakage ripple would
        otherwise freeze Adam (round-2 high-E stall, benchmarks/diagnostics + results/r3/diag)."""
        model = build_model(
            mesh=self.mesh, mode_num=self.mode_num, order=self.mesh_order,
            mat=init_mat, task=self.task, dtype=self.dtype,
        )
        osc = TraditionalOscillatorParams(
            gt_audio.shape[0], self.mode_num, self.frame_num, self.sample_rate,
            Material.of(init_mat),
        )
        forces = impulse_forces(gt_audio.shape[0], self.force_frame_num, self.dtype)

        early_loss = MSSLoss([2048, 1024], self.sample_rate, loss_type="geomloss")
        late_loss = MSSLoss(
            [1024, 512, 256, 128, 64], self.sample_rate, loss_type="l1_loss"
        )
        rmse_loss = MSSLoss(
            [1024, 512, 256, 128, 64], self.sample_rate, loss_type="rmse_loss"
        )
        peaks = wts = None
        if early_loss_type == "freq_chamfer":
            from ..audio.freq_loss import extract_spectral_peaks

            pk, pw = extract_spectral_peaks(np.asarray(gt_audio), self.sample_rate)
            peaks, wts = jnp.asarray(pk, self.dtype), jnp.asarray(pw, self.dtype)

        params = model.init_params(
            jax.random.PRNGKey(seed), pretrain=pretrain and init_values is None
        )
        if init_values is not None:
            # start from explicit (E, nu) — e.g. the modal-Newton answer
            params = model.bins.fit_to(params, *init_values)

        def make_opt(lr, gamma):
            sched = optax.exponential_decay(
                lr, transition_steps=100, decay_rate=gamma, staircase=True
            )
            return optax.adam(sched)

        opt = make_opt(lr_early, 0.9)
        opt_state = opt.init(params)

        # gt/forces are jit *arguments*: as closure constants XLA would
        # constant-fold their spectrograms through the (glacial)
        # interpreting evaluator at compile time.  The target-side
        # spectrogram tensors are precomputed ONCE (XLA does not hoist
        # them out of the scanned step bodies past the FFT fusions) and
        # threaded through as a pytree jit argument.
        tc_early = (
            None if early_loss_type == "freq_chamfer"
            else jax.jit(early_loss.target_cache)(gt_audio)
        )
        tc_late = jax.jit(late_loss.target_cache)(gt_audio)
        tc_rmse = jax.jit(rmse_loss.target_cache)(gt_audio)

        def loss_with(loss_fn, params, cache, tc, fz):
            freqs = model.get_undamped_freqs_cached(params, cache)
            sig, damped = osc(freqs, fz, dtype=self.dtype)
            return loss_fn(sig, None, damped, 1.0, target_cache=tc)

        def chamfer_of(params, cache):
            from ..audio.freq_loss import freq_chamfer_loss

            freqs = model.get_undamped_freqs_cached(params, cache)
            return freq_chamfer_loss(freqs, peaks, wts, self.sample_rate)

        def early_loss_fn(params, cache, tc, fz):
            if early_loss_type == "freq_chamfer":
                # pure frequency matching: no synthesis, no STFT — smooth
                # and ~100x cheaper than the Sinkhorn recipe
                return chamfer_of(params, cache)
            return loss_with(early_loss, params, cache, tc, fz)

        def late_loss_fn(params, cache, tc, fz):
            l1 = loss_with(late_loss, params, cache, tc, fz)
            if early_loss_type == "freq_chamfer" and late_freq_weight > 0:
                return l1 + late_freq_weight * chamfer_of(params, cache)
            return l1

        opt2 = make_opt(lr_late, 0.95)

        def make_step(loss_call, optimizer):
            def step(params, opt_state, cache, gt, fz):
                loss, g = jax.value_and_grad(
                    lambda p: loss_call(p, cache, gt, fz)
                )(params)
                g = model.bins.mask_grads(g)
                updates, opt_state = optimizer.update(g, opt_state)
                return optax.apply_updates(params, updates), opt_state, loss

            # n steps in ONE device dispatch: the tunneled TPU pays
            # ~25 ms relay round trip per call, which dominates the
            # O(modes) cached step.  Scanning a whole refresh interval
            # amortizes that to one RTT per EIGEN_DECOMPOSE_CYCLE.
            def scanned(params, opt_state, cache, gt, fz, n):
                def body(carry, _):
                    p, o = carry
                    p, o, loss = step(p, o, cache, gt, fz)
                    return (p, o), loss

                (params, opt_state), losses = jax.lax.scan(
                    body, (params, opt_state), None, length=n
                )
                return params, opt_state, losses

            return jax.jit(scanned, static_argnums=5)

        step_early = make_step(early_loss_fn, opt)
        step_late = make_step(late_loss_fn, opt2)

        rmse_eval = jax.jit(
            lambda p, cache, gt, fz: loss_with(rmse_loss, p, cache, gt, fz)
        )

        ckpt = None
        start_epoch = 0
        if checkpoint_dir is not None:
            from ..utils.checkpoint import TrainCheckpointer

            ckpt = TrainCheckpointer(checkpoint_dir, every=checkpoint_every)
            restored = ckpt.restore(params, opt_state)
            if restored is not None:
                params, opt_state, start_epoch = restored
                print(f"resumed from checkpoint at epoch {start_epoch}")

        eig = None
        cache = None
        history = []
        t_start = time.perf_counter()

        def next_boundary(e):
            """First epoch > e where host work is due (refresh / phase
            switch / logging / checkpoint / end) — everything between runs
            as one scanned device dispatch."""
            cands = [max_epoch]
            for period in (EIGEN_DECOMPOSE_CYCLE, log_every):
                cands.append((e // period + 1) * period)
            if ckpt is not None:
                cands.append((e // checkpoint_every + 1) * checkpoint_every)
            if e < early_loss_epoch:
                cands.append(early_loss_epoch)
            return min(c for c in cands if c > e)

        epoch = start_epoch
        while epoch < max_epoch:
            if epoch % EIGEN_DECOMPOSE_CYCLE == 0 or eig is None:
                if eig is not None and self.solver != "arpack":
                    # warm path: solve + cache fused into one dispatch
                    eig, cache = model.refresh(params, eig)
                else:
                    eig = model.eigen_decomposition(
                        params, prev=eig, method=self.solver
                    )
                    cache = model.modal_cache(eig)
            if epoch == early_loss_epoch:
                opt_state = opt2.init(params)
            log_this = epoch % log_every == 0  # same epochs the per-step
            log_epoch = epoch  # loop logged; its loss is losses[0]
            n = next_boundary(epoch) - epoch
            step_fn = step_early if epoch < early_loss_epoch else step_late
            tc = tc_early if epoch < early_loss_epoch else tc_late
            params, opt_state, losses = step_fn(
                params, opt_state, cache, tc, forces, n
            )
            epoch += n

            if ckpt is not None:
                # `epoch` is now the count of completed epochs (chunk ends
                # are aligned to checkpoint_every); a restore resumes at
                # exactly this epoch with no step re-run.
                ckpt.maybe_save(epoch, params, opt_state)
            if log_this:
                loss = losses[0]
                youngs = float(model.bins.youngs(params))
                poisson = float(model.bins.poisson(params))
                rmse = float(rmse_eval(params, cache, tc_rmse, forces))
                rec = {
                    "loss": float(loss), "rmse": rmse, "youngs": youngs,
                    "poisson": poisson, "epoch": log_epoch,
                }
                history.append(rec)
                if logger:
                    logger.scalars(
                        {k: v for k, v in rec.items() if k != "epoch"},
                        log_epoch,
                    )
                if verbose:
                    print(
                        f"epoch {log_epoch}: loss {float(loss):.5f} "
                        f"rmse {rmse:.4f} E {youngs:.4g} nu {poisson:.4f}"
                    )
                if media_dir is not None and log_epoch % media_every == 0:
                    # spectrogram figure + audio dump per log cycle
                    # (parity: material_sync_train.py:187-202)
                    self._dump_media(
                        media_dir, log_epoch, model, osc, params, cache,
                        gt_audio, forces, logger,
                    )
        wall = time.perf_counter() - t_start

        return {
            "params": params,
            "youngs": float(model.bins.youngs(params)),
            "poisson": float(model.bins.poisson(params)),
            "rmse": float(rmse_eval(params, cache, tc_rmse, forces)),
            "history": history,
            "wall_s": wall,
            "iters_per_sec": max_epoch / wall,
        }


    def train_newton(
        self,
        init_mat,
        gt_audio,
        rounds: int = 20,
        polish_epochs: int = 300,
        logger: MetricLogger = None,
        seed: int = 0,
        verbose: bool = True,
        extraction_windows=(("hann", 4096), ("blackmanharris", 4096),
                            ("blackmanharris", None)),
        **train_kw,
    ) -> dict:
        """Closed-form modal-Newton material fit (models/modal_fit.py)
        followed by an optional short audio-loss polish.

        Orders of magnitude faster than the epoch recipe (each Newton
        round costs one warm eigensolve) and immune to the spectral-
        leakage ripple that froze round 2's high-E pairs; see
        benchmarks/diagnostics + results/r3/diag and BENCH_NOTES.

        extraction_windows: peak-extraction scheme candidates, each a
        (window, n_fft) pair (n_fft None = one whole-signal window; a
        bare int means Blackman-Harris at that n_fft).  Every scheme's
        peak set is fit independently (cheap: the candidates share the
        warm eigenbasis) and the tight-tolerance UNION-COVERAGE score
        (audio.freq_loss.peak_coverage_score against the merged peak set
        of all schemes) arbitrates.  No single scheme works for all 16
        flagship pairs (measured, benchmarks/diagnostics/
        window_arbitration.py): the whole-signal window resolves pair
        6's near-Nyquist crowding (nu 0.058 -> 0.013) but misassigns
        pair 1; Blackman-Harris at 4096 fixes pairs 1 and 6 but finds
        only ~5 peaks on pairs 3/4 and locks 5x off in E; Hann at 4096
        is near-exact on 3/4 and weak on 6.  Two scores CANNOT
        arbitrate (measured, benchmarks/diagnostics/arbitration_check
        .py): the fit's own match weight is normalized per peak set
        (the catastrophic pair-3 bh fit scored HIGHEST), and the smooth
        cross-view chamfer near-ties exact vs nu-0.06-off fits (0.0552
        vs 0.0512, wrong side).  Coverage at 0.5% log-tolerance
        separates them decisively: a correct synthetic fit lands every
        real peak at <1e-3 while a wrong-basin fit misses whole peaks
        by >1e-2."""
        import time as _time

        from ..audio.freq_loss import (
            extract_spectral_peaks, peak_coverage_score, union_peaks,
        )
        from ..fem.material import lame_params
        from ..models.modal_fit import ModalNewtonFitter
        from ..solvers.diff_eigs import undamped_frequencies

        t0 = _time.perf_counter()
        model = build_model(
            mesh=self.mesh, mode_num=self.mode_num, order=self.mesh_order,
            mat=init_mat, task=self.task, dtype=self.dtype,
        )
        mu0, lam0 = lame_params(init_mat[1] / init_mat[0], init_mat[2])

        schemes = [
            ("blackmanharris", w) if not isinstance(w, (tuple, list)) else tuple(w)
            for w in extraction_windows
        ]
        peak_sets = [
            extract_spectral_peaks(
                np.asarray(gt_audio), self.sample_rate, n_fft=nfft, window=win
            )
            for win, nfft in schemes
        ]
        union_f, union_w = union_peaks(peak_sets)
        fit = None
        eig_carry = None
        for (win, nfft), (peaks, wts) in zip(schemes, peak_sets):
            fitter = ModalNewtonFitter(
                model, peaks, wts, self.sample_rate, init_mat[3], init_mat[4]
            )
            cand = fitter.fit(float(mu0), float(lam0), rounds=rounds,
                              verbose=verbose, eig=eig_carry)
            eig_carry = cand["eig"]  # warm-start the next candidate
            cache = model.modal_cache(cand["eig"])
            lams = (
                jnp.asarray(cache.eigenvalues)
                + cand["mu"] * cache.q_mu + cand["lam"] * cache.q_lam
                - jnp.asarray(cache.eigenvalues) * cache.q_m
            )[model.extra_modes:]
            freqs = np.asarray(undamped_frequencies(lams.astype(jnp.float32)))
            cand["score"] = peak_coverage_score(
                freqs, union_f, union_w, self.sample_rate
            )
            if verbose:
                print(f"  window {win}@{nfft}: E {cand['E']:.4g} nu "
                      f"{cand['nu']:.4f} union coverage "
                      f"{cand['score']:.4f}")
            if fit is None or cand["score"] > fit["score"]:
                fit = cand
        fit_wall = _time.perf_counter() - t0
        if logger:
            for rec in fit["history"]:
                logger.scalars(
                    {"newton_E": rec["E"], "newton_nu": rec["nu"]},
                    rec["round"],
                )
        if polish_epochs <= 0:
            return {
                "youngs": fit["E"], "poisson": fit["nu"],
                "rmse": float("nan"), "history": fit["history"],
                "wall_s": fit_wall,
                "iters_per_sec": len(fit["history"]) / fit_wall,
                "fit_rounds": len(fit["history"]),
            }
        res = self.train(
            init_mat, gt_audio, max_epoch=polish_epochs,
            early_loss_epoch=0, logger=logger, seed=seed, verbose=verbose,
            init_values=(fit["E"], fit["nu"]), pretrain=False,
            **train_kw,
        )
        res["fit_rounds"] = len(fit["history"])
        res["newton_E"], res["newton_nu"] = fit["E"], fit["nu"]
        res["wall_s"] += fit_wall
        res["iters_per_sec"] = polish_epochs / res["wall_s"]
        return res


def random_material_pairs(key, n: int = 16):
    """n random (init, target) materials within [RandomMin, RandomMax]
    (material_sync_train.py:72-89)."""
    lo, hi = MatSet.RandomMin, MatSet.RandomMax
    ks = jax.random.split(key, 4)
    draw = lambda k, a, b: np.asarray(jax.random.uniform(k, (n,)) * (b - a) + a)
    init_y, tgt_y = draw(ks[0], lo[1], hi[1]), draw(ks[1], lo[1], hi[1])
    init_p, tgt_p = draw(ks[2], lo[2], hi[2]), draw(ks[3], lo[2], hi[2])
    base = list(lo)
    pairs = []
    for i in range(n):
        init = base.copy()
        tgt = base.copy()
        init[1], init[2] = float(init_y[i]), float(init_p[i])
        tgt[1], tgt[2] = float(tgt_y[i]), float(tgt_p[i])
        pairs.append((tuple(init), tuple(tgt)))
    return pairs


def train_pairs_parallel(task: MaterialSyncTask, pairs, flags, logger):
    """Train all material pairs simultaneously on a (dp, ep) device mesh
    (the reference runs them serially; see parallel/train.py)."""
    from ..parallel.mesh import make_device_mesh
    from ..parallel.train import MultipairTrainer

    n_dev = len(jax.devices())
    ep = 2 if n_dev >= 4 else 1
    dp = max(n_dev // ep, 1)
    dmesh = make_device_mesh(dp=dp, ep=ep)
    B = len(pairs)

    init_mat = pairs[0][0]
    model = build_model(
        mesh=task.mesh, mode_num=task.mode_num, order=task.mesh_order,
        mat=init_mat, task=task.task, dtype=task.dtype,
    )
    osc = TraditionalOscillatorParams(
        1, task.mode_num, task.frame_num, task.sample_rate, Material.of(init_mat)
    )
    forces = impulse_forces(1, task.force_frame_num, task.dtype)
    trainer = MultipairTrainer(
        bins=model.bins, ops=model.ops, osc=osc, mesh=dmesh, forces=forces,
        sample_rate=task.sample_rate, lr=2e-3,
    )

    gt_audios = []
    for _, gt_mat in pairs:
        gt_audio, _ = task.make_gt(gt_mat)
        gt_audios.append(gt_audio)
    gt_b = jnp.stack(gt_audios)

    eig0 = model.eigen_decomposition(method="arpack")
    eigval_b = jnp.stack([eig0.eigenvalues.astype(task.dtype)] * B)
    eigvec_b = jnp.stack([eig0.eigenvectors.astype(task.dtype)] * B)
    params_b, opt_b = trainer.init(jax.random.PRNGKey(0), B)

    t0 = time.perf_counter()
    for epoch in range(flags.max_epoch):
        params_b, opt_b, loss_b, eigval_b, eigvec_b = trainer.step(
            params_b, opt_b, eigval_b, eigvec_b, gt_b,
            refresh=(epoch % EIGEN_DECOMPOSE_CYCLE == 0 and epoch > 0),
        )
        if epoch % EIGEN_DECOMPOSE_CYCLE == 0:
            losses = np.asarray(loss_b)
            E_b = np.asarray(jax.vmap(model.bins.youngs)(params_b))
            logger.scalars(
                {f"loss_pair{i}": float(l) for i, l in enumerate(losses)}, epoch
            )
            print(f"epoch {epoch}: losses {losses.round(3).tolist()[:4]}... "
                  f"E[:4] {E_b[:4].tolist()}")
    wall = time.perf_counter() - t0
    E_b = np.asarray(jax.vmap(model.bins.youngs)(params_b))
    nu_b = np.asarray(jax.vmap(model.bins.poisson)(params_b))
    return {
        "youngs": E_b, "poisson": nu_b,
        "pair_iters_per_sec": flags.max_epoch * B / wall,
    }


def main(argv=None):
    from ..config import parse_flags

    flags = parse_flags(
        "material_sync (diffsound-tpu)", defaults={"parallel": False}, argv=argv
    )
    os.makedirs(flags.out_dir, exist_ok=True)

    mesh_path = flags.mesh_dir
    if mesh_path.endswith(".obj"):
        mesh = TetMesh.from_triangle_mesh(mesh_path)
    else:
        mesh = TetMesh.from_file(mesh_path)

    task = MaterialSyncTask(
        mesh=mesh,
        mode_num=flags.mode_num,
        sample_rate=flags.sample_rate,
        frame_num=flags.frame_num,
        force_frame_num=flags.force_frame_num,
        exp_mode=flags.exp_mode,
    )

    num_pairs = getattr(flags, "num_material_pairs", 16)
    pairs = random_material_pairs(jax.random.PRNGKey(0), num_pairs)
    logger = MetricLogger(flags.out_dir)
    results_path = os.path.join(flags.out_dir, "result.txt")

    if getattr(flags, "parallel", False):
        res = train_pairs_parallel(task, pairs, flags, logger)
        with open(results_path, "a") as f:
            for i, (init_mat, gt_mat) in enumerate(pairs):
                f.write(
                    f"material:{i}\nyoungs:{res['youngs'][i]}\n"
                    f"poisson:{res['poisson'][i]}\n"
                    f"target youngs:{gt_mat[1]}\ntarget poisson:{gt_mat[2]}\n"
                )
            f.write(f"pair_iters_per_sec:{res['pair_iters_per_sec']:.3f}\n")
        print(f"parallel run: {res['pair_iters_per_sec']:.2f} pair-iters/s")
        return
    # Resumability across pairs: completed pairs already sit in result.txt
    # (one "material:<i>" line each); skip them so a restarted run continues
    # where it left off, and checkpoint mid-pair progress.
    done_pairs = 0
    if os.path.exists(results_path):
        with open(results_path) as f:
            done_pairs = sum(1 for line in f if line.startswith("material:"))
        if done_pairs:
            print(f"result.txt already has {done_pairs} pairs; resuming after them")
    for i, (init_mat, gt_mat) in enumerate(pairs):
        if i < done_pairs:
            continue
        print(f"material pair {i}: target E={gt_mat[1]:.4g} nu={gt_mat[2]:.4f} "
              f"init E={init_mat[1]:.4g} nu={init_mat[2]:.4f}")
        gt_audio, gt_freqs = task.make_gt(gt_mat)
        recipe = getattr(flags, "recipe", "newton")
        if recipe == "newton":
            res = task.train_newton(
                init_mat, gt_audio,
                rounds=getattr(flags, "newton_rounds", 20),
                polish_epochs=getattr(flags, "polish_epochs", 300),
                logger=logger, seed=i,
                media_dir=os.path.join(flags.out_dir, f"media_pair{i}"),
            )
        else:
            res = task.train(
                init_mat, gt_audio,
                max_epoch=flags.max_epoch,
                early_loss_epoch=flags.early_loss_epoch,
                logger=logger,
                seed=i,
                checkpoint_dir=os.path.join(flags.out_dir, f"ckpt_pair{i}"),
                checkpoint_every=300,
                media_dir=os.path.join(flags.out_dir, f"media_pair{i}"),
                early_loss_type=getattr(
                    flags, "early_loss_type",
                    "geomloss" if recipe == "reference" else "freq_chamfer",
                ),
                late_freq_weight=getattr(
                    flags, "late_freq_weight",
                    0.0 if recipe == "reference" else 300.0,
                ),
            )
        with open(results_path, "a") as f:
            f.write(
                f"material:{i}\nyoungs:{res['youngs']}\npoisson:{res['poisson']}\n"
                f"target youngs:{gt_mat[1]}\ntarget poisson:{gt_mat[2]}\n"
                f"RMSE:{res['rmse']}\niters_per_sec:{res['iters_per_sec']:.3f}\n"
                f"wall_s:{res.get('wall_s', float('nan')):.1f}\n"
            )
        print(f"  -> recovered E={res['youngs']:.4g} nu={res['poisson']:.4f} "
              f"({res['iters_per_sec']:.2f} it/s, {res.get('wall_s', 0):.0f}s)")


if __name__ == "__main__":
    main()
