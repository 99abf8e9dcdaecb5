"""Compare peak-extraction schemes on the two flagship pairs that
conflict under round 3's window choice (BENCH_NOTES "near-Nyquist mode
crowding"): pair 6 needs whole-signal resolution (5 modes folded into a
1 kHz band), pair 1 broke under the whole-signal window because round
3's code zero-padded BEFORE windowing (half-Hann leakage skirts ->
spurious sidelobe peaks -> nu 0.035 -> 0.10).

Schemes: {Hann, Blackman-Harris} x {framed 4096, whole-signal}.  Fit-only
modal-Newton (no audio polish), E / nu error vs the pair's target.

Run: JAX_PLATFORMS=cpu python benchmarks/diagnostics/window_arbitration.py [pair ...]
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import numpy as np


SCHEMES = [
    ("hann_4096", dict(n_fft=4096, window="hann")),      # round-3 default
    ("bh_4096", dict(n_fft=4096, window="blackmanharris")),
    ("hann_full", dict(n_fft=None, window="hann")),
    ("bh_full", dict(n_fft=None, window="blackmanharris")),
]


def main():
    import jax

    from diffsound_tpu.audio.freq_loss import extract_spectral_peaks
    from diffsound_tpu.experiments.material_sync import (
        MaterialSyncTask, random_material_pairs,
    )
    from diffsound_tpu.fem.material import lame_params
    from diffsound_tpu.fem.mesh import TetMesh
    from diffsound_tpu.models.modal_fit import ModalNewtonFitter
    from diffsound_tpu.models.sound_obj import build_model

    pair_ids = [int(a) for a in sys.argv[1:]] or [1, 6]
    mesh = TetMesh.from_file("/root/reference/data/mesh/bowl/bowl.obj_.msh")
    task = MaterialSyncTask(mesh=mesh)
    pairs = random_material_pairs(jax.random.PRNGKey(0), 16)

    for pid in pair_ids:
        init_mat, gt_mat = pairs[pid]
        t0 = time.perf_counter()
        gt_audio, gt_freqs = task.make_gt(gt_mat)
        print(f"# pair {pid}: gt in {time.perf_counter()-t0:.0f}s  "
              f"E* {gt_mat[1]:.4g} nu* {gt_mat[2]:.4f}", flush=True)

        model = build_model(
            mesh=mesh, mode_num=task.mode_num, order=task.mesh_order,
            mat=init_mat, task=task.task, dtype=task.dtype,
        )
        mu0, lam0 = lame_params(init_mat[1] / init_mat[0], init_mat[2])
        eig = None
        for name, kw in SCHEMES:
            pk, pw = extract_spectral_peaks(
                np.asarray(gt_audio), task.sample_rate, **kw
            )
            t0 = time.perf_counter()
            fitter = ModalNewtonFitter(
                model, pk, pw, task.sample_rate, init_mat[3], init_mat[4]
            )
            fit = fitter.fit(float(mu0), float(lam0), rounds=20, eig=eig)
            eig = fit["eig"]
            rec = {
                "pair": pid, "scheme": name, "n_peaks": len(pk),
                "E": fit["E"], "nu": fit["nu"],
                "E_relerr": abs(fit["E"] - gt_mat[1]) / gt_mat[1],
                "nu_abserr": abs(fit["nu"] - gt_mat[2]),
                "match_w": fit["history"][-1]["match_w"],
                "dt_s": round(time.perf_counter() - t0, 1),
            }
            print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
