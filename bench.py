"""Driver benchmark: material_sync ord=2 steady-state training throughput
on the reference bowl mesh (16 modes, 8000 samples @32kHz, eigensolve
refresh every 15 epochs) — the reference's flagship configuration
(configs/material_sync_train.json).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "iters/sec", "vs_baseline": N}

vs_baseline: the reference performs a *CPU* scipy-ARPACK shift-invert
eigensolve every 15 epochs (/root/reference/src/diffelastic/
diff_model.py:335-357, experiments/material_sync_train.py:134-140).  We
measure that exact solve on this host at the same problem size; 15 /
t_arpack is therefore a hardware-independent UPPER BOUND on the
reference's iters/sec (its per-epoch GPU work only adds cost).
vs_baseline = ours / that upper bound, i.e. a LOWER bound on the true
speedup.
"""

import functools
import json
import os
import subprocess
import sys
import time

import numpy as np


def _log(msg):
    if os.environ.get("BENCH_VERBOSE"):
        print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


# --- outage-proof driver entry ------------------------------------------
# Round 2's capture window hit a relay outage: jax backend init hung or
# raised "Unable to initialize backend 'axon': UNAVAILABLE", and the driver
# recorded a raw traceback instead of a JSON line.  The top-level entry now
# (1) probes backend health in a bounded-time subprocess, retrying a few
# times, and (2) runs the measurement itself in a subprocess with a hard
# timeout so a mid-run hang still yields ONE parseable JSON line (with an
# "error" field on persistent failure).

_PROBE_SRC = (
    "import jax, jax.numpy as jnp;"
    "x = jnp.ones((128, 128), jnp.float32);"
    # the float() pull matters: a half-dead relay (2026-08-20) served
    # pushes/compiles while device->host readbacks hung forever — a
    # probe that never pulls green-lights a doomed run
    "v = float((x @ x).sum());"
    "print('PROBE_OK', v, jax.devices()[0].platform)"
)


def _probe_backend(timeout=300):
    """True iff a fresh process can init the backend and run a matmul."""
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            capture_output=True, text=True, timeout=timeout,
        )
        return "PROBE_OK" in r.stdout, (r.stdout + r.stderr).strip()[-400:]
    except subprocess.TimeoutExpired:
        return False, f"probe timed out after {timeout}s (backend init hang)"


def _error_line(msg):
    print(json.dumps({
        "metric": "material_sync_ord2_train_iters_per_sec",
        "value": None,
        "unit": "iters/sec",
        "vs_baseline": None,
        "error": msg[:500],
    }))


def driver_main():
    probe_timeout = int(os.environ.get("BENCH_PROBE_TIMEOUT", "300"))
    run_timeout = int(os.environ.get("BENCH_RUN_TIMEOUT", "2400"))
    retries = int(os.environ.get("BENCH_RETRIES", "3"))

    last_detail = ""
    for attempt in range(retries):
        ok, detail = _probe_backend(probe_timeout)
        last_detail = detail
        _log(f"probe attempt {attempt + 1}/{retries}: ok={ok}")
        if ok:
            break
        time.sleep(min(60, 15 * (attempt + 1)))
    else:
        _error_line(f"backend unavailable after {retries} probes: {last_detail}")
        return

    for attempt in range(2):
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--run"],
                capture_output=True, text=True, timeout=run_timeout,
            )
        except subprocess.TimeoutExpired:
            _error_line(f"bench run timed out after {run_timeout}s")
            return
        for line in reversed(r.stdout.strip().splitlines()):
            try:
                parsed = json.loads(line)
            except (json.JSONDecodeError, ValueError):
                continue
            if isinstance(parsed, dict) and "metric" in parsed:
                print(line)
                return
        _log(f"run attempt {attempt + 1} produced no JSON (rc={r.returncode})")
        last_detail = (r.stderr or r.stdout).strip()[-400:]
    _error_line(f"bench run failed: {last_detail}")


def main():
    import jax

    # persistent compilation cache: the heavy backward-pass compiles are
    # reused across bench invocations
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_diffsound")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from diffsound_tpu.audio.mss_loss import MSSLoss
    from diffsound_tpu.audio.oscillator import TraditionalOscillatorParams
    from diffsound_tpu.fem import assembly
    from diffsound_tpu.fem.material import Material
    from diffsound_tpu.fem.mesh import TetMesh, cube_tet_mesh
    from diffsound_tpu.models.sound_obj import build_model
    from diffsound_tpu.solvers.arpack import eigsh_shift_invert

    import optax

    bowl = "/root/reference/data/mesh/bowl/bowl.obj_.msh"
    mesh = TetMesh.from_file(bowl) if os.path.exists(bowl) else cube_tet_mesh(6, 0.3)
    mat = (2700, 7.2e10, 0.19, 6, 1e-7)
    mode_num, sr, T = 16, 32000.0, 8000
    REFRESH = 15

    _log("building model (element ops on device)")
    model = build_model(
        mesh=mesh, mode_num=mode_num, order=2, mat=mat, task="material",
        dtype=jnp.float32,
    )
    jax.block_until_ready(model.ops.k_mu)
    _log("model built")
    osc = TraditionalOscillatorParams(1, mode_num, T, sr, Material.of(mat))
    forces = jnp.zeros((1, 150), jnp.float32).at[0, 0].set(1.0)
    loss_fn = MSSLoss([1024, 512, 256, 128, 64], sr, loss_type="l1_loss")

    # --- reference upper bound: its CPU ARPACK solve at this size --------
    mu, lam = model.material_lame({})
    _log("assembling scipy matrices (host ops, no device pull)")
    K, M = assembly.assemble_scipy(model.host_ops(), float(mu), float(lam), 1.0)
    # median of 3 solves: round 3's vs_baseline swung 28x -> 51x purely
    # from host load on a single-sample ARPACK timing (BENCH_NOTES.md);
    # the raw per-solve times ride along in the JSON for auditability
    arpack_times = []
    for i in range(3):
        _log(f"running reference ARPACK solve {i + 1}/3")
        t0 = time.perf_counter()
        vals, vecs = eigsh_shift_invert(K, M, k=mode_num + 6, sigma=20000.0)
        arpack_times.append(time.perf_counter() - t0)
        _log(f"arpack {arpack_times[-1]:.1f}s")
    t_arpack = float(np.median(arpack_times))
    ref_upper_iters_per_sec = REFRESH / t_arpack

    # --- our steady state -------------------------------------------------
    params = model.init_params(jax.random.PRNGKey(0), pretrain=False)
    _log("synthesizing gt audio")
    gt_audio, _ = osc(
        jnp.asarray(np.sqrt(np.maximum(vals[6:], 0)) / (2 * np.pi), jnp.float32),
        forces,
    )

    opt = optax.adam(2e-3)
    opt_state = opt.init(params)

    from diffsound_tpu.models.sound_obj import EigenState

    eig = EigenState(
        jnp.asarray(vals, jnp.float32),
        jnp.asarray(vecs, jnp.float32),
        jnp.asarray(0),
        jnp.zeros((mode_num + 6,), jnp.float32),
    )

    cache = model.modal_cache(eig)

    # gt/forces as jit arguments: closure constants would be constant-
    # folded through XLA's interpreting evaluator (minutes per FFT chain).
    # The gt-side spectrograms are loop-invariant but XLA does not hoist
    # them out of the scan body — precompute them once and thread the
    # pytree through (bit-identical loss, half the STFT work per step).
    gt_cache = jax.jit(loss_fn.target_cache)(gt_audio)

    def one_step(params, opt_state, cache, gt, fz):
        def lf(p):
            freqs = model.get_undamped_freqs_cached(p, cache)
            sig, damped = osc(freqs, fz)
            return loss_fn(sig, None, damped, 1.0, target_cache=gt)

        loss, g = jax.value_and_grad(lf)(params)
        g = model.bins.mask_grads(g)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    # a whole refresh interval of steps in ONE dispatch (lax.scan): the
    # tunneled chip pays ~25 ms relay RTT per call, which would otherwise
    # dominate the O(modes) cached step (same structure as the trainer,
    # experiments/material_sync.py)
    @functools.partial(jax.jit, static_argnums=5)
    def step(params, opt_state, cache, gt, fz, n=1):
        def body(carry, _):
            p, o = carry
            p, o, loss = one_step(p, o, cache, gt, fz)
            return (p, o), loss

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), None, length=n
        )
        return params, opt_state, losses[-1]

    # warm up (compile) both the step and the on-device refresh
    _log("compiling train step")
    params, opt_state, loss = step(
        params, opt_state, cache, gt_cache, forces, REFRESH
    )
    jax.block_until_ready(loss)
    _log("train step compiled; compiling LOBPCG refresh")
    eig, cache = model.refresh(params, eig)  # compiles fused solve+cache
    jax.block_until_ready(eig.eigenvalues)
    _log("refresh compiled; timing steady state")

    # timed steady state: fused refresh dispatch then one scanned dispatch
    # of REFRESH optimizer steps, exactly like the trainer's epoch loop.
    # Enough cycles that the early large-drift refreshes (which run the
    # solver longer) don't dominate the steady-state number.
    CYCLES = 10
    EPOCHS = CYCLES * REFRESH
    t0 = time.perf_counter()
    for _ in range(CYCLES):
        eig, cache = model.refresh(params, eig)
        params, opt_state, loss = step(
            params, opt_state, cache, gt_cache, forces, REFRESH
        )
    jax.block_until_ready(loss)
    wall = time.perf_counter() - t0
    iters_per_sec = EPOCHS / wall

    # primary metric FIRST: the diagnostic pass below must stay purely
    # additive (a timeout mid-diagnostics would otherwise destroy the
    # already-measured number)
    print(
        json.dumps(
            {
                "metric": "material_sync_ord2_train_iters_per_sec",
                "value": round(iters_per_sec, 3),
                "unit": "iters/sec",
                "vs_baseline": round(iters_per_sec / ref_upper_iters_per_sec, 3),
                "baseline_arpack_s": round(t_arpack, 2),
                "baseline_arpack_samples_s": [round(t, 2) for t in arpack_times],
            }
        ),
        flush=True,
    )

    if os.environ.get("BENCH_VERBOSE"):
        # diagnostic pass with per-dispatch sync (not the reported number:
        # the sync points break refresh/step pipelining)
        t_refresh = t_steps = 0.0
        for _ in range(CYCLES):
            ta = time.perf_counter()
            eig, cache = model.refresh(params, eig)
            jax.block_until_ready(cache)
            tb = time.perf_counter()
            params, opt_state, loss = step(
                params, opt_state, cache, gt_cache, forces, REFRESH
            )
            jax.block_until_ready(loss)
            t_refresh += tb - ta
            t_steps += time.perf_counter() - tb
        _log(
            f"breakdown (synced): refresh {t_refresh / CYCLES * 1e3:.1f} ms/cycle, "
            f"{REFRESH}-step scan {t_steps / CYCLES * 1e3:.1f} ms/cycle "
            f"({t_steps / EPOCHS * 1e3:.2f} ms/step)"
        )


if __name__ == "__main__":
    if "--run" in sys.argv:
        main()
    else:
        driver_main()
