"""End-to-end shape inference: thickness and morphing coefficients are
recovered from modal eigenvalue targets on small grids (the reference's
thickness_train / morphing_train loops in miniature)."""

import numpy as np
import pytest
import jax.numpy as jnp

from diffsound_tpu.geometry.tasks import MorphingTask, ThicknessTask
from tests.test_geometry import icosphere


MAT = (2700, 2.0e11, 0.29, 20, 3e-8)  # Steel (parity with thickness config)


def test_thickness_recovery_fast():
    """Reduced-scale tier of test_thickness_recovery: a handful of
    iterations must move the coefficient toward the target and cut the
    loss; full recovery is the slow-marked test below."""
    verts, faces = icosphere(2, radius=0.42)
    task = ThicknessTask(
        grid_res=12, scale=1.0, mat=MAT, mode_num=8, tets_dir="/nonexistent"
    )
    task.apply_sdf(verts, faces)
    target_coef = 0.6
    target = task.eigenvalues(target_coef)
    assert np.all(target > 0)
    params, history = task.optimize(
        jnp.asarray(target), iters=8, lr=5e-2, verbose=False
    )
    assert history[-1]["loss"] < history[0]["loss"]
    assert abs(history[-1]["coef"] - target_coef) < abs(
        history[0]["coef"] - target_coef
    )


@pytest.mark.slow
def test_thickness_recovery():
    verts, faces = icosphere(2, radius=0.42)
    task = ThicknessTask(
        grid_res=12, scale=1.0, mat=MAT, mode_num=8, tets_dir="/nonexistent"
    )
    task.apply_sdf(verts, faces)

    target_coef = 0.6
    target = task.eigenvalues(target_coef)
    assert np.all(target > 0)

    params, history = task.optimize(
        jnp.asarray(target), iters=40, lr=5e-2, verbose=False
    )
    final = history[-1]["coef"]
    init = history[0]["coef"]
    assert abs(final - target_coef) < 0.1, history[-5:]
    assert abs(final - target_coef) < abs(init - target_coef)


def test_thickness_newton_recovery():
    """Scalar Gauss-Newton (ShapeTaskBase.newton_optimize): recovers the
    coefficient to ~bin resolution in a handful of true eigensolves."""
    verts, faces = icosphere(2, radius=0.42)
    task = ThicknessTask(
        grid_res=12, scale=1.0, mat=MAT, mode_num=8, tets_dir="/nonexistent"
    )
    task.apply_sdf(verts, faces)
    target_coef = 0.6
    target = task.eigenvalues(target_coef)
    coef, history = task.newton_optimize(
        np.asarray(target), iters=20, c0=0.45, verbose=False
    )
    assert abs(coef - target_coef) < 0.02, history[-5:]
    assert len(history) < 20  # converged by tol_dc, not budget


def test_morphing_newton_recovery():
    v1, f1 = icosphere(2, radius=0.45)
    v2, f2 = icosphere(2, radius=0.30)
    task = MorphingTask(
        grid_res=12, scale=1.0, mat=MAT, mode_num=6, tets_dir="/nonexistent"
    )
    task.apply_sdf2(v1, f1, v2, f2)
    target_coef = 0.7
    target = task.eigenvalues(target_coef)
    coef, history = task.newton_optimize(
        np.asarray(target), iters=25, c0=0.4, verbose=False
    )
    assert abs(coef - target_coef) < 0.05, history[-5:]


def test_morphing_recovery_fast():
    """Reduced-scale tier of test_morphing_recovery."""
    v1, f1 = icosphere(2, radius=0.45)
    v2, f2 = icosphere(2, radius=0.30)
    task = MorphingTask(
        grid_res=12, scale=1.0, mat=MAT, mode_num=6, tets_dir="/nonexistent"
    )
    task.apply_sdf2(v1, f1, v2, f2)
    target_coef = 0.7
    target = task.eigenvalues(target_coef)
    params, history = task.optimize(
        jnp.asarray(target), iters=8, lr=1e-1, verbose=False, init_coef=0.4
    )
    assert history[-1]["loss"] < history[0]["loss"]
    assert abs(history[-1]["coef"] - target_coef) < abs(0.4 - target_coef)


@pytest.mark.slow
def test_morphing_recovery():
    v1, f1 = icosphere(2, radius=0.45)
    v2, f2 = icosphere(2, radius=0.30)
    task = MorphingTask(
        grid_res=12, scale=1.0, mat=MAT, mode_num=6, tets_dir="/nonexistent"
    )
    task.apply_sdf2(v1, f1, v2, f2)

    target_coef = 0.7
    target = task.eigenvalues(target_coef)
    params, history = task.optimize(
        jnp.asarray(target), iters=40, lr=1e-1, verbose=False, init_coef=0.4
    )
    final = history[-1]["coef"]
    assert abs(final - target_coef) < 0.12, history[-5:]
    # monotone-ish improvement
    assert history[-1]["loss"] < 0.25 * history[0]["loss"]


def test_warm_eigensolver_matches_host():
    """Device warm path vs host ARPACK on consecutive geometries: the
    second solve must run warm (basis mapped across the remesh through
    global grid slots) and agree with a fresh host solve."""
    from diffsound_tpu.geometry.dmtet import MarchingTets

    verts, faces = icosphere(2, radius=0.42)
    task = ThicknessTask(
        grid_res=12, scale=1.0, mat=MAT, mode_num=8, tets_dir="/nonexistent",
        eig_method="warm",
    )
    task.apply_sdf(verts, faces)
    assert task.warm is not None

    for i, coef in enumerate([0.5, 0.51, 0.52]):
        th = jnp.asarray(coef * task.max_thickness)
        out = task._march(task.sdf, th)
        comp = MarchingTets.compact(out)
        vals, U = task._eigensolve(out, comp)
        if i == 0:
            assert task.warm.last_mode == "cold"
        else:
            # warm when the budgeted refresh converged; the residual
            # escalation may re-anchor on a large geometry jump
            assert task.warm.last_mode in ("warm", "cold-escalated")
        ref_vals, _ = task._eigensolve_host(out, comp)
        # elastic modes agree to solver tolerance (Ritz error ~ resid^2)
        rel = np.abs(vals[6:] - ref_vals[6:]) / np.abs(ref_vals[6:])
        assert rel.max() < 2e-4, (i, rel.max())
        # basis rows live in the right slots: M-orthonormality of U
        n = 3 * comp["num_verts"]
        assert np.all(np.isfinite(U[:n]))


@pytest.mark.slow
def test_thickness_recovery_warm_path_speedup_semantics():
    """Full thickness loop on the warm path recovers the coefficient and
    runs warm on (nearly) every iteration after the first."""
    verts, faces = icosphere(2, radius=0.42)
    task = ThicknessTask(
        grid_res=12, scale=1.0, mat=MAT, mode_num=8, tets_dir="/nonexistent",
        eig_method="warm",
    )
    task.apply_sdf(verts, faces)
    target = task.eigenvalues(0.6)
    params, history = task.optimize(
        jnp.asarray(target), iters=20, lr=5e-2, verbose=False
    )
    assert abs(history[-1]["coef"] - 0.6) < 0.12
    # the steady state is device-resident (early big steps may escalate
    # to a host re-anchor; the majority must run warm)
    assert task.warm.total_warm >= 10, (task.warm.total_warm, task.warm.total_cold)


def test_thickness_recovery_with_refresh_cadence():
    """refresh_every=2: every other step only MAPS the basis across the
    remesh (no eigensolve); recovery must still progress — validates the
    first-order exactness of the Rayleigh correction at a stale basis.
    (The step size must stay inside the map's drift budget: lr 5e-2 with
    cadence 4 measurably poisons the gradient after a topology jump; the
    cadence is built for the geometry task's lr=1e-5 regime where a
    post-remesh refresh costs 178 LOBPCG iterations.)"""
    verts, faces = icosphere(2, radius=0.42)
    task = ThicknessTask(
        grid_res=12, scale=1.0, mat=MAT, mode_num=8, tets_dir="/nonexistent",
        refresh_every=2,
    )
    task.apply_sdf(verts, faces)
    target_coef = 0.6
    target = task.eigenvalues(target_coef)
    params, history = task.optimize(
        jnp.asarray(target), iters=14, lr=2e-2, verbose=False
    )
    assert task.warm.total_mapped >= 5, (
        task.warm.total_mapped, task.warm.total_warm, task.warm.total_cold
    )
    assert history[-1]["loss"] < history[0]["loss"]
    assert abs(history[-1]["coef"] - target_coef) < abs(
        history[0]["coef"] - target_coef
    )


class _CappedWarmStub:
    """Mimics WarmShapeEigensolver's stats surface: a 'warm' refresh whose
    residual never reached the solver tolerance is the suspect case
    (the gate is residual-based, not iteration-based — ADVICE round 3:
    a solve converging exactly at the cap, or an escalation round that
    recovers, must NOT be gated)."""

    def __init__(self):
        self.last_mode = "warm"
        self.last_iterations = 0
        self.last_resid = 0.0
        self.tol = 3e-3
        self.max_iters = 240
        self.total_warm = 0
        self.total_cold = 0
        self.anchor_requests = 0

    def request_anchor(self):
        self.anchor_requests += 1


def test_optimize_skips_update_on_unconverged_refresh(monkeypatch):
    import jax

    task = ThicknessTask(grid_res=4, scale=1.0, mat="Steel", mode_num=4)
    task.warm = _CappedWarmStub()
    p0 = task.bins.init_params(jax.random.PRNGKey(0))
    coef0 = float(task.bins.value(p0))
    grad = jax.tree.map(jnp.ones_like, p0)
    calls = {"n": 0}

    def fake_step(params, target):
        calls["n"] += 1
        # unconverged (suspect) on the 1st and 3rd steps, healthy otherwise
        task.warm.last_resid = 1e-2 if calls["n"] % 2 == 1 else 1e-3
        return jnp.asarray(1.0), grad

    monkeypatch.setattr(task, "step_loss_grad", fake_step)
    _, hist = task.optimize(jnp.ones(4), iters=4, lr=1e-2, verbose=False)

    assert [h["skipped"] for h in hist] == [True, False, True, False]
    assert hist[0]["coef"] == pytest.approx(coef0)       # gated: no move
    assert hist[1]["coef"] != pytest.approx(hist[0]["coef"])  # healthy: moves
    assert hist[2]["coef"] == pytest.approx(hist[1]["coef"])  # gated again
    assert task.warm.anchor_requests == 0  # never 3 consecutive


def test_optimize_never_skips_on_cold_capped_or_converged_warm(monkeypatch):
    import jax

    task = ThicknessTask(grid_res=4, scale=1.0, mat="Steel", mode_num=4)
    task.warm = _CappedWarmStub()
    p0 = task.bins.init_params(jax.random.PRNGKey(0))
    grad = jax.tree.map(jnp.ones_like, p0)
    # (mode, iterations, resid): a capped-but-converged warm solve and a
    # recovered escalation round must pass the gate
    cases = iter([
        ("cold", 0, 0.0),
        ("warm", 16, 1e-3),
        ("warm", 240, 2.9e-3),          # hit cap, converged at the wire
        ("cold-escalated", 480, 0.0),
    ])

    def fake_step(params, target):
        (task.warm.last_mode, task.warm.last_iterations,
         task.warm.last_resid) = next(cases)
        return jnp.asarray(1.0), grad

    monkeypatch.setattr(task, "step_loss_grad", fake_step)
    _, hist = task.optimize(jnp.ones(4), iters=4, lr=1e-2, verbose=False)
    assert [h["skipped"] for h in hist] == [False, False, False, False]


def test_optimize_anchors_after_consecutive_suspect_refreshes(monkeypatch):
    """ADVICE round 3: a basis stuck in the suspect band must not burn the
    whole budget — after 3 consecutive skips the loop forces a host
    re-anchor."""
    import jax

    task = ThicknessTask(grid_res=4, scale=1.0, mat="Steel", mode_num=4)
    task.warm = _CappedWarmStub()
    task.warm.last_resid = 1e-2  # permanently suspect
    p0 = task.bins.init_params(jax.random.PRNGKey(0))
    grad = jax.tree.map(jnp.ones_like, p0)

    monkeypatch.setattr(
        task, "step_loss_grad", lambda p, t: (jnp.asarray(1.0), grad)
    )
    _, hist = task.optimize(jnp.ones(4), iters=7, lr=1e-2, verbose=False)
    assert all(h["skipped"] for h in hist)
    assert task.warm.anchor_requests == 2  # at iters 2 and 5 (0-based)


def test_newton_stall_rescue_probes_past_frozen_topology_stationary(monkeypatch):
    """Round-4 morphing target 0.2 stalled at coef 0.26 / loss 0.048: the
    frozen-topology Jacobian proposed a ~zero step right after a capped
    refresh, and newton_optimize accepted it as convergence.  The rescue
    path must (a) re-anchor when the backing refresh is suspect, then
    (b) probe the TRUE loss at +-probe_step and continue from an
    improving probe instead of exiting on a staircase tread."""
    task = ThicknessTask(grid_res=4, scale=1.0, mat="Steel", mode_num=4)
    task.warm = _CappedWarmStub()

    # true landscape: quadratic with minimum at 0.2; the stubbed Jacobian
    # is ZERO at every eval (Newton always proposes dc=0)
    def true_loss(c):
        return (c - 0.2) ** 2

    monkeypatch.setattr(task, "_march_coef", lambda c: None)
    import diffsound_tpu.geometry.dmtet as dmtet_mod

    monkeypatch.setattr(dmtet_mod.MarchingTets, "compact",
                        staticmethod(lambda out: {"keep_idx": np.zeros(1, np.int64),
                                                  "tets": np.zeros((1, 4), np.int64),
                                                  "tet_mask": np.ones(1),
                                                  "num_verts": 1, "num_tets": 1}))
    monkeypatch.setattr(task, "_eigensolve", lambda out, comp: (np.ones(4), np.ones((3, 4))))
    monkeypatch.setattr(
        task, "_coef_vals_jac",
        lambda c, comp, U: (np.full(4, 1.0 + np.sqrt(true_loss(c))),
                            np.zeros(4)),
    )
    monkeypatch.setattr(
        task, "_true_loss", lambda c, target: true_loss(c)
    )

    target = np.ones(4)
    # first solve is "suspect" -> expect one re-anchor request, then the
    # probe walk marches 0.26 -> 0.24 -> 0.22 -> 0.20 (probe_step 0.02)
    task.warm.last_resid = 1e-2  # suspect at first
    seen = {"n": 0}
    orig = task._grad_suspect

    def suspect_once():
        if seen["n"] == 0:
            seen["n"] += 1
            return True
        return False

    monkeypatch.setattr(task, "_grad_suspect", suspect_once)
    c, hist = task.newton_optimize(
        target, iters=20, c0=0.26, verbose=False, probe_step=0.02,
        loss_floor=1e-6,
    )
    assert task.warm.anchor_requests == 1
    assert c == pytest.approx(0.22, abs=1e-9)  # 2 remaining rescues used
    # with more rescue budget it would keep walking; the bounded budget
    # must still leave the result strictly better than the stall point
    assert true_loss(c) < true_loss(0.26)


def test_newton_stall_accepts_genuine_minimum(monkeypatch):
    """When both probes are worse, the stall is a genuine minimum and the
    walk must exit there (no infinite rescue loop)."""
    task = ThicknessTask(grid_res=4, scale=1.0, mat="Steel", mode_num=4)
    task.warm = _CappedWarmStub()

    def true_loss(c):
        return 0.05 + (c - 0.26) ** 2  # floor ABOVE loss_floor at c=0.26

    import diffsound_tpu.geometry.dmtet as dmtet_mod

    monkeypatch.setattr(task, "_march_coef", lambda c: None)
    monkeypatch.setattr(dmtet_mod.MarchingTets, "compact",
                        staticmethod(lambda out: {"keep_idx": np.zeros(1, np.int64),
                                                  "tets": np.zeros((1, 4), np.int64),
                                                  "tet_mask": np.ones(1),
                                                  "num_verts": 1, "num_tets": 1}))
    monkeypatch.setattr(task, "_eigensolve", lambda out, comp: (np.ones(4), np.ones((3, 4))))
    monkeypatch.setattr(
        task, "_coef_vals_jac",
        lambda c, comp, U: (np.full(4, 1.0 + np.sqrt(true_loss(c))),
                            np.zeros(4)),
    )
    monkeypatch.setattr(task, "_true_loss", lambda c, target: true_loss(c))
    monkeypatch.setattr(task, "_grad_suspect", lambda: False)

    c, hist = task.newton_optimize(
        np.ones(4), iters=20, c0=0.26, verbose=False, probe_step=0.02,
    )
    assert c == pytest.approx(0.26, abs=1e-9)
    assert len(hist) == 1  # the stall iter exits directly, no runaway


def test_newton_cycle_break_bisects_oscillation(monkeypatch):
    """A clipped Newton step that re-proposes an already-visited coef
    (0.34 <-> 0.42 oscillation across a 0.35 target, seen at grid 12)
    must bisect the hop instead of ping-ponging forever."""
    task = ThicknessTask(grid_res=4, scale=1.0, mat="Steel", mode_num=4)
    task.warm = _CappedWarmStub()
    task.warm.last_resid = 1e-4  # always healthy

    import diffsound_tpu.geometry.dmtet as dmtet_mod

    monkeypatch.setattr(task, "_march_coef", lambda c: None)
    monkeypatch.setattr(dmtet_mod.MarchingTets, "compact",
                        staticmethod(lambda out: {"keep_idx": np.zeros(1, np.int64),
                                                  "tets": np.zeros((1, 4), np.int64),
                                                  "tet_mask": np.ones(1),
                                                  "num_verts": 1, "num_tets": 1}))
    monkeypatch.setattr(task, "_eigensolve", lambda out, comp: (np.ones(4), np.ones((3, 4))))
    # vals linear in c with a minute Jacobian: Newton overshoots and clips
    monkeypatch.setattr(
        task, "_coef_vals_jac",
        lambda c, comp, U: (np.full(4, 1.0 + 0.1 * (c - 0.35)),
                            np.full(4, 0.01)),
    )
    monkeypatch.setattr(task, "_true_loss",
                        lambda c, target: (0.1 * (c - 0.35)) ** 2)
    monkeypatch.setattr(task, "_grad_suspect", lambda: False)

    c, hist = task.newton_optimize(
        np.ones(4), iters=6, c0=0.42, max_step=0.08, verbose=False,
    )
    coefs = [h["coef"] for h in hist]
    assert coefs[0] == pytest.approx(0.42)
    assert coefs[1] == pytest.approx(0.34)   # first clipped hop
    assert any(h.get("bisect") for h in hist)  # the return hop bisected
    assert coefs[2] == pytest.approx(0.38)   # midpoint, not 0.42 again


def test_warm_escalation_reuse_body_matches_host():
    """escalation_body='reuse': a large coef jump whose first carried-
    products round caps must still converge through reuse-body
    escalation rounds (products rebuilt at re-entry) and agree with a
    fresh host solve."""
    from diffsound_tpu.geometry.dmtet import MarchingTets

    verts, faces = icosphere(2, radius=0.42)
    task = ThicknessTask(
        grid_res=12, scale=1.0, mat=MAT, mode_num=8, tets_dir="/nonexistent",
    )
    task.warm.escalation_body = "reuse"
    task.warm.max_iters = 60  # force the first round to cap on the jump
    task.apply_sdf(verts, faces)

    out = task._march(task.sdf, jnp.asarray(0.55 * task.max_thickness))
    comp = MarchingTets.compact(out)
    task._eigensolve(out, comp)  # cold anchor
    assert task.warm.last_mode == "cold"

    out2 = task._march(task.sdf, jnp.asarray(0.30 * task.max_thickness))
    comp2 = MarchingTets.compact(out2)
    vals, U = task._eigensolve(out2, comp2)
    ref_vals, _ = task._eigensolve_host(out2, comp2)
    rel = np.abs(vals[6:] - ref_vals[6:]) / np.abs(ref_vals[6:])
    # the contract: either the escalation converged (accurate values), or
    # the accepted-but-unconverged residual is RECORDED so callers'
    # _grad_suspect gate fires; silent wrong eigenvalues are the failure
    if task.warm.last_mode == "warm" and task.warm.last_resid <= task.warm.tol:
        assert rel.max() < 2e-4, (task.warm.last_mode, rel.max())
    elif task.warm.last_mode == "warm":
        assert task.warm.last_resid > task.warm.tol  # suspect band, gated
        assert rel.max() < 5e-2  # still inside the escalation bound's
        # documented value-accuracy envelope (~1e-3 at resid 3e-2)
    else:
        assert task.warm.last_mode == "cold-escalated"
        assert rel.max() < 2e-4


def test_true_loss_probe_forces_real_refresh(monkeypatch):
    """Review finding r5-#5: under a refresh_every>1 cadence the stall
    probe must NEVER consume a map_only basis — it exists to bypass
    frozen-basis blindness."""
    from diffsound_tpu.geometry.dmtet import MarchingTets

    task = ThicknessTask(grid_res=4, scale=1.0, mat="Steel", mode_num=4,
                         refresh_every=3)
    task.warm = _CappedWarmStub()
    called = {"map": 0, "solve": 0}

    task.warm.map_only = lambda out, comp: called.__setitem__(
        "map", called["map"] + 1) or (np.ones(4), np.ones((3, 4)))

    def fake_solve(out, comp, mu, lam, host_solve):
        called["solve"] += 1
        return np.ones(4), np.ones((3, 4))

    task.warm.solve = fake_solve
    monkeypatch.setattr(task, "_march_coef", lambda c: None)
    monkeypatch.setattr(MarchingTets, "compact",
                        staticmethod(lambda out: {"keep_idx": np.zeros(1, np.int64),
                                                  "tets": np.zeros((1, 4), np.int64),
                                                  "tet_mask": np.ones(1),
                                                  "num_verts": 1, "num_tets": 1}))
    monkeypatch.setattr(task, "_coef_vals", lambda c, comp, U: np.ones(4))

    task._steps_since_refresh = 0  # mid-cadence: a normal step would map
    task._true_loss(0.5, np.ones(4))
    assert called == {"map": 0, "solve": 1}
