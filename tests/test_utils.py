"""Checkpointing, metric logging, and visualization utilities."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from diffsound_tpu.utils.checkpoint import TrainCheckpointer, load_pytree, save_pytree
from diffsound_tpu.utils.logging import MetricLogger
from diffsound_tpu.utils.profiler import Timer, tick, tock
from diffsound_tpu.utils import visualize


class TestCheckpoint:
    def test_pytree_roundtrip(self, tmp_path):
        tree = {
            "a": jnp.arange(5.0),
            "b": {"c": jnp.ones((2, 3)), "d": jnp.asarray(3)},
        }
        base = str(tmp_path / "ck")
        save_pytree(base, tree, {"step": 7})
        like = jax.tree.map(jnp.zeros_like, tree)
        out = load_pytree(base, like)
        np.testing.assert_array_equal(np.asarray(out["a"]), np.arange(5.0))
        np.testing.assert_array_equal(np.asarray(out["b"]["c"]), np.ones((2, 3)))

    def test_train_checkpointer_resume(self, tmp_path):
        params = {"w": jnp.ones((4,)) * 2.0}
        opt = optax.adam(1e-2)
        opt_state = opt.init(params)
        ck = TrainCheckpointer(str(tmp_path), every=10)
        ck.maybe_save(20, params, opt_state)

        fresh_params = {"w": jnp.zeros((4,))}
        fresh_state = opt.init(fresh_params)
        restored = ck.restore(fresh_params, fresh_state)
        assert restored is not None
        rparams, rstate, step = restored
        assert step == 20
        np.testing.assert_array_equal(np.asarray(rparams["w"]), 2.0 * np.ones(4))

    def test_no_checkpoint_returns_none(self, tmp_path):
        ck = TrainCheckpointer(str(tmp_path), every=1)
        assert ck.restore({"w": jnp.ones(2)}, None) is None


class TestLogging:
    def test_jsonl_written(self, tmp_path):
        lg = MetricLogger(str(tmp_path))
        lg.scalar("loss", 1.5, 0)
        lg.scalars({"a": 1, "b": 2}, 1)
        lg.close()
        lines = [json.loads(l) for l in open(lg.path)]
        assert len(lines) == 3
        assert lines[0]["tag"] == "loss" and lines[0]["value"] == 1.5


class TestProfiler:
    def test_tick_tock(self):
        tick("unit")
        dt = tock("unit", verbose=False)
        assert dt >= 0

    def test_timer_context(self):
        with Timer("t") as t:
            _ = sum(range(1000))
        assert t.elapsed > 0


class TestVisualize:
    def test_plot_spec(self, tmp_path):
        rng = np.random.default_rng(0)
        path = str(tmp_path / "spec.png")
        visualize.save_spec_figure(
            path, rng.random((64, 20)), rng.random((64, 20))
        )
        assert os.path.getsize(path) > 1000

    def test_mode_viewer_export(self, tmp_path):
        from tests.test_geometry import icosphere

        verts, faces = icosphere(1)
        shapes = np.random.default_rng(1).standard_normal((len(verts), 3, 4))
        out = visualize.export_mode_viewer(
            str(tmp_path / "modes.html"), verts, faces, shapes,
            mode_freqs=[100.0, 200.0, 300.0, 400.0],
        )
        assert os.path.exists(out)
        assert os.path.getsize(out) > 500


def test_bench_driver_emits_parseable_json_on_outage():
    """bench.py's driver entry must print ONE parseable JSON line with
    the metric schema even when the backend is unreachable (round-2
    post-mortem: the driver recorded a raw traceback instead of a
    number).  Forced-failure path: probe timeout ~0 with no retries."""
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env.update(BENCH_PROBE_TIMEOUT="1", BENCH_RETRIES="1",
               PALLAS_AXON_POOL_IPS="")
    env.pop("PALLAS_AXON_POOL_IPS")
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..", "bench.py")],
        capture_output=True, text=True, timeout=240, env=env,
    )
    lines = [l for l in r.stdout.strip().splitlines() if l.strip()]
    assert lines, r.stderr[-500:]
    rec = json.loads(lines[-1])
    assert rec["metric"] == "material_sync_ord2_train_iters_per_sec"
    assert set(rec) >= {"metric", "value", "unit", "vs_baseline"}
    # with a 1s probe the backend can't come up -> explicit error field
    assert rec["value"] is None and "error" in rec


class TestParseFlags:
    """Precedence: builtin/caller defaults < --config JSON < explicit CLI
    (a JSON config must not clobber an explicitly-passed known arg)."""

    def _cfg(self, tmp_path, body):
        p = tmp_path / "cfg.json"
        p.write_text(json.dumps(body))
        return str(p)

    def test_cli_beats_config_for_known_args(self, tmp_path):
        from diffsound_tpu.config import parse_flags

        cfg = self._cfg(tmp_path, {"iter": 500, "learning_rate": 2e-2})
        flags = parse_flags(argv=["--config", cfg, "--iter", "150"])
        assert flags.iter == 150          # explicit CLI wins
        assert flags.learning_rate == 2e-2  # config fills the rest

    def test_config_beats_defaults(self, tmp_path):
        from diffsound_tpu.config import parse_flags

        cfg = self._cfg(tmp_path, {"iter": 500, "mat": "Ceramic"})
        flags = parse_flags(argv=["--config", cfg], defaults={"mat": "Steel"})
        assert flags.iter == 500
        assert flags.mat == "Ceramic"

    def test_builtin_defaults_when_unset(self):
        from diffsound_tpu.config import parse_flags

        flags = parse_flags(argv=[], defaults={"mode_num": 32})
        assert flags.iter == 5000
        assert flags.learning_rate == 0.01
        assert flags.mode_num == 32

    def test_extra_arg_overrides_config(self, tmp_path):
        from diffsound_tpu.config import parse_flags

        cfg = self._cfg(tmp_path, {"dmtet_grid": 64})
        flags = parse_flags(argv=["--config", cfg, "--dmtet_grid", "32"])
        assert flags.dmtet_grid == 32
