"""argparse + JSON config merge, matching the reference's FLAGS pattern
(identical block in every experiment script, e.g.
/root/reference/experiments/material_sync_train.py:26-42)."""

from __future__ import annotations

import argparse
import json


def enable_compilation_cache():
    """Persistent XLA compilation cache: remote TPU compiles run minutes
    cold; relaunches and resumed runs should never pay twice for the
    same program."""
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_diffsound")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def parse_flags(description: str = "diffsound-tpu", defaults: dict = None, argv=None):
    enable_compilation_cache()
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("--config", type=str, default=None, help="Config file")
    parser.add_argument("-i", "--iter", type=int, default=5000)
    parser.add_argument("-lr", "--learning-rate", type=float, default=0.01)
    flags, extra = parser.parse_known_args(argv)

    if defaults:
        for k, v in defaults.items():
            flags.__dict__.setdefault(k, v)

    if flags.config is not None:
        with open(flags.config) as f:
            for key, val in json.load(f).items():
                flags.__dict__[key] = val

    # `--key value` overrides applied after the JSON merge (values parsed
    # as JSON when possible so numbers/bools round-trip).
    it = iter(extra)
    for tok in it:
        if not tok.startswith("--"):
            raise SystemExit(f"unrecognized argument: {tok}")
        key = tok[2:]
        try:
            raw = next(it)
        except StopIteration:
            raise SystemExit(f"missing value for --{key}")
        try:
            val = json.loads(raw)
        except json.JSONDecodeError:
            val = raw
        flags.__dict__[key] = val

    print("Config / Flags:")
    print("---------")
    for key, val in flags.__dict__.items():
        print(key, val)
    print("---------")
    return flags
