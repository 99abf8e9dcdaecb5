"""Host-side timing utilities (the TICK/TOCK analogue of the reference's
chrono macros, /root/reference/src/include/macro.h:32-44) plus a
`jax.profiler` trace hook for on-device analysis."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

_ticks = {}
_accum = defaultdict(float)
_counts = defaultdict(int)


def tick(name: str):
    _ticks[name] = time.perf_counter()


def tock(name: str, block_on=None, verbose: bool = True) -> float:
    """Stop the named timer; `block_on` (a jax array) forces device sync so
    the measurement covers async dispatch."""
    if block_on is not None:
        jax.block_until_ready(block_on)
    dt = time.perf_counter() - _ticks[name]
    _accum[name] += dt
    _counts[name] += 1
    if verbose:
        print(f"[tock] {name}: {dt * 1000:.2f} ms")
    return dt


def timing_summary():
    return {
        k: {"total_s": _accum[k], "count": _counts[k], "mean_ms": 1000 * _accum[k] / _counts[k]}
        for k in _accum
    }


class Timer:
    """Context-manager timer with optional device sync."""

    def __init__(self, name: str = "", block_on=None, verbose: bool = False):
        self.name = name
        self.block_on = block_on
        self.verbose = verbose
        self.elapsed = 0.0

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.block_on is not None:
            jax.block_until_ready(self.block_on)
        self.elapsed = time.perf_counter() - self.t0
        if self.verbose:
            print(f"[timer] {self.name}: {self.elapsed * 1000:.2f} ms")


@contextlib.contextmanager
def device_trace(logdir: str):
    """jax.profiler trace (TensorBoard-compatible) around a code block —
    the counterpart of the reference's torch.profiler hook in its LOBPCG
    loop (/root/reference/src/lobpcg/_lobpcg.py:357-369)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
