"""Device-mesh construction for multi-chip runs.

The reference is strictly single-GPU (SURVEY.md section 2.8); the
distributed layer here is new design: a 2D logical mesh

  * "dp" — data parallel over material pairs / audio channels (the 16
    independent inference problems of material_sync run simultaneously)
  * "ep" — element parallel over tetrahedra: assembly and the matrix-free
    K@X / M@X shard over elements, reduced onto shared nodes with psum

Collectives ride ICI within a slice; use jax.distributed.initialize()
before calling this on multi-host pods.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_device_mesh(dp: int = None, ep: int = 1, devices=None) -> Mesh:
    """Create a (dp, ep) mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // ep
    if dp * ep > n:
        raise ValueError(f"dp*ep={dp * ep} > num devices {n}")
    arr = np.asarray(devices[: dp * ep]).reshape(dp, ep)
    return Mesh(arr, axis_names=("dp", "ep"))
