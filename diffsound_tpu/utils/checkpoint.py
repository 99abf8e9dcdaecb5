"""Checkpoint / resume for parameter and optimizer pytrees.

The reference only has ad-hoc torch.save of module state dicts
(material_sync_train.py:203-204, geometry_train.py:208-211) with no
optimizer state or mid-run resume; here both params and optimizer state
round-trip, as flat npz archives (no framework lock-in)."""

from __future__ import annotations

import json
import os

import jax
import numpy as np


def _flatten(tree):
    leaves, treedef = jax.tree.flatten(tree)
    return leaves, treedef


def save_pytree(path: str, tree, extra: dict = None):
    """Save a pytree of arrays to `<path>.npz` + `<path>.json` (structure)."""
    leaves, treedef = _flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(leaves)}
    np.savez_compressed(path + ".npz", **arrays)
    meta = {"treedef": str(treedef), "num_leaves": len(leaves), "extra": extra or {}}
    with open(path + ".json", "w") as f:
        json.dump(meta, f)


def load_pytree(path: str, like):
    """Load into the structure of `like` (same treedef as when saved)."""
    data = np.load(path + ".npz")
    leaves, treedef = _flatten(like)
    if len(leaves) != len(data.files):
        raise ValueError(
            f"checkpoint has {len(data.files)} leaves, template has {len(leaves)}"
        )
    new_leaves = [data[f"leaf_{i}"] for i in range(len(leaves))]
    return jax.tree.unflatten(treedef, new_leaves)


def load_extra(path: str) -> dict:
    with open(path + ".json") as f:
        return json.load(f).get("extra", {})


class TrainCheckpointer:
    """Periodic (params, opt_state, step) checkpointing with resume."""

    def __init__(self, out_dir: str, every: int = 500, name: str = "ckpt"):
        os.makedirs(out_dir, exist_ok=True)
        self.base = os.path.join(out_dir, name)
        self.every = every

    def maybe_save(self, step: int, params, opt_state, extra: dict = None):
        if step % self.every == 0:
            save_pytree(self.base + "_params", params, {"step": step, **(extra or {})})
            save_pytree(self.base + "_opt", opt_state)

    def restore(self, params_like, opt_like):
        """Returns (params, opt_state, step) or None if no checkpoint."""
        if not os.path.exists(self.base + "_params.npz"):
            return None
        params = load_pytree(self.base + "_params", params_like)
        opt_state = load_pytree(self.base + "_opt", opt_like)
        step = load_extra(self.base + "_params").get("step", 0)
        return params, opt_state, step
