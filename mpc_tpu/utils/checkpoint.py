"""Checkpoint/resume for long scenario suites.

The reference carries no persistent state beyond the in-memory warm start
(controller.py:20-21); for the 10k-rollout suites (BASELINE.json config #5)
we checkpoint the full closed-loop state — plant states, warm-start inputs,
multipliers, step index, RNG key — so a pod-scale run can resume after
preemption. Pytrees are saved as flat .npz archives (orbax-free: no extra
dependency, atomic single-file writes).
"""

from __future__ import annotations

import os
import tempfile
from typing import Any, Tuple

import jax
import numpy as np


def _flatten_with_paths(tree: Any):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    return flat, treedef


def save_checkpoint(path: str, tree: Any, step: int = 0) -> str:
    """Atomically save a pytree of arrays to ``path`` (.npz)."""
    flat, _ = _flatten_with_paths(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(flat)}
    arrays["__step__"] = np.asarray(step)
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".npz.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return path


def load_checkpoint(path: str, example_tree: Any) -> Tuple[Any, int]:
    """Load a pytree saved by :func:`save_checkpoint`; ``example_tree``
    provides the structure."""
    flat, treedef = _flatten_with_paths(example_tree)
    with np.load(path) as data:
        leaves = [data[f"leaf_{i}"] for i in range(len(flat))]
        step = int(data["__step__"])
    return jax.tree_util.tree_unflatten(treedef, leaves), step
