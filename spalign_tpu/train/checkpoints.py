"""Checkpoint / resume.

Reference behavior (SURVEY.md §5.4): full trainer-state snapshots
(model + optimizer + updater) every val_interval as snapshot_iter_N,
rank-0 only (train_segnet.py:281-283); resume restores the whole trainer
(:305-306); inference loads only the predictor subtree
(labels_from_segnet.py:50-51).

Here: the whole TrainState pytree (step, params, batch_stats, opt_state)
is serialized per snapshot; ``load_predictor`` returns just the model
variables.  Orbax is used when available for async-safe writes, with a
self-contained pickle fallback.
"""

from __future__ import annotations

import glob
import os
import re
from typing import Optional

import jax
import numpy as np

from spalign_tpu.convert.pth_to_jax import load_pytree, save_pytree


def snapshot_path(result_dir: str, step: int) -> str:
    return os.path.join(result_dir, f"snapshot_iter_{step}")


def save_snapshot(result_dir: str, step: int, state,
                  backend: str = "pytree") -> str:
    """backend='pytree' (default): self-contained single-file format.
    backend='orbax': orbax-checkpoint directory (atomic, async-safe) —
    for production deployments with shared filesystems."""
    os.makedirs(result_dir, exist_ok=True)
    path = snapshot_path(result_dir, step)
    host_state = jax.tree.map(np.asarray, state)
    if backend == "orbax":
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(os.path.abspath(path) + ".orbax", host_state,
                       force=True)
        return path + ".orbax"
    save_pytree(host_state, path)
    return path


def load_snapshot(path: str, template=None):
    """Restore a snapshot.  Orbax directories need a ``template`` state
    (e.g. from create_train_state) for structure/dtype resolution."""
    if path.endswith(".orbax") or os.path.isdir(path):
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            if template is not None:
                import jax as _jax

                abstract = _jax.tree.map(
                    lambda x: _jax.ShapeDtypeStruct(np.shape(x),
                                                    np.asarray(x).dtype),
                    template)
                return ckptr.restore(os.path.abspath(path), abstract)
            return ckptr.restore(os.path.abspath(path))
    return load_pytree(path)


def load_predictor(path: str) -> dict:
    """Predictor-only view of a snapshot (params + batch_stats)."""
    state = load_pytree(path)
    return {"params": state.params, "batch_stats": state.batch_stats}


def find_snapshot(result_dir: str, step: Optional[int] = None) -> str:
    """Locate snapshot_iter_{step}, or the latest when step is None
    (the round driver's lookup, labels_from_segnet.py:38-41)."""
    snaps = glob.glob(os.path.join(result_dir, "snapshot_iter_*"))
    if not snaps:
        raise FileNotFoundError(f"no snapshots in {result_dir}")
    if step is not None:
        path = snapshot_path(result_dir, step)
        if path in snaps:
            return path
        raise FileNotFoundError(path)
    return max(snaps, key=lambda p: int(
        re.search(r"snapshot_iter_(\d+)$", p).group(1)))


class SnapshotCallback:
    """checkpointer(step, state) hook for Trainer.fit."""

    def __init__(self, result_dir: str, keep_last: Optional[int] = None):
        self.result_dir = result_dir
        self.keep_last = keep_last

    def __call__(self, step: int, state):
        save_snapshot(self.result_dir, step, state)
        if self.keep_last:
            snaps = sorted(
                glob.glob(os.path.join(self.result_dir, "snapshot_iter_*")),
                key=lambda p: int(re.search(r"(\d+)$", p).group(1)))
            for p in snaps[: -self.keep_last]:
                os.remove(p)
