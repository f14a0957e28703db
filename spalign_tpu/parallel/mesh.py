"""Device mesh + sharding helpers: the framework's parallelism layer.

The reference's distributed backend is ChainerMN over MPI+NCCL — daemon
processes, scatter_dataset, multi-node optimizers, MultiNodeBatchNorm
(SURVEY.md §5.8).  The TPU-native equivalent is radically smaller: one
1-D ``data`` mesh, batches sharded over it, and jit/pjit inserting the
gradient/batch-stat reductions over ICI automatically.

Parallelism inventory (mirrors SURVEY.md §2.5):
  1. data-parallel training      -> batch sharded over mesh('data')
  2. synchronized batch norm     -> global-batch BN under pjit (free)
  3. inference sharding          -> same data_sharding on eval batches
  4. host pipeline parallelism   -> data.loader prefetch threads
TP/PP/EP/sequence parallelism are intentionally absent: the workload is a
CNN with no attention (SURVEY.md §5.7); the models fit on one chip.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None,
              axis: str = "data") -> Mesh:
    devices = jax.devices()
    n = len(devices) if num_devices is None else num_devices
    if n > len(devices):
        raise ValueError(f"requested {n} devices, only {len(devices)}")
    return Mesh(np.asarray(devices[:n]), (axis,))


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the mesh."""
    return NamedSharding(mesh, P(axis))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place every array leaf with its batch dim sharded over the mesh.

    Replaces chainermn.scatter_dataset + per-rank iterators
    (train_segnet.py:185-200): one logical batch, physically split."""
    n = mesh.shape[axis]
    for leaf in jax.tree.leaves(batch):
        if leaf.shape[0] % n != 0:
            raise ValueError(
                f"global batch dim {leaf.shape[0]} is not divisible by the "
                f"{n}-device '{axis}' mesh axis; pick a batch size that is "
                f"a multiple of the device count")
    sh = data_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
