"""Device mesh / sharding utilities.

The reference trains with DDP over NCCL (main.py:69-75); the TPU-native
equivalent is a 1-D data-parallel mesh over ICI: parameters replicated,
batch sharded on the leading axis, gradient all-reduce inserted by XLA
(GSPMD) inside the jitted train step.

The model is ~70M params, far below a single chip's HBM, so data parallelism
is the whole story for this workload (the reference has no TP/PP/SP either —
SURVEY.md §2.9).  ``make_mesh_2d`` + ``shard_params_tp`` additionally provide
a (data x model) layout with output-channel tensor parallelism for wider
deployments (exercised by the multi-chip dry-run and tests).
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


# ---------------------------------------------------------------------------
# 2-D (data x model) layouts — beyond the reference (DDP only): batch sharded
# over the data axis AND large parameter matrices channel-sharded over the
# model axis.  GSPMD propagates the shardings and inserts the all-gathers /
# reduce-scatters; no model code changes are needed.
# ---------------------------------------------------------------------------

def make_mesh_2d(data: int, model: int, data_axis: str = "data",
                 model_axis: str = "model", devices=None) -> Mesh:
    """(data x model) mesh; the model axis is innermost so tensor-parallel
    collectives ride the fastest ICI links."""
    if devices is None:
        devices = jax.devices()
    if len(devices) < data * model:
        raise ValueError(
            f"make_mesh_2d({data}, {model}) needs {data * model} devices, "
            f"have {len(devices)}")
    devices = np.asarray(devices[:data * model]).reshape(data, model)
    return Mesh(devices, (data_axis, model_axis))


def shard_params_tp(tree: Any, mesh: Mesh, model_axis: str = "model",
                    min_dim: int = 256) -> Any:
    """Tensor-parallel placement: shard the output-feature (last) axis of
    every parameter whose last dim is divisible by the model-axis size and
    at least ``min_dim``; everything else is replicated.  With the batch
    sharded over the data axis, GSPMD turns the annotated matmuls into
    per-shard matmuls + collectives."""
    n_model = mesh.shape[model_axis]

    def place(x):
        if (getattr(x, "ndim", 0) >= 2 and x.shape[-1] >= min_dim
                and x.shape[-1] % n_model == 0):
            spec = P(*([None] * (x.ndim - 1) + [model_axis]))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, tree)
