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


def maybe_initialize_distributed(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host runtime init (the reference's dist.init_process_group,
    main.py:69-75).

    On TPU pods the arguments auto-detect from the environment, so
    ``jax.distributed.initialize()`` is called with no args whenever the
    environment looks multi-host; explicit args support CPU simulation.
    Returns True when running multi-process.  Safe to call twice and on a
    single host (no-op).
    """
    import os
    try:
        from jax._src import distributed as _dist
        if _dist.global_state.client is not None:
            return jax.process_count() > 1
    except Exception:
        pass
    explicit = coordinator is not None
    auto = any(v in os.environ for v in
               ("COORDINATOR_ADDRESS", "JAX_COORDINATOR_ADDRESS",
                "MEGASCALE_COORDINATOR_ADDRESS"))
    if not (explicit or auto):
        return False
    if explicit:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        return jax.process_count() > 1
    try:
        jax.distributed.initialize()
    except ValueError:
        # single-host environments can carry TPU env vars without a
        # resolvable coordinator; degrade to single-process
        return False
    return jax.process_count() > 1


def process_local_batch_size(global_batch: int) -> int:
    """Per-process slice of the global batch (the DistributedSampler role)."""
    P = jax.process_count()
    if global_batch % P != 0:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{P} processes")
    return global_batch // P


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
    """Place a host batch onto the mesh, sharded along the batch axis.

    Single-process: the whole global batch is local -> device_put per shard.
    Multi-process: each host holds only its slice of the global batch (the
    input pipeline stripes records by process, data/loader.py), so the
    global array is assembled from process-local shards
    (jax.make_array_from_process_local_data — the GSPMD replacement for the
    reference's DistributedSampler + DDP pairing, main.py:69-79).
    """
    sharding = batch_sharding(mesh, data_axis)
    if jax.process_count() > 1:
        P = jax.process_count()

        def put(x):
            x = np.asarray(x)
            global_shape = (x.shape[0] * P,) + x.shape[1:]
            return jax.make_array_from_process_local_data(
                sharding, x, global_shape)

        return jax.tree.map(put, batch)
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


def gather_to_host(tree: Any, mesh: Mesh) -> Any:
    """``jax.device_get`` with cross-process support.

    Leaves sharded over non-addressable devices (e.g. ZeRO-1 optimizer
    moments spanning a multi-host mesh) cannot be fetched directly —
    device_get raises.  Such trees are first collectively resharded to
    replicated (a jitted identity with replicated out_shardings; GSPMD
    inserts the all-gathers), then fetched.  COLLECTIVE when any leaf is
    non-addressable: every process must call it, and the all-gather is the
    barrier.  Fully-addressable trees (single-process, or replicated
    multi-host state) skip straight to device_get — no collective, safe to
    call from any subset of processes.
    """
    leaves = jax.tree.leaves(tree)
    if any(isinstance(l, jax.Array) and not l.is_fully_addressable
           for l in leaves):
        rep = NamedSharding(mesh, P())
        tree = jax.jit(lambda t: t, out_shardings=rep)(tree)
    return jax.device_get(tree)


def zero1_state_shardings(state: Any, mesh: Mesh, data_axis: str = "data",
                          min_elems: int = 2 ** 14) -> Any:
    """ZeRO-1-style placement for a TrainState: optimizer moments sharded
    over the DATA axis, everything else replicated.

    The reference replicates optimizer state per DDP rank (torch Adam under
    DDP); on TPU the same replication wastes HBM that data parallelism can
    reclaim: Adam's mu/nu are 2x the parameter bytes, and sharding their
    leading axis over the data mesh divides that by the mesh size.  GSPMD
    inserts the collectives (the moment update runs on each shard; the
    parameter update all-gathers the update slices) — no optimizer code
    changes.  Pass the result as ``make_train_step(state_sharding=...)`` so
    the updated state keeps the layout across steps.

    Leaves smaller than ``min_elems`` or with a leading axis not divisible
    by the mesh stay replicated (sharding tiny BN scales would cost more in
    collective latency than it saves).
    """
    n = mesh.shape[data_axis]
    rep = NamedSharding(mesh, P())

    def opt_place(x):
        if (getattr(x, "ndim", 0) >= 1 and x.shape[0] % n == 0
                and x.size >= min_elems):
            return NamedSharding(mesh, P(data_axis))
        return rep

    return type(state)(
        params=jax.tree.map(lambda _: rep, state.params),
        batch_stats=jax.tree.map(lambda _: rep, state.batch_stats),
        opt_state=jax.tree.map(opt_place, state.opt_state),
        step=rep,
    )


def place_state(state: Any, shardings: Any) -> Any:
    """device_put a state pytree onto per-leaf shardings (same structure)."""
    return jax.tree.map(jax.device_put, state, shardings)


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
