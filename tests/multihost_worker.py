"""Worker process for the 2-process CPU multi-host simulation test.

Each of the 2 processes exposes 2 virtual CPU devices (4 global) and
exercises the full multi-host data-parallel path: jax.distributed init,
per-process record striping, global-array assembly from process-local
shards, and a cross-process jitted reduction (the role of the reference's
DDP/NCCL + DistributedSampler stack, main.py:69-79).
"""

import os
import sys


def main():
    pid, port = int(sys.argv[1]), sys.argv[2]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from pdfnet_tpu.data.loader import iter_batches
    from pdfnet_tpu.parallel import mesh as mesh_lib

    assert mesh_lib.maybe_initialize_distributed(f"localhost:{port}", 2, pid)
    assert jax.process_count() == 2 and jax.device_count() == 4

    # loader striping: process p sees records p, p+2, p+4, ...
    fetch = lambda i: {"x": np.full((3,), i, np.float32)}
    batches = list(iter_batches(fetch, 8, 2, shuffle=False,
                                process_index=pid, process_count=2))
    ids = sorted(int(b["x"][j, 0]) for b in batches for j in range(2))
    assert ids == [pid, pid + 2, pid + 4, pid + 6], ids

    assert mesh_lib.process_local_batch_size(8) == 4

    # global batch 4 assembled from 2-row process-local shards
    mesh = mesh_lib.make_mesh()
    local = np.stack([np.full((3,), pid * 2 + k, np.float32)
                      for k in range(2)])
    gb = mesh_lib.shard_batch({"x": local}, mesh)
    assert gb["x"].shape == (4, 3), gb["x"].shape

    # jitted cross-process reduction over the sharded global array
    total = jax.jit(jnp.sum)(gb["x"])
    expect = float(sum(range(4)) * 3)
    assert abs(float(total) - expect) < 1e-6, (float(total), expect)

    # striped eval + MetricAccumulator.all_reduce: each process scores only
    # its stripe of a 10-record synthetic split; after the cross-process
    # merge the metrics and the H2O submission must equal a single-process
    # pass over all records (trainer.fit's striped-eval scheme)
    from pdfnet_tpu.train.metrics import MetricAccumulator

    def record(i):
        r = np.random.RandomState(100 + i)
        out = {"joints_pred": r.randn(1, 2, 21, 3).astype(np.float32),
               "joints_gt": r.randn(1, 2, 21, 3).astype(np.float32)}
        for k in ("verts_pred", "verts_gt"):
            out[k] = r.randn(1, 2, 778, 3).astype(np.float32)
        for k in ("joints_pred_off", "joints_gt_off"):
            out[k] = r.randn(1, 2, 21, 3).astype(np.float32)
        for k in ("verts_pred_off", "verts_gt_off"):
            out[k] = r.randn(1, 2, 778, 3).astype(np.float32)
        out["lms21_pred"] = r.randn(1, 2, 21, 2).astype(np.float32)
        batch = {"lms_left_gt": r.randn(1, 21, 2).astype(np.float32),
                 "lms_right_gt": r.randn(1, 21, 2).astype(np.float32),
                 "id": np.array([i % 3]), "frame_num": np.array([i])}
        return out, batch

    # gather_to_host on a cross-process-sharded tree (the zero1 checkpoint
    # path, trainer.save/load): each process holds 2 of 4 row-shards; the
    # collective reshard must hand EVERY process the full value
    from jax.sharding import NamedSharding, PartitionSpec
    full = np.arange(4 * 3, dtype=np.float32).reshape(4, 3)
    sharded = jax.make_array_from_process_local_data(
        NamedSharding(mesh, PartitionSpec("data")), full[pid * 2:pid * 2 + 2],
        full.shape)
    assert not sharded.is_fully_addressable
    host = mesh_lib.gather_to_host({"mu": sharded}, mesh)
    np.testing.assert_array_equal(host["mu"], full)

    acc = MetricAccumulator()
    for i in range(pid, 10, 2):                     # this process's stripe
        out, batch = record(i)
        acc.update(out, batch)
    partial_count = acc.count
    assert partial_count == 5.0
    acc.all_reduce()

    ref = MetricAccumulator()                       # full split, one pass
    for i in range(10):
        out, batch = record(i)
        ref.update(out, batch)
    assert acc.count == ref.count == 10.0
    for k, v in ref.result().items():
        got = acc.result()[k]
        assert abs(got - v) < 1e-4 * max(abs(v), 1.0), (k, got, v)
    assert acc._action_lists == ref._action_lists, "submission merge differs"
    print(f"proc {pid} multihost ok", flush=True)


if __name__ == "__main__":
    main()
