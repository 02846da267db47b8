"""Data-parallel mesh tests on the virtual 8-device CPU mesh."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdfnet_tpu.parallel import mesh as mesh_lib


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_shard_batch_layout():
    mesh = mesh_lib.make_mesh()
    batch = {"x": np.arange(16 * 3, dtype=np.float32).reshape(16, 3)}
    sharded = mesh_lib.shard_batch(batch, mesh)
    shards = sharded["x"].addressable_shards
    assert len(shards) == 8
    assert shards[0].data.shape == (2, 3)
    np.testing.assert_array_equal(np.asarray(sharded["x"]), batch["x"])


def test_replicated_params():
    mesh = mesh_lib.make_mesh()
    p = mesh_lib.replicate({"w": jnp.ones((4, 4))}, mesh)
    shards = p["w"].addressable_shards
    assert len(shards) == 8
    for s in shards:
        assert s.data.shape == (4, 4)


def test_psum_over_mesh():
    """Gradient-style reduction across the data axis compiles + is correct."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    mesh = mesh_lib.make_mesh()
    x = jnp.arange(8.0)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))

    @jax.jit
    def total(v):
        return jnp.sum(v)  # GSPMD inserts the cross-device reduction

    assert float(total(xs)) == 28.0


def test_multichip_dryrun():
    """The driver's full multi-chip training-step dry run."""
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_2d_mesh_tensor_parallel_matmul():
    """(data x model) mesh: channel-sharded weight + batch-sharded input;
    GSPMD inserts the collectives and the result matches single-device."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = mesh_lib.make_mesh_2d(4, 2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    rng = np.random.RandomState(0)
    x = rng.randn(8, 512).astype(np.float32)
    w = rng.randn(512, 256).astype(np.float32)
    ref = x @ w
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ws = mesh_lib.shard_params_tp({"w": jnp.asarray(w)}, mesh)["w"]
    assert ws.sharding.spec == P(None, "model")
    out = jax.jit(lambda a, b: a @ b)(xs, ws)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5)


def test_2d_mesh_train_step_matches_dp():
    """One full training step on a (4 x 2) data x model mesh: tensor-parallel
    param placement compiles under GSPMD and reproduces the 1-D data-parallel
    loss."""
    import jax.numpy as jnp
    from pdfnet_tpu.config import Config
    from pdfnet_tpu.data.synthetic import make_batch
    from pdfnet_tpu.models import build_model
    from pdfnet_tpu.train.loss import load_loss_consts
    from pdfnet_tpu.train.step import (create_train_state, lr_at_epoch,
                                       make_train_step)

    cfg = Config(default_resolution=64, compute_dtype="float32",
                 sample_num=64, sample_num_level1=32, sample_num_level2=8,
                 knn_k=8, batch_size=8)
    model = build_model(cfg)
    consts = load_loss_consts()
    batch = make_batch(cfg, 8, seed=0)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), jb)
    step = make_train_step(cfg, model, consts, donate=False)
    lr = jnp.asarray(lr_at_epoch(cfg, 0), jnp.float32)
    rng = jax.random.PRNGKey(1)

    # 1-D data-parallel baseline
    mesh1 = mesh_lib.make_mesh(8)
    s1 = mesh_lib.replicate(state, mesh1)
    b1 = mesh_lib.shard_batch(jb, mesh1)
    _, stats1 = step(s1, b1, jnp.asarray(0), lr, rng)

    # 2-D: batch over data, large param matrices channel-sharded over model
    mesh2 = mesh_lib.make_mesh_2d(4, 2)
    s2 = state.replace(
        params=mesh_lib.shard_params_tp(state.params, mesh2),
        batch_stats=mesh_lib.replicate(state.batch_stats, mesh2),
        opt_state=mesh_lib.replicate(state.opt_state, mesh2),
        step=mesh_lib.replicate(state.step, mesh2))
    b2 = mesh_lib.shard_batch(jb, mesh2)
    new2, stats2 = step(s2, b2, jnp.asarray(0), lr, rng)
    np.testing.assert_allclose(float(stats2["loss"]), float(stats1["loss"]),
                               rtol=1e-4)
    assert int(new2.step) == 1


def test_sharded_eval_matches_single_device():
    """Trainer.evaluate shards eval batches over the data mesh (the
    reference evaluates on rank 0 only); metrics must equal the 1-device
    run including the padded tail sub-batch."""
    from pdfnet_tpu.config import Config
    from pdfnet_tpu.data.synthetic import SyntheticHandDataset
    from pdfnet_tpu.train.trainer import Trainer

    cfg = Config(default_resolution=64, compute_dtype="float32",
                 sample_num=64, sample_num_level1=32, sample_num_level2=8,
                 knn_k=8, batch_size=8, eval_batch_size=8)
    data = SyntheticHandDataset(cfg, size=10, seed=3, train=False)
    first = next(iter(data.batches(8)))

    accs = []
    for n_dev in (8, 1):
        tr = Trainer(cfg, mesh=mesh_lib.make_mesh(n_dev))
        tr.init_state(first, seed=11)
        # 10 samples at bs=8 -> one full batch + a padded tail of 2
        accs.append(tr.evaluate(data.batches(8)).result())
    a8, a1 = accs
    assert a8.keys() == a1.keys()
    for k in a8:
        # GSPMD sharding changes XLA's fusion/accumulation choices; f32
        # forward outputs drift ~3e-5 relative between layouts
        np.testing.assert_allclose(a8[k], a1[k], rtol=1e-4, atol=1e-5,
                                   err_msg=k)


def test_two_process_cpu_multihost_simulation():
    """Full multi-host wiring on one machine: 2 OS processes x 2 virtual CPU
    devices, jax.distributed rendezvous, loader striping, global-array
    assembly, cross-process jitted reduction (reference main.py:69-79)."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env.pop("JAX_PLATFORMS", None)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen([sys.executable, worker, str(i), str(port)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-host simulation timed out:\n" + "\n".join(outs))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i} multihost ok" in out, out
