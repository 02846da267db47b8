"""Data-parallel mesh tests on the virtual 8-device CPU mesh."""

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
