"""Fused eval-time resnet bottleneck blocks (ops/pallas_trunk.py).

``Config.fused_trunk`` runs the first three ResNet-50 stages through a
Pallas program per residual block at inference (BN folded into the convs,
one HBM read + one write per block).  These tests run the kernels in
interpreter mode and assert parity with the flax Bottleneck path on the
SAME parameter tree.  Matmul precision is pinned to HIGHEST for the
comparison: at the default (bf16-class) precision both paths are only
~1e-3 reproducible against themselves, which would hide real bugs.

Reference semantics under test: the torchvision Bottleneck trunk the
encoder taps (/root/reference/lib/models/networks/resnet.py:40-230,
intaghand_encoder.py:712-729).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdfnet_tpu.models.resnet import Bottleneck, ResNet
from pdfnet_tpu.ops import pallas_trunk
from pdfnet_tpu.ops.pallas_trunk import fold_bottleneck, fused_bottleneck


def _random_variables(module, x, rng):
    vs = module.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    stats = jax.tree.map(
        lambda a: jnp.asarray(rng.uniform(0.5, 1.5, a.shape)
                              .astype(np.float32)), vs["batch_stats"])
    params = jax.tree.map(
        lambda a: jnp.asarray((rng.randn(*a.shape) * 0.1)
                              .astype(np.float32)), vs["params"])
    return {"params": params, "batch_stats": stats}


@pytest.mark.parametrize(
    "cin,width,hw,stride,project",
    [(64, 64, 24, 1, True),      # layer1 block0 (projected, stride 1)
     (256, 64, 24, 1, False),    # layer1 block1
     (256, 128, 24, 2, True),    # layer2 block0 (stride 2)
     (512, 128, 12, 1, False),   # layer2 block1 at small spatial
     (64, 64, 96, 1, True),      # full-size layer1 block0 (multi-tile)
     (256, 128, 96, 2, True),    # full-size layer2 block0 (multi-tile)
     (512, 256, 48, 2, True),    # layer3 block0
     (1024, 256, 24, 1, False)])  # layer3 block1
def test_fused_block_matches_flax(cin, width, hw, stride, project):
    rng = np.random.RandomState(0)
    blk = Bottleneck(width=width, stride=stride, project=project)
    x = jnp.asarray(rng.randn(2, hw, hw, cin).astype(np.float32))
    variables = _random_variables(blk, x, rng)
    with jax.default_matmul_precision("highest"):
        ref = blk.apply(variables, x, train=False)
        folded = fold_bottleneck(variables["params"],
                                 variables["batch_stats"])
        got = fused_bottleneck(x, folded, stride=stride, project=project,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_fused_trunk_matches_flax_resnet(monkeypatch):
    """Full ResNet-50 forward: fused_eval == flax path on all 5 outputs."""
    monkeypatch.setattr(pallas_trunk, "_TRUNK_INTERPRET", True)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 96, 96, 3).astype(np.float32))
    variables = _random_variables(ResNet(), x, rng)
    with jax.default_matmul_precision("highest"):
        ref = ResNet().apply(variables, x, train=False)
        got = ResNet(fused_eval=True).apply(variables, x, train=False)
    assert len(ref) == len(got) == 5
    for a, b in zip(ref, got):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, rtol=1e-5)


def test_fused_trunk_ignored_at_train_and_init(monkeypatch):
    """fused_eval must not change the variable tree, and train-mode apply
    keeps the flax path (live BatchNorm statistics get updated)."""
    monkeypatch.setattr(pallas_trunk, "_TRUNK_INTERPRET", True)
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 48, 48, 3).astype(np.float32))
    v_ref = ResNet().init({"params": jax.random.PRNGKey(0)}, x, train=False)
    v_fused = ResNet(fused_eval=True).init({"params": jax.random.PRNGKey(0)},
                                           x, train=False)
    assert (jax.tree.map(lambda a: a.shape, v_ref)
            == jax.tree.map(lambda a: a.shape, v_fused))

    with jax.default_matmul_precision("highest"):
        out_ref, mut_ref = ResNet().apply(
            v_ref, x, train=True, mutable=["batch_stats"])
        out_fused, mut_fused = ResNet(fused_eval=True).apply(
            v_ref, x, train=True, mutable=["batch_stats"])
    for a, b in zip(out_ref, out_fused):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-6, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(mut_ref), jax.tree.leaves(mut_fused)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=1e-6, rtol=1e-6)


def test_s2d_stem_matches_conv7x7():
    """s2d_stem computes the exact same stem (same (7,7,3,64) parameter)
    as the standard 7x7/stride-2 conv — checkpoint-compatible rewrite."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    variables = ResNet().init({"params": jax.random.PRNGKey(0)}, x,
                              train=False)
    with jax.default_matmul_precision("highest"):
        ref = ResNet().apply(variables, x, train=False)
        got = ResNet(s2d_stem=True).apply(variables, x, train=False)
    for a, b in zip(ref, got):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=2e-5, rtol=1e-5)
