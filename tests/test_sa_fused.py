"""Fused set-abstraction eval path (ops/pallas_knn.sa_level{1,2}_pallas).

The ``knn_method='pallas_sa'`` eval path runs grouping + BN-folded PointMLP
+ max-pool inside one Pallas program per level.  These tests run the kernels
in interpreter mode (f32 compute) and assert parity with the generic
grouping + PointMLP + max path on the SAME parameter tree — i.e. the fusion
and the BatchNorm fold are exact up to f32 rounding.

Reference semantics under test: the PointNet_Plus set-abstraction stack
(/root/reference/lib/models/networks/intaghand_encoder.py:118-159) with
group_points ball-query substitution (lib/utils/utils.py:134-188).
"""

import flax
import jax
import jax.numpy as jnp
import numpy as np

from pdfnet_tpu.ops import grouping
from pdfnet_tpu.models.pointnet import PointNetPlus, _fold_point_mlp


def _make_inputs(seed=0, B=1, H=2, N=256, res=64):
    rng = np.random.RandomState(seed)
    points = jnp.asarray(rng.uniform(-0.1, 0.1, (B, H, N, 3)).astype(np.float32))
    choose = jnp.asarray(rng.randint(0, res * res, (B, H, N)).astype(np.int32))
    emb = [jnp.asarray(rng.randn(B, res, res, 3).astype(np.float32)),
           jnp.asarray(rng.randn(B, res // 2, res // 2, 64).astype(np.float32)),
           jnp.asarray(rng.randn(B, res // 4, res // 4, 256).astype(np.float32))]
    return points, choose, emb, rng


def _jitter_batch_stats(variables, rng):
    """Randomize BN running stats so the fold is non-trivial."""
    bs = flax.core.unfreeze(variables["batch_stats"])

    def rec(d):
        for k, v in d.items():
            if isinstance(v, dict):
                rec(v)
            elif k == "var":
                d[k] = v + jnp.asarray(rng.uniform(0.5, 2.0, v.shape), v.dtype)
            elif k == "mean":
                d[k] = v + jnp.asarray(rng.uniform(-0.3, 0.3, v.shape), v.dtype)

    rec(bs)
    return {"params": variables["params"], "batch_stats": bs}


def test_pointnet_fused_sa_matches_generic_eval(monkeypatch):
    """Full PointNetPlus eval forward: pallas_sa == topk path (<= 1e-5)."""
    monkeypatch.setattr(grouping, "_FUSED_INTERPRET", True)
    points, choose, emb, rng = _make_inputs()
    res = emb[0].shape[1]
    kw = dict(knn_k=8, num_level1=128, num_level2=128, ball_radius=0.015,
              ball_radius2=0.04, input_feature_num=3, resolution=res,
              gather_method="take", dtype=jnp.float32)
    ref = PointNetPlus(knn_method="topk", **kw)
    variables = ref.init({"params": jax.random.PRNGKey(0)},
                         points, emb, choose, False)
    variables = _jitter_batch_stats(variables, rng)

    out_ref = ref.apply(variables, points, emb, choose, False)
    out_sa = PointNetPlus(knn_method="pallas_sa", **kw).apply(
        variables, points, emb, choose, False)
    np.testing.assert_allclose(np.asarray(out_sa), np.asarray(out_ref),
                               atol=1e-5, rtol=1e-5)


def test_pointnet_fused_sa_param_tree_identical(monkeypatch):
    """init through the fused branch creates the exact same variable tree
    (the dummy-probe calls materialize every Dense/BN param)."""
    monkeypatch.setattr(grouping, "_FUSED_INTERPRET", True)
    points, choose, emb, _ = _make_inputs(seed=1)
    res = emb[0].shape[1]
    kw = dict(knn_k=8, num_level1=128, num_level2=128, ball_radius=0.015,
              ball_radius2=0.04, input_feature_num=3, resolution=res,
              gather_method="take", dtype=jnp.float32)
    v_ref = PointNetPlus(knn_method="topk", **kw).init(
        {"params": jax.random.PRNGKey(0)}, points, emb, choose, False)
    v_sa = PointNetPlus(knn_method="pallas_sa", **kw).init(
        {"params": jax.random.PRNGKey(0)}, points, emb, choose, False)
    ref_shapes = jax.tree.map(lambda a: a.shape, v_ref)
    sa_shapes = jax.tree.map(lambda a: a.shape, v_sa)
    assert ref_shapes == sa_shapes


def test_fold_point_mlp_matches_bn_eval():
    """The BN fold reproduces Dense+BatchNorm(eval)+relu exactly."""
    from pdfnet_tpu.models.pointnet import PointMLP

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(4, 7, 16).astype(np.float32))
    mlp = PointMLP((8, 12, 8), dtype=jnp.float32)
    variables = mlp.init({"params": jax.random.PRNGKey(0)}, x, False)
    variables = _jitter_batch_stats(variables, rng)
    out_ref = mlp.apply(variables, x, False)

    folded = mlp.bind(variables)  # bound copy exposes .variables
    pairs = _fold_point_mlp(folded)
    h = x
    for w, b in pairs:
        h = jnp.maximum(h @ w + b, 0.0)
    np.testing.assert_allclose(np.asarray(h), np.asarray(out_ref),
                               atol=1e-5, rtol=1e-5)
