"""Parity tests for the ops layer vs recorded reference outputs."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdfnet_tpu import ops

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


def _sort_neighbors(grouped_bskc):
    """Canonicalize neighbor order along K by lexicographic feature sort.

    The reference's topk(sorted=False) neighbor order is arbitrary; the
    model is permutation-invariant along K, so parity is tested on the
    neighbor *set*.
    """
    B, S, K, C = grouped_bskc.shape
    out = np.empty_like(grouped_bskc)
    for b in range(B):
        for s in range(S):
            rows = grouped_bskc[b, s]
            keys = tuple(rows[:, c] for c in reversed(range(C)))
            out[b, s] = rows[np.lexsort(keys)]
    return out


def test_group_points_matches_reference():
    g = np.load(os.path.join(GOLDENS, "grouping.npz"))
    pts = g["points"]                                  # (B, 1024, 3)
    grouped, centers = jax.jit(
        lambda p: ops.group_points(p, k=64, num_centers=512, radius2=0.015)
    )(pts)
    # reference layouts: level1 (B, 3, 512, 64), center (B, 3, 512, 1)
    ref = np.transpose(g["level1"], (0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(centers),
                               g["level1_center"][:, :, :, 0].transpose(0, 2, 1),
                               atol=1e-7)
    np.testing.assert_allclose(_sort_neighbors(np.asarray(grouped)),
                               _sort_neighbors(ref), atol=1e-6)


def test_group_points_level2_matches_reference():
    g = np.load(os.path.join(GOLDENS, "grouping.npz"))
    feat = np.transpose(g["feat2"], (0, 2, 1))          # (B, 512, 131)
    grouped, centers = jax.jit(
        lambda f: ops.group_points_level2(f, num_centers=128, k=64, radius2=0.04)
    )(feat)
    ref = np.transpose(g["level2"], (0, 2, 3, 1))       # (B, 128, 64, 131)
    np.testing.assert_allclose(np.asarray(centers),
                               g["level2_center"][:, :, :, 0].transpose(0, 2, 1),
                               atol=1e-7)
    np.testing.assert_allclose(_sort_neighbors(np.asarray(grouped)),
                               _sort_neighbors(ref), atol=1e-6)


def test_cheb_conv_matches_reference():
    g = np.load(os.path.join(GOLDENS, "cheb.npz"))
    y = jax.jit(lambda x, L, W, b: ops.cheb_conv(x, L, W, b, K=2))(
        g["x"], g["L"], g["W"], g["b"])
    np.testing.assert_allclose(np.asarray(y), g["y"], atol=1e-5)


def test_backproject_matches_reference():
    g = np.load(os.path.join(GOLDENS, "geometry.npz"))
    K_inv = np.linalg.inv(g["K"])
    pts = jax.jit(ops.backproject_depth)(g["depth"], K_inv)
    # reference layout: (3, H, W)
    np.testing.assert_allclose(np.asarray(pts).transpose(2, 0, 1),
                               g["points"], atol=1e-5)


def test_orthographic_matches_reference():
    g = np.load(os.path.join(GOLDENS, "geometry.npz"))
    proj = jax.jit(lambda s, t, p: ops.orthographic_project(s, t, p, 384))(
        g["scale"], g["trans2d"], g["label3d"])
    np.testing.assert_allclose(np.asarray(proj), g["proj"], atol=1e-4)


def test_heatmap_decode_picks_peak():
    hm = np.full((2, 96, 96, 2), 0.01, np.float32)
    hm[0, 10, 20, 0] = 0.9   # left peak
    hm[0, 30, 40, 1] = 0.8   # right peak
    hm[1, 5, 6, 0] = 0.7
    hm[1, 7, 8, 1] = 0.6
    inds = np.asarray(jax.jit(ops.decode_centers)(jnp.asarray(hm)))
    assert inds[0, 0] == 10 * 96 + 20
    assert inds[0, 1] == 30 * 96 + 40
    assert inds[1, 0] == 5 * 96 + 6
    assert inds[1, 1] == 7 * 96 + 8


def test_gather_pixels():
    rng = np.random.RandomState(0)
    fmap = rng.randn(2, 8, 8, 5).astype(np.float32)
    ind = np.array([[3, 17], [63, 0]], np.int64)
    out = np.asarray(ops.gather_pixels(jnp.asarray(fmap), jnp.asarray(ind)))
    flat = fmap.reshape(2, 64, 5)
    for b in range(2):
        for k in range(2):
            np.testing.assert_array_equal(out[b, k], flat[b, ind[b, k]])


def test_gather_pixels_2d_matches_flat():
    """gather_pixels_2d (row/col indexing, no relayout copy) is bit-identical
    to gather_pixels; it is the pointnet pyramid-gather fast path."""
    from pdfnet_tpu.ops.gather import gather_pixels_2d
    rng = np.random.RandomState(7)
    fmap = rng.randn(3, 6, 9, 4).astype(np.float32)
    ind = rng.randint(0, 6 * 9, (3, 11)).astype(np.int64)
    a = np.asarray(ops.gather_pixels(jnp.asarray(fmap), jnp.asarray(ind)))
    b = np.asarray(gather_pixels_2d(jnp.asarray(fmap), jnp.asarray(ind)))
    np.testing.assert_array_equal(a, b)


def test_gather_patches_matches_padded_slice():
    """gather_patches == pad-the-whole-map + dynamic_slice, including
    window centers at the map borders (zero padding outside)."""
    from pdfnet_tpu.ops.gather import gather_patches
    rng = np.random.RandomState(1)
    H = W = 8
    fmap = rng.randn(2, H, W, 6).astype(np.float32)
    # corners, edges, interior
    ind = np.array([[0, 7, 3 * W + 4], [H * W - 1, 2 * W, 5 * W + 7]], np.int64)
    for size in (3, 5):
        r = size // 2
        out = np.asarray(gather_patches(jnp.asarray(fmap), jnp.asarray(ind),
                                        size))
        padded = np.pad(fmap, ((0, 0), (r, r), (r, r), (0, 0)))
        for b in range(ind.shape[0]):
            for k in range(ind.shape[1]):
                y, x = divmod(ind[b, k], W)
                ref = padded[b, y:y + size, x:x + size]
                np.testing.assert_array_equal(out[b, k], ref,
                                              err_msg=f"size={size} b={b} k={k}")


def test_resize_align_corners_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    x = rng.randn(2, 12, 12, 3).astype(np.float32)
    y = np.asarray(ops.resize_bilinear_align_corners(jnp.asarray(x), 24, 24))
    with torch.no_grad():
        ref = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                            scale_factor=2, mode="bilinear", align_corners=True)
    np.testing.assert_allclose(y, ref.numpy().transpose(0, 2, 3, 1), atol=1e-5)


def test_crop_and_resize_identity_and_grad():
    rng = np.random.RandomState(2)
    img = rng.randn(1, 16, 16, 2).astype(np.float32)
    boxes = np.array([[0.0, 0.0, 1.0, 1.0]], np.float32)
    box_ind = np.array([0], np.int32)
    out = np.asarray(ops.crop_and_resize(jnp.asarray(img), jnp.asarray(boxes),
                                         jnp.asarray(box_ind), 16, 16))
    np.testing.assert_allclose(out, img, atol=1e-5)

    def f(im):
        return jnp.sum(ops.crop_and_resize(im, jnp.asarray(boxes),
                                           jnp.asarray(box_ind), 8, 8) ** 2)

    g = np.asarray(jax.grad(f)(jnp.asarray(img)))
    assert np.isfinite(g).all() and np.abs(g).sum() > 0


def test_fps_spreads_points():
    pts = np.zeros((64, 3), np.float32)
    pts[:32, 0] = np.linspace(0, 1, 32)
    pts[32:, 1] = np.linspace(0, 1, 32)
    idx = np.asarray(ops.farthest_point_sampling(jnp.asarray(pts), 8))
    assert len(np.unique(idx)) == 8
    # the two extreme arms must both be represented
    sel = pts[idx]
    assert sel[:, 0].max() > 0.9 and sel[:, 1].max() > 0.9


def test_depth_normals_flat_plane():
    """Normals of a fronto-parallel plane must be +-z."""
    H = W = 32
    K = np.array([[100.0, 0, 16], [0, 100.0, 16], [0, 0, 1]], np.float32)
    depth = np.full((H, W), 0.5, np.float32)
    pts = ops.backproject_depth(jnp.asarray(depth), jnp.asarray(np.linalg.inv(K)))
    n = np.asarray(ops.depth_normals(pts))
    inner = n[8:-8, 8:-8]  # away from the zero-padded border
    assert np.all(np.abs(inner[..., 2]) > 0.99)


def test_fused_pallas_grouping_interpret():
    """Fused kernel output == generic grouping path (interpret mode)."""
    from pdfnet_tpu.ops.pallas_knn import knn_gather_xyz_pallas

    rng = np.random.RandomState(5)
    B, N, S, K = 2, 256, 128, 16
    r2 = 0.015
    pts = jnp.asarray(rng.normal(0, 0.05, (B, N, 3)).astype(np.float32))
    dist, idx, nbr = knn_gather_xyz_pallas(pts[:, :S], pts, K, interpret=True)
    grouped_fused = jnp.where((dist <= r2)[..., None], nbr, 0.0)
    grouped_ref, centers = ops.group_points(pts, k=K, num_centers=S,
                                            radius2=r2)
    np.testing.assert_allclose(np.asarray(grouped_fused),
                               np.asarray(grouped_ref), atol=1e-6)


def test_fused_grouping_backward_matches_autodiff():
    """Custom VJP of the fused grouping == autodiff of the generic path."""
    from pdfnet_tpu.ops import grouping

    rng = np.random.RandomState(6)
    B, N, S, K = 1, 64, 32, 8
    r2 = 0.02
    pts = jnp.asarray(rng.normal(0, 0.05, (B, N, 3)).astype(np.float32))
    g = jnp.asarray(rng.randn(B, S, K, 3).astype(np.float32))

    def generic(p):
        grouped, _ = grouping.group_points(p, k=K, num_centers=S, radius2=r2)
        return jnp.sum(grouped * g)

    d_ref = jax.grad(generic)(pts)

    idx, valid = grouping.knn_ball_query(pts[:, :S], pts, K, r2, "topk")
    d_fused = grouping._fused_group_bwd(K, S, r2, (idx, valid, pts.shape),
                                        g)[0]
    np.testing.assert_allclose(np.asarray(d_fused), np.asarray(d_ref),
                               atol=1e-5)


def test_fused_grouping_grad_through_group_points(monkeypatch):
    """jax.grad through group_points(knn_method='pallas_fused') — exercises
    the defvjp registration and residual plumbing end to end."""
    from pdfnet_tpu.ops import grouping

    monkeypatch.setattr(grouping, "_FUSED_INTERPRET", True)
    rng = np.random.RandomState(7)
    B, N, S, K = 1, 256, 128, 8
    r2 = 0.02
    pts = jnp.asarray(rng.normal(0, 0.05, (B, N, 3)).astype(np.float32))
    g = jnp.asarray(rng.randn(B, S, K, 3).astype(np.float32))

    def fused(p):
        grouped, _ = grouping.group_points(p, k=K, num_centers=S, radius2=r2,
                                           knn_method="pallas_fused")
        return jnp.sum(grouped * g)

    def generic(p):
        grouped, _ = grouping.group_points(p, k=K, num_centers=S, radius2=r2)
        return jnp.sum(grouped * g)

    np.testing.assert_allclose(float(fused(pts)), float(generic(pts)),
                               rtol=1e-6)
    d_fused = jax.grad(fused)(pts)
    d_ref = jax.grad(generic)(pts)
    np.testing.assert_allclose(np.asarray(d_fused), np.asarray(d_ref),
                               atol=1e-5)


def test_fused_level2_grouping_and_grad(monkeypatch):
    """Fused feature-gather kernel: forward parity + VJP vs autodiff."""
    from pdfnet_tpu.ops import grouping

    monkeypatch.setattr(grouping, "_FUSED_INTERPRET", True)
    rng = np.random.RandomState(8)
    B, N, C, S, K = 1, 256, 35, 128, 8
    r2 = 0.02
    feat = rng.normal(0, 0.3, (B, N, C)).astype(np.float32)
    feat[:, :, :3] = rng.normal(0, 0.05, (B, N, 3))
    feat = jnp.asarray(feat)
    g = jnp.asarray(rng.randn(B, S, K, C).astype(np.float32))

    def fused(f):
        grouped, _ = grouping.group_points_level2(
            f, num_centers=S, k=K, radius2=r2, knn_method="pallas_fused")
        return jnp.sum(grouped * g)

    def generic(f):
        grouped, _ = grouping.group_points_level2(
            f, num_centers=S, k=K, radius2=r2)
        return jnp.sum(grouped * g)

    np.testing.assert_allclose(float(fused(feat)), float(generic(feat)),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(jax.grad(fused)(feat)),
                               np.asarray(jax.grad(generic)(feat)),
                               atol=1e-4)


def test_host_normals_match_device_twin():
    """data.cloud.normals_at_indices_np must agree with
    ops.geometry.depth_normals (reference get_normal, utils.py:264-310) at
    every sampled pixel, including zero-padded borders."""
    import jax.numpy as jnp
    from pdfnet_tpu.data.cloud import backproject_np, normals_at_indices_np
    from pdfnet_tpu.ops.geometry import backproject_depth, depth_normals

    rng = np.random.RandomState(3)
    H = W = 48
    depth = rng.uniform(0.4, 0.6, (H, W)).astype(np.float32)
    # smooth it a little and punch mask holes (masked hand depth has zeros)
    depth[rng.uniform(size=(H, W)) < 0.3] = 0.0
    K = np.array([[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32)

    pts_host = backproject_np(depth, K)
    idx = rng.choice(H * W, 256, replace=False).astype(np.int64)
    n_host = normals_at_indices_np(pts_host, idx)

    pts_dev = backproject_depth(jnp.asarray(depth),
                                jnp.asarray(np.linalg.inv(K)))
    n_dev = np.asarray(depth_normals(pts_dev)).reshape(-1, 3)[idx]
    np.testing.assert_allclose(n_host, n_dev, atol=2e-3)
