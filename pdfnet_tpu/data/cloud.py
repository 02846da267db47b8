"""Host-side (numpy) depth -> per-hand point-cloud sampling for the data
pipeline.

Mirrors the training-time sampling in the reference dataset
(interhand.py:758-905): band filtering around the mean hand depth, random
subset / wrap padding to a fixed point count, validity demotion when a hand
has too few depth pixels.  The jittable device-side equivalent lives in
``pdfnet_tpu.ops.pointcloud`` (test-time path).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

Z_MIN, Z_MAX = 0.2, 2.5
BAND = 0.08


def backproject_np(depth: np.ndarray, K: np.ndarray) -> np.ndarray:
    """(H, W) depth + (3, 3) K -> (H, W, 3) xyz."""
    H, W = depth.shape
    xx, yy = np.meshgrid(np.arange(W, dtype=np.float32),
                         np.arange(H, dtype=np.float32))
    pix = np.stack([xx, yy, np.ones_like(xx)], axis=-1)
    rays = pix @ np.linalg.inv(K).T.astype(np.float32)
    return rays * depth[..., None]


def normals_at_indices_np(points: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """LS plane-fit surface normals at flat pixel indices of an (H, W, 3) map.

    Host twin of ``pdfnet_tpu.ops.geometry.depth_normals`` (reference
    get_normal, lib/utils/utils.py:264-310): 5x5 dilation-2 neighborhood
    ({-4,-2,0,2,4}^2 offsets), zero padding, determinant-guarded A^T A
    solve against ones, L2 normalize.  Computing only at the ``idx`` sample
    locations instead of the full map (the reference solves all H*W pixels
    then gathers) is exact and ~140x cheaper at 1024 samples on 384^2.
    """
    H, W, _ = points.shape
    p = np.pad(points, ((4, 4), (4, 4), (0, 0)))
    ys, xs = idx // W + 4, idx % W + 4
    offs = np.array([-4, -2, 0, 2, 4])
    oy, ox = np.meshgrid(offs, offs, indexing="ij")
    nbrs = p[ys[:, None] + oy.ravel()[None, :],
             xs[:, None] + ox.ravel()[None, :]]            # (N, 25, 3)
    ata = np.einsum("nki,nkj->nij", nbrs, nbrs)
    atb = nbrs.sum(axis=1)
    det = np.linalg.det(ata)
    safe = np.where((det >= 1e-5)[:, None, None], ata,
                    np.eye(3, dtype=points.dtype))
    n = np.linalg.solve(safe, atb[..., None])[..., 0]
    return (n / (np.linalg.norm(n, axis=-1, keepdims=True) + 1e-12)
            ).astype(np.float32)


def fps_order_host(points: np.ndarray, num_samples: int,
                   rng: np.random.RandomState) -> np.ndarray:
    """Greedy farthest-point ordering (reference interhand.py:147-178).

    Host-side numpy twin of the jittable ``pdfnet_tpu.ops.fps`` (dataloader
    workers vs on-device inference); randomized start per the reference.
    Returns indices putting an FPS-selected subset first, the rest after.
    """
    n = len(points)
    if n <= num_samples:
        return np.arange(n)
    sel = np.zeros(num_samples, np.int64)
    sel[0] = rng.randint(n)
    diff = points - points[sel[0]]
    min_dist = np.sum(diff * diff, axis=1)
    for i in range(1, num_samples):
        sel[i] = int(np.argmax(min_dist))
        diff = points - points[sel[i]]
        min_dist = np.minimum(min_dist, np.sum(diff * diff, axis=1))
    # Wrap-padded clouds contain coincident points, so argmax can re-pick an
    # index once all distances hit zero (the reference dedupes too,
    # interhand.py:177).  Keep first occurrences and always return a full
    # permutation of n.
    sel = sel[np.sort(np.unique(sel, return_index=True)[1])]
    rest = np.setdiff1d(np.arange(n), sel, assume_unique=False)
    return np.concatenate([sel, rest])


def fps_reorder_cloud(cloud: np.ndarray, choose: np.ndarray,
                      num_level1: int, num_level2: int,
                      rng: np.random.RandomState):
    """Two-level FPS reordering of a sampled hand cloud (+ its pixel
    indices): level-1 centers first among all points, level-2 centers first
    within the level-1 prefix (the ``--sample_strategy FPS`` recipe)."""
    order1 = fps_order_host(cloud[:, :3], num_level1, rng)
    cloud, choose = cloud[order1], choose[order1]
    order2 = fps_order_host(cloud[:num_level1, :3], num_level2, rng)
    cloud[:num_level1] = cloud[:num_level1][order2]
    choose[:num_level1] = choose[:num_level1][order2]
    return cloud, choose


def sample_hand_cloud(
    masked_depth: np.ndarray,
    K: np.ndarray,
    num_points: int,
    rng: np.random.RandomState,
    min_pixels: int = 100,
    use_native: bool = True,
    with_normals: bool = False,
    deterministic: bool = False,
) -> Tuple[np.ndarray, np.ndarray, bool]:
    """Returns (choose (N,), cloud (N, 3) — or (N, 6) xyz+normals when
    ``with_normals`` (INPUT_FEATURE_NUM==6, interhand.py:817-838), ok).

    ``deterministic``: select the first ``num_points`` in-band pixels in
    sorted order (or wrap-pad) with no shuffle — the reference sampler
    (interhand.py:778-800) with its two np.random.shuffle calls removed,
    matching ops.pointcloud's deterministic device twin.  RNG is unused.
    """
    feat = 6 if with_normals else 3
    invalid = (np.zeros(num_points, np.int64),
               np.zeros((num_points, feat), np.float32), False)
    if use_native and not deterministic:
        from pdfnet_tpu import native
        if native.available():
            choose, cloud, ok = native.sample_hand_cloud_native(
                masked_depth, K, num_points,
                seed=int(rng.randint(0, 2 ** 31)), min_pixels=min_pixels,
                z_min=Z_MIN, z_max=Z_MAX, band=BAND)
            if not with_normals:
                return choose, cloud, ok
            if not ok:
                return invalid
            pts = backproject_np(masked_depth, K)
            cloud = np.concatenate(
                [cloud, normals_at_indices_np(pts, choose)], axis=1)
            return choose, cloud, ok
    pts_map = backproject_np(masked_depth, K)
    xyz = pts_map.reshape(-1, 3)
    z = xyz[:, 2]
    nz = z[z != 0]
    if len(nz) == 0:
        return invalid
    mean = nz.mean()
    lo, hi = max(Z_MIN, mean - BAND), min(Z_MAX, mean + BAND)
    choose = np.nonzero((z > lo) & (z < hi))[0]
    if len(choose) < min_pixels:
        return invalid
    if len(choose) > num_points:
        choose = (choose[:num_points] if deterministic
                  else rng.choice(choose, num_points, replace=False))
    else:
        choose = np.pad(choose, (0, num_points - len(choose)), "wrap")
    if not deterministic:
        rng.shuffle(choose)
    cloud = xyz[choose].astype(np.float32)
    if with_normals:
        cloud = np.concatenate(
            [cloud, normals_at_indices_np(pts_map, choose)], axis=1)
    return choose.astype(np.int64), cloud, True
