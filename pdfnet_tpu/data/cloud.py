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


def sample_hand_cloud(
    masked_depth: np.ndarray,
    K: np.ndarray,
    num_points: int,
    rng: np.random.RandomState,
    min_pixels: int = 100,
    use_native: bool = True,
) -> Tuple[np.ndarray, np.ndarray, bool]:
    """Returns (choose (N,), cloud (N, 3), ok)."""
    if use_native:
        from pdfnet_tpu import native
        if native.available():
            return native.sample_hand_cloud_native(
                masked_depth, K, num_points,
                seed=int(rng.randint(0, 2 ** 31)), min_pixels=min_pixels,
                z_min=Z_MIN, z_max=Z_MAX, band=BAND)
    xyz = backproject_np(masked_depth, K).reshape(-1, 3)
    z = xyz[:, 2]
    nz = z[z != 0]
    if len(nz) == 0:
        return (np.zeros(num_points, np.int64),
                np.zeros((num_points, 3), np.float32), False)
    mean = nz.mean()
    lo, hi = max(Z_MIN, mean - BAND), min(Z_MAX, mean + BAND)
    choose = np.nonzero((z > lo) & (z < hi))[0]
    if len(choose) < min_pixels:
        return (np.zeros(num_points, np.int64),
                np.zeros((num_points, 3), np.float32), False)
    if len(choose) > num_points:
        choose = rng.choice(choose, num_points, replace=False)
    else:
        choose = np.pad(choose, (0, num_points - len(choose)), "wrap")
    rng.shuffle(choose)
    return choose.astype(np.int64), xyz[choose].astype(np.float32), True
