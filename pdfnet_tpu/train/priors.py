"""Pose/shape priors and the photometric-path loss terms.

References:
- NormLoss (lib/models/losses.py:492-525): per-joint axis-angle range
  priors (dataset-specific tables in degrees) + L2 shape prior.
- photometric/seg terms (simplified.py origforward): masked image
  difference, silhouette loss, PSNR metric.
"""

from __future__ import annotations

import math
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pdfnet_tpu.assets import ASSET_DIR

_LIMITS = {}


def pose_limits(table: str) -> Tuple[jax.Array, jax.Array]:
    """(45,) min / max axis-angle limits in radians.

    ``table``: one of left / right / h2o_left / h2o_right.
    """
    if table not in _LIMITS:
        with np.load(os.path.join(ASSET_DIR, "pose_limits.npz")) as z:
            deg = z[table] if table in z.files else z["left"]
        rad = deg / 180.0 * math.pi
        _LIMITS[table] = (jnp.asarray(rad[:, 0]), jnp.asarray(rad[:, 1]))
    return _LIMITS[table]


def pose_shape_prior_loss(pose_l: jax.Array, pose_r: jax.Array,
                          shape_l: jax.Array, shape_r: jax.Array,
                          dataset: str = "H2O") -> jax.Array:
    """NormLoss: clamp-outside-range pose prior + 0.1 * L2 shape prior.

    pose_*: (B, 45) axis-angle; shape_*: (B, 10).  Returns (B,).
    """
    tl = "h2o_left" if dataset == "H2O" else "left"
    tr = "h2o_right" if dataset == "H2O" else "right"
    lmin, lmax = pose_limits(tl)
    rmin, rmax = pose_limits(tr)
    pose = (jnp.clip(lmin - pose_l, 0) + jnp.clip(pose_l - lmax, 0) +
            jnp.clip(rmin - pose_r, 0) + jnp.clip(pose_r - rmax, 0))
    pose_loss = pose.mean(axis=1)
    shape_loss = (shape_r ** 2).mean(axis=1) + (shape_l ** 2).mean(axis=1)
    return pose_loss + shape_loss * 0.1


def photometric_loss(rendered: jax.Array, image: jax.Array,
                     mask: jax.Array, use_skin_only: bool = False
                     ) -> jax.Array:
    """Masked L1 photometric term.  rendered/image (B, H, W, 3), mask (B, H, W)."""
    diff = jnp.abs(rendered - image) * mask[..., None]
    denom = jnp.maximum(mask.sum(axis=(1, 2)), 1.0) * 3.0
    return diff.sum(axis=(1, 2, 3)) / denom


def silhouette_loss(pred_mask: jax.Array, gt_mask: jax.Array) -> jax.Array:
    """Per-sample MSE of soft silhouettes."""
    B = pred_mask.shape[0]
    return ((pred_mask - gt_mask) ** 2).reshape(B, -1).mean(axis=1)


def psnr(img1: jax.Array, img2: jax.Array, mask: jax.Array) -> jax.Array:
    """PSNR over the masked region, images in [0, 255]."""
    area = jnp.maximum((mask > 0).sum(), 1)
    mse = ((img1 - img2) ** 2).mean() * img1.shape[0] * img1.shape[1] / area
    return 20.0 * jnp.log10(255.0 / jnp.sqrt(mse + 1e-12))


def hard_example_mining(per_sample_loss: jax.Array,
                        keep_ratio: float = 0.7) -> jax.Array:
    """Mean over the top-``keep_ratio`` hardest samples
    (base_trainer.py:140-142)."""
    B = per_sample_loss.shape[0]
    k = max(int(B * keep_ratio), 1)
    top, _ = jax.lax.top_k(per_sample_loss, k)
    return top.mean()
