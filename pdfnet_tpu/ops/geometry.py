"""Camera geometry: depth lifting, normals, projections, root decoding.

References:
- get_points_coordinate / get_normal: lib/utils/utils.py:251-310
- projection_batch (orthographic):    lib/utils/utils.py:231-249
- get_Landmarks_new (perspective):    lib/models/hand3d/Mano_render.py:203-209
- get_uv_root_3d (root lifting):      lib/models/hand3d/Mano_render.py:211-223
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def backproject_depth(depth: jax.Array, K_inv: jax.Array) -> jax.Array:
    """Lift a depth map to camera-space XYZ.

    Args:
      depth: (..., H, W) metric depth (zeros = invalid).
      K_inv: (..., 3, 3) inverse intrinsics.

    Returns:
      (..., H, W, 3) xyz; pixel (row y, col x) uses homogeneous [x, y, 1]
      (no half-pixel offset, matching the reference).
    """
    H, W = depth.shape[-2:]
    x = jnp.arange(W, dtype=jnp.float32)
    y = jnp.arange(H, dtype=jnp.float32)
    xx, yy = jnp.meshgrid(x, y)                          # (H, W)
    ones = jnp.ones_like(xx)
    pix = jnp.stack([xx, yy, ones], axis=-1)             # (H, W, 3)
    rays = jnp.einsum("...ij,hwj->...hwi", K_inv, pix, precision=_HI)
    return rays * depth[..., None]


def _shifted(points: jax.Array, dy: int, dx: int) -> jax.Array:
    """Zero-padded spatial shift of (..., H, W, C)."""
    H, W = points.shape[-3], points.shape[-2]
    pad = [(0, 0)] * (points.ndim - 3) + [(4, 4), (4, 4), (0, 0)]
    p = jnp.pad(points, pad)
    return jax.lax.dynamic_slice_in_dim(
        jax.lax.dynamic_slice_in_dim(p, 4 + dy, H, axis=-3), 4 + dx, W, axis=-2)


def depth_normals(points: jax.Array) -> jax.Array:
    """Per-pixel surface normals by least-squares plane fit.

    Matches get_normal's 5x5 dilation-2 neighborhood (offsets
    {-4,-2,0,2,4}²), zero padding, determinant-guarded 3x3 solve.

    Args:
      points: (..., H, W, 3) backprojected camera-space points.

    Returns:
      (..., H, W, 3) unit normals.
    """
    offs = [-4, -2, 0, 2, 4]
    nbrs = jnp.stack([_shifted(points, dy, dx) for dy in offs for dx in offs],
                     axis=-2)                             # (..., H, W, 25, 3)
    ata = jnp.einsum("...ki,...kj->...ij", nbrs, nbrs, precision=_HI)  # 3x3
    atb = jnp.sum(nbrs, axis=-2)                          # A^T @ ones
    det = jnp.linalg.det(ata)
    eye = jnp.eye(3, dtype=points.dtype)
    safe = jnp.where((det >= 1e-5)[..., None, None], ata, eye)
    n = jnp.linalg.solve(safe, atb[..., None])[..., 0]
    return n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-12)


def orthographic_project(scale: jax.Array, trans2d: jax.Array,
                         points3d: jax.Array, img_size: int = 384) -> jax.Array:
    """Weak-perspective projection used by the GCN decoder.

    scale: (B,), trans2d: (B, 2), points3d: (B, N, 3) -> (B, N, 2).
    """
    s = (scale * img_size)[:, None, None]
    t = (trans2d * img_size / 2 + img_size / 2)[:, None, :]
    return s * points3d[..., :2] + t


def perspective_project(points: jax.Array, K: jax.Array) -> jax.Array:
    """(B, N, 3) x (B, 3, 3) -> (B, N, 2) pinhole projection."""
    proj = jnp.einsum("bnj,bij->bni", points, K, precision=_HI)
    return proj[..., :2] / (proj[..., 2:] + 1e-7)


def uv_root_to_3d(
    index: jax.Array,
    offset_xy: jax.Array,
    depth: jax.Array,
    K: jax.Array,
    input_res: int = 384,
    down_ratio: int = 4,
) -> jax.Array:
    """Lift (center cell index, predicted sub-cell offset, predicted z) to an
    absolute 3D root position via the intrinsics.

    Args:
      index: (B,) or (B, 1) flat index into the down-sampled center grid.
      offset_xy: (B, 2) predicted offset in pixels.
      depth: (B,) predicted metric z.
      K: (B, 3, 3).

    Returns: (B, 1, 3) camera-space root.
    """
    idx = index.reshape(index.shape[0]).astype(jnp.int32)
    fx, fy = K[:, 0, 0], K[:, 1, 1]
    cw, ch = K[:, 0, 2], K[:, 1, 2]
    grid = input_res // down_ratio
    cx = ((idx % grid) * down_ratio).astype(jnp.float32)
    cy = ((idx // grid) * down_ratio).astype(jnp.float32)
    root_x = depth * (offset_xy[:, 0] + cx - cw) / (fx + 1e-7)
    root_y = depth * (offset_xy[:, 1] + cy - ch) / (fy + 1e-7)
    return jnp.stack([root_x, root_y, depth], axis=1)[:, None, :]
