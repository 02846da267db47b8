"""Feature gathering at flat pixel indices.

TPU-native counterpart of the reference's ``_gather_feat`` /
``_tranpose_and_gather_feat`` (lib/models/utils.py:13-26).  We keep NHWC
layout throughout, so "transpose and gather" is just a reshape + take.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_feat(feat: jax.Array, ind: jax.Array) -> jax.Array:
    """Gather rows of a (B, N, C) tensor at per-batch indices (B, K) -> (B, K, C)."""
    return jnp.take_along_axis(feat, ind[..., None].astype(jnp.int32), axis=1)


def gather_pixels(fmap_nhwc: jax.Array, ind: jax.Array) -> jax.Array:
    """Gather per-pixel features at flat indices.

    Args:
      fmap_nhwc: (B, H, W, C) feature map.
      ind: (B, K) flat indices into the row-major H*W grid.

    Returns:
      (B, K, C) gathered features.
    """
    B, H, W, C = fmap_nhwc.shape
    flat = fmap_nhwc.reshape(B, H * W, C)
    return gather_feat(flat, ind)


def gather_patches(fmap_nhwc: jax.Array, ind: jax.Array,
                   size: int) -> jax.Array:
    """Zero-padded ``size x size`` windows centered at flat pixel indices.

    Equivalent to padding the map by size//2 and dynamic-slicing, but
    WITHOUT materializing the padded copy — for a (48, 96, 96, 256) map
    that copy is ~113 MB of HBM traffic to read two 5x5 patches per image
    (the eval-step profile showed it as a 0.7 ms ``pad`` op).  Instead the
    window is sliced from the original map at a clamped start, re-indexed to
    the requested rows/cols, and masked to zero outside the map.

    Args:
      fmap_nhwc: (B, H, W, C).
      ind: (B, K) flat indices into the row-major H*W grid (window centers).
      size: odd window size.

    Returns:
      (B, K, size, size, C).
    """
    B, H, W, C = fmap_nhwc.shape
    r = size // 2
    ind = ind.astype(jnp.int32)
    ys, xs = ind // W, ind % W

    def one(img_b, y, x):
        sy = jnp.clip(y - r, 0, H - size)
        sx = jnp.clip(x - r, 0, W - size)
        p = jax.lax.dynamic_slice(img_b, (sy, sx, 0), (size, size, C))
        ry = y - r + jnp.arange(size)          # absolute rows wanted
        rx = x - r + jnp.arange(size)
        p = jnp.take(p, jnp.clip(ry - sy, 0, size - 1), axis=0)
        p = jnp.take(p, jnp.clip(rx - sx, 0, size - 1), axis=1)
        valid = (((ry >= 0) & (ry < H))[:, None, None]
                 & ((rx >= 0) & (rx < W))[None, :, None])
        return jnp.where(valid, p, 0)

    return jax.vmap(lambda img_b, yy, xx:
                    jax.vmap(lambda y, x: one(img_b, y, x))(yy, xx))(
        fmap_nhwc, ys, xs)


def gather_pixels_2d(fmap_nhwc: jax.Array, ind: jax.Array) -> jax.Array:
    """``gather_pixels`` without the (B, H, W, C) -> (B, H*W, C) collapse.

    On TPU that collapse crosses the tiled layout, so XLA materializes a
    relayout copy of the entire map before the row gather — for the 192²x64
    stem map that is ~226 MB of HBM traffic to read ~6 MB of rows.  Indexing
    the NHWC operand with explicit (row, col) coordinates emits a single
    gather over the original layout instead.  Bit-identical output.
    """
    B, H, W, C = fmap_nhwc.shape
    ind = ind.astype(jnp.int32)
    r, c = ind // W, ind % W
    b = jnp.arange(B, dtype=jnp.int32)[:, None]
    return fmap_nhwc[b, r, c]
