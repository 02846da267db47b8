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
