"""Bilinear resize with torch ``align_corners=True`` semantics.

The reference's decoders upsample with ``nn.Upsample(mode='bilinear',
align_corners=True)``, which differs from ``jax.image.resize``.  Because all
shapes are static we express it as two small interpolation-matrix matmuls
(separable), which XLA maps straight onto the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=64)
def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) linear-interpolation matrix, align_corners=True."""
    W = np.zeros((n_out, n_in), np.float32)
    if n_out == 1 or n_in == 1:
        W[:, 0] = 1.0
        return W
    src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = (src - lo).astype(np.float32)
    W[np.arange(n_out), lo] += 1.0 - frac
    W[np.arange(n_out), hi] += frac
    return W


def resize_bilinear_align_corners(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Resize (B, H, W, C) -> (B, out_h, out_w, C)."""
    B, H, W, C = x.shape
    Wh = jnp.asarray(_interp_matrix(H, out_h))
    Ww = jnp.asarray(_interp_matrix(W, out_w))
    y = jnp.einsum("oh,bhwc->bowc", Wh, x)
    return jnp.einsum("ow,bhwc->bhoc", Ww, y)


def upsample2x_nearest(x: jax.Array, axis: int = 1) -> jax.Array:
    """Nearest-neighbor x2 along one axis (graph vertex upsampling)."""
    return jnp.repeat(x, 2, axis=axis)
