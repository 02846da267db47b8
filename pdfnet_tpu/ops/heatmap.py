"""CenterNet heatmap decode: clamped sigmoid, NMS, per-class top-k.

Reference: _sigmoid (lib/models/utils.py:8-10), _nms/_topk
(lib/models/networks/intaghand_encoder.py:349-367).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def clamped_sigmoid(x: jax.Array) -> jax.Array:
    return jnp.clip(jax.nn.sigmoid(x), 1e-4, 1 - 1e-4)


def heatmap_nms(heat: jax.Array, kernel: int = 5) -> jax.Array:
    """Keep only local maxima: heat * (maxpool(heat) == heat).

    heat: (B, H, W, C) channel-last.
    """
    pad = (kernel - 1) // 2
    hmax = jax.lax.reduce_window(
        heat, -jnp.inf, jax.lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, 1, 1, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
    return heat * (hmax == heat).astype(heat.dtype)


def heatmap_topk(scores: jax.Array, k: int) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Per-image top-k over one heatmap channel.

    scores: (B, H, W).  Returns (scores, flat_inds, ys, xs), each (B, k).
    """
    B, H, W = scores.shape
    top_scores, top_inds = jax.lax.top_k(scores.reshape(B, -1), k)
    ys = (top_inds // W).astype(jnp.float32)
    xs = (top_inds % W).astype(jnp.float32)
    return top_scores, top_inds, ys, xs


def decode_centers(hm: jax.Array, kernel: int = 5) -> jax.Array:
    """Decode left/right hand center indices from a 2-channel heatmap.

    hm: (B, H, W, 2) post-sigmoid.  Returns (B, 2) flat indices
    [left, right] — the test-time path of the encoder
    (intaghand_encoder.py:750-758).
    """
    nms = heatmap_nms(hm, kernel)
    _, ind_l, _, _ = heatmap_topk(nms[..., 0], 1)
    _, ind_r, _, _ = heatmap_topk(nms[..., 1], 1)
    return jnp.concatenate([ind_l, ind_r], axis=1)
