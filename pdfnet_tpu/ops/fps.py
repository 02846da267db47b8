"""Farthest point sampling, jittable (``--sample_strategy FPS``).

Reference uses a numpy loop host-side (interhand.py:147-178); here it is a
device-resident ``lax.fori_loop`` with a fixed sample count, usable inside
jit and vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def farthest_point_sampling(points: jax.Array, num_samples: int,
                            first_idx: int = 0) -> jax.Array:
    """Greedy FPS over (N, 3) points -> (num_samples,) int32 indices.

    Deterministic (seeded by ``first_idx``) so results are reproducible
    under jit; vmap over a batch axis for batched use.
    """
    N = points.shape[0]

    def body(i, state):
        sampled, min_dist = state
        nxt = jnp.argmax(min_dist)
        sampled = sampled.at[i].set(nxt)
        diff = points - points[nxt]
        d = jnp.sum(diff * diff, axis=-1)
        return sampled, jnp.minimum(min_dist, d)

    sampled0 = jnp.zeros((num_samples,), jnp.int32).at[0].set(first_idx)
    diff0 = points - points[first_idx]
    dist0 = jnp.sum(diff0 * diff0, axis=-1)
    sampled, _ = jax.lax.fori_loop(1, num_samples, body, (sampled0, dist0))
    return sampled


def fps_reorder(points: jax.Array, num_level1: int, num_level2: int) -> jax.Array:
    """Reorder a point set so FPS-selected points occupy the prefix.

    Mirrors the reference's two-level FPS shuffling: level-1 centers first
    (``num_level1`` FPS picks of all points), and within those, level-2
    centers first.  points: (N, C) with xyz leading.
    """
    N = points.shape[0]
    idx1 = farthest_point_sampling(points[:, :3], num_level1)
    mask = jnp.zeros((N,), bool).at[idx1].set(True)
    rest = jnp.nonzero(~mask, size=N - num_level1, fill_value=0)[0]
    pts = points[jnp.concatenate([idx1, rest])]
    idx2 = farthest_point_sampling(pts[:num_level1, :3], num_level2)
    mask2 = jnp.zeros((num_level1,), bool).at[idx2].set(True)
    rest2 = jnp.nonzero(~mask2, size=num_level1 - num_level2, fill_value=0)[0]
    order2 = jnp.concatenate([idx2, rest2])
    return pts.at[:num_level1].set(pts[order2])
