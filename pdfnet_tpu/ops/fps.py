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


def _fps_prefix_order(xyz: jax.Array, num_samples: int) -> jax.Array:
    """Permutation of range(N) with FPS picks first (jittable).

    Coincident points (wrap padding) can make FPS re-pick an index; the
    duplicate slot is then filled from the remainder so the result is
    always a full permutation.
    """
    N = xyz.shape[0]
    idx = farthest_point_sampling(xyz, num_samples)
    mask = jnp.zeros((N,), bool).at[idx].set(True)
    # picked indices first (prefix order within the pick set is irrelevant:
    # grouping treats the prefix as an unordered center set)
    rank = jnp.where(mask, 0, 1)
    return jnp.argsort(rank, stable=True)


def fps_two_level_order(points_xyz: jax.Array, num_level1: int,
                        num_level2: int) -> jax.Array:
    """Full permutation putting two-level FPS picks in the prefix
    (level-1 centers first among all points; level-2 centers first within
    the level-1 prefix) — the ``--sample_strategy FPS`` recipe, jittable."""
    order1 = _fps_prefix_order(points_xyz, num_level1)
    pts1 = points_xyz[order1[:num_level1]]
    order2 = _fps_prefix_order(pts1, num_level2)
    head = order1[:num_level1][order2]
    return jnp.concatenate([head, order1[num_level1:]])


def fps_reorder(points: jax.Array, num_level1: int, num_level2: int) -> jax.Array:
    """Reorder a point set so FPS-selected points occupy the prefix.

    points: (N, C) with xyz leading.  See :func:`fps_two_level_order` for
    the permutation itself (needed when companion arrays like pixel indices
    must be reordered identically).
    """
    return points[fps_two_level_order(points[:, :3], num_level1, num_level2)]
