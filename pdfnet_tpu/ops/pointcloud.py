"""Depth map -> fixed-size per-hand point clouds, fully jittable.

Reference behavior (depth2pcl, intaghand_encoder.py:369-491 and the training
variant interhand.py:758-905): mask the depth with the per-hand segmentation,
clip to [0.2, 2.5] m, band-filter around the mean hand depth (+-0.08 m),
then sample exactly ``num_points`` pixels (random subset when too many,
wrap-padded when too few, all-zero when the hand is invalid or nearly empty).

The reference does this on CPU with numpy + data-dependent shapes.  Here it
is a fixed-shape masked computation: random priorities + top-k give the
random subset, index arithmetic gives the wrap padding — so it runs inside
jit on device and batches.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pdfnet_tpu.ops.geometry import backproject_depth, depth_normals

Z_MIN, Z_MAX = 0.2, 2.5
BAND = 0.08
MIN_PIXELS = 10


def _choose_one_hand(depth_masked: jax.Array, key: jax.Array,
                     num_points: int, min_pixels: int = MIN_PIXELS,
                     deterministic: bool = False,
                     recall_target: float = 0.9):
    """Select ``num_points`` in-band pixel indices from (HW,) masked depth.

    Returns (choose (num_points,) int32, z (num_points,) f32 — the masked
    depth at those pixels — and ok scalar bool).  Pure index selection —
    backprojection happens at the chosen pixels only (the serving-path
    profile showed materializing + gathering the full 147k x 3 xyz map per
    hand cost ~6 ms/step at batch 96; lifting 1024 rays is equivalent math
    on 0.7% of the pixels).
    """
    z = depth_masked
    nonzero = z != 0.0
    n_nonzero = nonzero.sum()
    mean = jnp.where(n_nonzero > 0, jnp.sum(z * nonzero) / jnp.maximum(n_nonzero, 1), 0.0)
    min_dis = jnp.maximum(Z_MIN, mean - BAND)
    max_dis = jnp.minimum(Z_MAX, mean + BAND)
    sel = (z > min_dis) & (z < max_dis)
    n_valid = sel.sum()

    if deterministic:
        # First num_points in-band pixels in ascending flat order, wrap-padded
        # — exactly the reference's depth2pcl with its np.random.shuffle
        # removed (intaghand_encoder.py:404-426: sorted nonzero() indices,
        # first-1024 subset / 'wrap' pad).  Reproducible serving; also the
        # cross-framework parity fixture's sampling mode.  Exact top_k:
        # the tie-break to the lowest index IS the semantics here.
        pri = sel.astype(jnp.float32)
        _, order = jax.lax.top_k(pri, num_points)           # selected first
        n_eff = n_valid
    else:
        # Random priorities over selected pixels; taking the top-k of iid
        # uniforms is a uniform random subset.  approx_max_k replaces the
        # full 147k-element sort (measured 14 ms/step at batch 48 on the
        # serving path — the single largest op) with TPU's one-pass
        # bin-max reduction at ~10x less cost.  Any approximate top set of
        # iid priorities is still a uniform subset.  The returned
        # selected-entry count can fall below num_points even for DENSE
        # hands (in-band pixels colliding within approx_max_k bins), not
        # just sparse ones; either way the n_eff prefix-wrap below cycles
        # over the entries actually returned, so the output stays a valid
        # (possibly duplicate-padded) hand cloud.  recall_target sets the
        # candidate-set size XLA sorts (147456 -> 36864/18432/5120 at
        # 0.95/0.9/0.8); the serving profile at batch 96 showed the 0.95
        # sorts cost 4.8 ms/step, so the default trades a slightly higher
        # duplicate rate on small (~1k-pixel) hands for half that.
        # (bf16 priorities were tried to halve sort bytes: the TPU sort
        # comparator runs SLOWER on bf16 keys — measured +0.6 ms/step at
        # batch 96 — so priorities stay f32.)
        pri = jax.random.uniform(key, z.shape) + sel.astype(jnp.float32) * 2.0
        vals, order = jax.lax.approx_max_k(pri, num_points,
                                           recall_target=recall_target)
        n_eff = (vals > 2.0).sum()     # selected entries form a prefix
    pos = jnp.arange(num_points)
    wrapped = jnp.where(pos < n_eff, pos, pos % jnp.maximum(n_eff, 1))
    # Gather depth at the raw order FIRST, then wrap indices and depths in
    # ONE (N, 2)-row gather.  TPU scattered gathers cost ~10 ns/element
    # regardless of source size (the batch-96 serving profile showed
    # order[wrapped] and a later z[choose] as two ~1 ms/step ops each);
    # z[order[wrapped]] == z[order][wrapped], so fusing the pair into one
    # gather halves that cost bit-identically.  The index rides in an f32
    # lane, exact only below 2^24 — 384^2 = 147k qualifies with a wide
    # margin; maps with >= 2^24 pixels keep two separate gathers instead
    # of silently rounding pixel indices.
    z_all = depth_masked[order]
    if depth_masked.size < 2 ** 24:
        pair = jnp.stack([order.astype(jnp.float32), z_all], axis=-1)
        picked = pair[wrapped]                                   # (N, 2)
        choose = picked[:, 0].astype(jnp.int32)
        z = picked[:, 1]
    else:
        choose = order[wrapped]
        z = z_all[wrapped]

    ok = (n_valid >= min_pixels)
    choose = jnp.where(ok, choose, 0)
    return choose, z, ok


def _backproject_at(choose: jax.Array, z: jax.Array, K_inv: jax.Array,
                    W: int) -> jax.Array:
    """Lift chosen flat pixel indices + their depths to camera-space xyz.

    Bitwise-identical to ``backproject_depth(...)``'s value at those pixels
    (same [x, y, 1] ray construction, HIGHEST-precision K_inv contraction,
    then ray * z — gather and multiply commute elementwise).
    """
    u = (choose % W).astype(jnp.float32)
    v = (choose // W).astype(jnp.float32)
    pix = jnp.stack([u, v, jnp.ones_like(u)], axis=-1)       # (N, 3)
    rays = jnp.einsum("ij,nj->ni", K_inv, pix,
                      precision=jax.lax.Precision.HIGHEST)
    return rays * z[:, None]


def depth_to_hand_clouds(
    depth: jax.Array,          # (B, H, W) metric depth
    mask: jax.Array,           # (B, H, W, 2) per-hand masks (prob or binary)
    K: jax.Array,              # (B, 3, 3) intrinsics
    valid: jax.Array,          # (B, 2) hand validity
    key: jax.Array,
    num_points: int = 1024,
    with_normals: bool = False,
    min_pixels: int = MIN_PIXELS,
    fps_levels: Optional[Tuple[int, int]] = None,
    deterministic: bool = False,
    recall_target: float = 0.9,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (choose (B, 2, N) int32, cloud (B, 2, N, 3|6), ok (B, 2)).

    ``fps_levels=(n1, n2)`` applies the two-level FPS prefix reordering to
    each hand's cloud + indices (--sample_strategy FPS at inference time).
    ``deterministic`` replaces the uniform random subset with the first
    num_points in-band pixels in ascending order (reproducible serving).
    ``recall_target`` tunes the random sampler's approx_max_k candidate
    pool (see _choose_one_hand); ignored when deterministic.
    """
    B, H, W = depth.shape
    # bool mask + where instead of f32 multiplies: the per-hand masked
    # depth chain reads these tensors several times (band mean, selection,
    # priorities), and bool intermediates are 4x cheaper HBM traffic than
    # f32 0/1 masks
    band = (depth > Z_MIN) & (depth < Z_MAX)
    depth_b = jnp.where(band, depth, 0.0)
    hard_mask = mask > 0.5

    K_inv = jnp.linalg.inv(K)
    keys = jax.random.split(key, B * 2).reshape(B, 2, 2)

    def per_sample(d, m, ki, kk, v):
        out_c, out_p, out_ok = [], [], []
        for h in range(2):
            dm_flat = jnp.where(m[..., h], d, 0.0).reshape(-1)
            c, z, ok = _choose_one_hand(dm_flat, kk[h], num_points,
                                        min_pixels, deterministic,
                                        recall_target)
            p = jnp.where(ok, _backproject_at(c, z, ki, W), 0.0)
            if with_normals:
                # Normals need the 5x5 plane-fit neighborhood, so this
                # (non-default) path still lifts the full map.
                xyz = backproject_depth(dm_flat.reshape(d.shape), ki)
                nrm = depth_normals(xyz).reshape(-1, 3)[c]
                p = jnp.concatenate([p, jnp.where(ok, nrm, 0.0)], axis=-1)
            if fps_levels is not None:
                from pdfnet_tpu.ops.fps import fps_two_level_order
                order = fps_two_level_order(p[:, :3], *fps_levels)
                c, p = c[order], p[order]
            ok = ok & (v[h] > 0)
            out_c.append(jnp.where(ok, c, 0))
            out_p.append(jnp.where(ok, p, 0.0))
            out_ok.append(ok)
        return (jnp.stack(out_c), jnp.stack(out_p), jnp.stack(out_ok))

    choose, cloud, ok = jax.vmap(per_sample)(depth_b, hard_mask, K_inv, keys, valid)
    return choose, cloud, ok
