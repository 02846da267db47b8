"""PointNet++ set-abstraction grouping: fused kNN + ball query + gather.

This is the hottest custom op in the pipeline (reference:
lib/utils/utils.py:134-188, O(B*512*1024) brute-force distance matrix,
topk, python-loop ball query).  Here it is a single fused XLA computation:

  1. pairwise squared distances centers x points (one MXU matmul via the
     |c|^2 + |p|^2 - 2 c.p expansion),
  2. top-k smallest (lax.top_k on negated distances),
  3. ball query: any neighbor beyond ``radius2`` (squared radius) is replaced
     by the center itself (reference semantics: its features collapse to the
     center's features and its centered xyz to zero),
  4. gather + center-subtract.

Layout is channel-last (B, S, K, C) — natural for TPU (C maps to lanes) —
whereas the reference emits (B, C, S, K).

The downstream per-point MLP + max-pool is permutation-invariant along K, so
neighbor order (ties/sort order of top-k) does not affect the model.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

# test hook: run the fused kernel in interpreter mode off-TPU
_FUSED_INTERPRET = False


def _pairwise_sqdist(centers: jax.Array, points: jax.Array) -> jax.Array:
    """(B, S, 3), (B, N, 3) -> (B, S, N) squared euclidean distances.

    Matmul expansion |c|^2 + |p|^2 - 2 c.p: the cross term is one MXU
    matmul; at hand scale (|xyz| ~ 1e-1 .. 1) f32 cancellation error is
    ~1e-8, far below the 1.5e-2 ball-query radius, so the radius test is
    unaffected.
    """
    cross = jnp.einsum("bsc,bnc->bsn", centers, points,
                       precision=jax.lax.Precision.HIGHEST)
    c2 = jnp.sum(centers * centers, axis=-1)[:, :, None]
    p2 = jnp.sum(points * points, axis=-1)[:, None, :]
    return c2 + p2 - 2.0 * cross


def knn_ball_query(
    centers_xyz: jax.Array,
    points_xyz: jax.Array,
    k: int,
    radius2: float,
    method: str = "topk",
) -> Tuple[jax.Array, jax.Array]:
    """Indices of the k nearest points per center, ball-query-substituted.

    ``method``:
      - "topk":   exact ``lax.top_k`` (parity reference).
      - "approx": TPU-optimized ``lax.approx_max_k`` over bf16 distances
        (~95% recall).  The downstream MLP+maxpool is permutation-invariant
        and the ball query re-validates every neighbor, so a missed true
        neighbor only swaps one in-ball point for another.
      - "pallas": exact iterative-argmin Pallas kernel (ops/pallas_knn.py);
        identical selection to "topk", no per-row sort.

    Returns:
      idx: (B, S, K) int32 point indices; out-of-ball neighbors are replaced
        by the center's own index (center i == point i by construction).
      valid: (B, S, K) bool, False where the substitution happened.
    """
    S = centers_xyz.shape[1]
    if method in ("pallas_fused", "pallas_sa"):
        method = "pallas"          # same selection; fusion applies upstream
    if method == "pallas":
        from pdfnet_tpu.ops.pallas_knn import TILE_S
        # The kernel needs 128-aligned center tiles and a real TPU backend;
        # fall back to the identical-result top_k path otherwise.
        if S % TILE_S != 0 or jax.default_backend() != "tpu":
            method = "topk"
    if method == "pallas":
        from pdfnet_tpu.ops.pallas_knn import knn_pallas
        # Selection is non-differentiable (indices + a radius comparison);
        # stop_gradient keeps autodiff from needing a Pallas transpose rule.
        dist, idx = knn_pallas(jax.lax.stop_gradient(centers_xyz),
                               jax.lax.stop_gradient(points_xyz), k)
    else:
        d2 = _pairwise_sqdist(centers_xyz, points_xyz)      # (B, S, N)
        if method == "approx":
            neg_dist, idx = jax.lax.approx_max_k(
                -d2.astype(jnp.bfloat16), k, recall_target=0.95)
            neg_dist = neg_dist.astype(jnp.float32)
        else:
            neg_dist, idx = jax.lax.top_k(-d2, k)           # ascending distance
        dist = -neg_dist
    valid = dist <= radius2
    center_idx = jnp.arange(S, dtype=idx.dtype)[None, :, None]
    idx = jnp.where(valid, idx, center_idx)
    return idx.astype(jnp.int32), valid


def _gather_neighbors(feat: jax.Array, idx: jax.Array,
                      method: str = "take") -> jax.Array:
    """Gather (B, N, C) rows into (B, S, K, C) neighborhoods.

    "onehot" expresses the gather as a one-hot matmul — ~5x faster than
    XLA's row gather on TPU.  Each output row sums exactly one nonzero
    product, so for features already in the matmul dtype it is bit-exact.
    """
    B, S, K = idx.shape
    # One-hot beats XLA's row gather at every feature width measured (the
    # gather lowers to per-row DMA); the one-hot operand is (B, S*K, N)
    # though, so very large batches can spill — prefer batch <= 64 per chip.
    if method == "onehot":
        N = feat.shape[1]
        oh = jax.nn.one_hot(idx.reshape(B, S * K), N, dtype=feat.dtype)
        g = jnp.einsum("bmn,bnc->bmc", oh, feat)
        return g.reshape(B, S, K, feat.shape[-1])
    return jnp.take_along_axis(feat[:, :, None, :], idx[..., None], axis=1)


def group_points(
    points: jax.Array,
    k: int = 64,
    num_centers: int = 512,
    radius2: float = 0.015,
    knn_method: str = "topk",
    gather_method: str = "take",
) -> Tuple[jax.Array, jax.Array]:
    """Level-1 grouping.  points: (B, N, C) with xyz in the first 3 channels.

    The first ``num_centers`` points act as group centers (the sampler
    shuffles points upstream, making this a uniform random subset — or an
    FPS-ordered prefix under the FPS strategy).

    Returns:
      grouped: (B, S, K, C) neighbor features, xyz channels center-relative.
      centers: (B, S, 3) center coordinates.
    """
    centers = points[:, :num_centers, :3]
    from pdfnet_tpu.ops.pallas_knn import TILE_S
    if (knn_method in ("pallas_fused", "pallas_sa") and points.shape[-1] == 3
            and num_centers % TILE_S == 0
            and (jax.default_backend() == "tpu" or _FUSED_INTERPRET)):
        # Fully fused selection+gather+center-subtract: ~2% slower than
        # pallas+one-hot at batch 32 but avoids the (B, S*K, N) one-hot HBM
        # blob entirely — use for large per-chip batches.
        return _fused_group_pallas(points, k, num_centers, radius2), centers
    idx, _ = knn_ball_query(centers, points[..., :3], k, radius2, knn_method)
    grouped = _gather_neighbors(points, idx, gather_method)  # (B, S, K, C)
    grouped = jnp.concatenate(
        [grouped[..., :3] - centers[:, :, None, :], grouped[..., 3:]], -1)
    return grouped, centers


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _fused_group_pallas(points, k, num_centers, radius2):
    """Level-1 grouping via the fused Pallas kernel (selection + gather +
    center-subtract in one pass; ball-query substitution zeroes the centered
    coordinates since the substituted neighbor is the center itself)."""
    return _fused_group_fwd(points, k, num_centers, radius2)[0]


def _fused_group_fwd(points, k, num_centers, radius2):
    from pdfnet_tpu.ops.pallas_knn import knn_gather_xyz_pallas
    centers = points[:, :num_centers, :3]
    dist, idx, nbr = knn_gather_xyz_pallas(
        jax.lax.stop_gradient(centers), jax.lax.stop_gradient(points), k,
        interpret=_FUSED_INTERPRET)
    valid = dist <= radius2
    grouped = jnp.where(valid[..., None], nbr, 0.0)
    return grouped, (idx, valid, points.shape)


def _fused_group_bwd(k, num_centers, radius2, res, g):
    # grouped[b,s,j] = points[b, idx[b,s,j]] - points[b, s]  (valid entries)
    idx, valid, pshape = res
    gm = jnp.where(valid[..., None], g, 0.0)            # (B, S, K, 3)
    B, S, K, _ = gm.shape
    N = pshape[1]
    # Scatter-add expressed as a one-hot-transpose matmul (MXU beats XLA's
    # serial scatter on TPU): d_points[n] = sum_{s,k: idx=n} g[s,k].
    oh = jax.nn.one_hot(idx.reshape(B, S * K), N, dtype=gm.dtype)
    d_points = jnp.einsum("bmn,bmc->bnc", oh, gm.reshape(B, S * K, -1))
    d_points = d_points.at[:, :num_centers].add(-gm.sum(axis=2))  # center term
    return (d_points,)


_fused_group_pallas.defvjp(_fused_group_fwd, _fused_group_bwd)


@partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _fused_group_feat_pallas(feat, k, num_centers, radius2):
    """Level-2 grouping via the fused feature-gather Pallas kernel."""
    return _fused_group_feat_fwd(feat, k, num_centers, radius2)[0]


def _fused_group_feat_fwd(feat, k, num_centers, radius2):
    from pdfnet_tpu.ops.pallas_knn import group_feat_pallas
    # bf16 features halve the kernel's VMEM output footprint (the f32 output
    # block overflows the 16MB budget); selection stays exact via the f32
    # xyz operands inside the kernel, and the consumer MLP is bf16 anyway.
    fin = feat if _FUSED_INTERPRET else feat.astype(jnp.bfloat16)
    grouped, idx, valid = group_feat_pallas(
        jax.lax.stop_gradient(fin), k, num_centers, radius2,
        interpret=_FUSED_INTERPRET)
    return grouped.astype(feat.dtype), (idx, valid, feat.shape)


def _fused_group_feat_bwd(k, num_centers, radius2, res, g):
    # valid:   grouped = feat[idx] - [xyz of center, 0...]
    # invalid: grouped = [0, 0, 0, center's non-xyz features]
    idx, valid, fshape = res
    B, S, K, C = g.shape
    N = fshape[1]
    g_valid = jnp.where(valid[..., None], g, 0.0)
    g_inval = g - g_valid
    # scatter-add as a one-hot-transpose matmul (see _fused_group_bwd)
    oh = jax.nn.one_hot(idx.reshape(B, S * K), N, dtype=g.dtype)
    d_feat = jnp.einsum("bmn,bmc->bnc", oh, g_valid.reshape(B, S * K, C))
    d_feat = d_feat.at[:, :num_centers, :3].add(
        -g_valid[..., :3].sum(axis=2))
    d_feat = d_feat.at[:, :num_centers, 3:].add(
        g_inval[..., 3:].sum(axis=2))
    return (d_feat,)


_fused_group_feat_pallas.defvjp(_fused_group_feat_fwd, _fused_group_feat_bwd)


def group_points_level2(
    feat: jax.Array,
    num_centers: int = 128,
    k: int = 64,
    radius2: float = 0.04,
    knn_method: str = "topk",
    gather_method: str = "take",
) -> Tuple[jax.Array, jax.Array]:
    """Level-2 grouping over already-abstracted points.

    Args:
      feat: (B, S1, C) with xyz in the first 3 channels (C = 3 + features).

    Returns:
      grouped: (B, S2, K, C), xyz channels center-relative.
      centers: (B, S2, 3).
    """
    centers = feat[:, :num_centers, :3]
    from pdfnet_tpu.ops.pallas_knn import TILE_S
    if (knn_method in ("pallas_fused", "pallas_sa") and num_centers % TILE_S == 0
            and (jax.default_backend() == "tpu" or _FUSED_INTERPRET)):
        grouped = _fused_group_feat_pallas(feat, k, num_centers, radius2)
        return grouped, centers
    idx, _ = knn_ball_query(centers, feat[..., :3], k, radius2, knn_method)
    grouped = _gather_neighbors(feat, idx, gather_method)
    grouped = jnp.concatenate(
        [grouped[..., :3] - centers[:, :, None, :], grouped[..., 3:]], -1)
    return grouped, centers
